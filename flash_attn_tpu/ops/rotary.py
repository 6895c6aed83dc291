"""Rotary position embeddings (1D and 2D), reference-parity.

Reimplements the semantics of the reference ``flash_attn/rotary.py``:
GPT-NeoX-style *interleaved-pair* rotation (the "(d 2) -> d 2" split,
reference rotary.py:2-3,22-29), inv_freq = 10000^(-2i/d) (reference :66),
cos/sin tables duplicated per pair ('... d -> ... (d 2)', reference :84-85),
and the 2D variant for ViT-style sqrt(S) x sqrt(S) grids that applies 1D
rotary along each spatial axis to each half of the head dim (reference
:103-135).

JAX-native differences: no mutable cos/sin caches — tables are computed at
trace time and constant-folded by XLA under jit; ``positions`` allows
decode-time offsets and varlen per-token positions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rotary_cos_sin(
    seqlen: int, dim: int, *, base: float = 10000.0, dtype=jnp.float32
):
    """cos/sin tables of shape (seqlen, dim), pairwise-duplicated columns."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    t = jnp.arange(seqlen, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (seqlen, dim/2)
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1).astype(dtype)
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1).astype(dtype)
    return cos, sin


def rotate_half(x: jax.Array) -> jax.Array:
    """Interleaved-pair rotation: (x0, x1) -> (-x1, x0) per adjacent pair."""
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1 = x[..., 0]
    x2 = x[..., 1]
    return jnp.stack((-x2, x1), axis=-1).reshape(*x.shape[:-2], -1)


def apply_rotary_pos_emb(
    x: jax.Array, cos: jax.Array, sin: jax.Array, seq_dimension: int = -2
) -> jax.Array:
    """x * cos + rotate_half(x) * sin (reference rotary.py:32-42).

    ``seq_dimension`` is -2 for (..., s, d) or -3 for (..., s, h, d).
    """
    if seq_dimension not in (-2, -3):
        raise ValueError(f"seq_dimension must be -2 or -3, got {seq_dimension}")
    s = x.shape[seq_dimension]
    cos = cos[:s]
    sin = sin[:s]
    if seq_dimension == -3:
        cos = cos[:, None, :]
        sin = sin[:, None, :]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return x * cos + rotate_half(x) * sin


def apply_rotary_at_positions(
    x: jax.Array, positions: jax.Array, dim: int | None = None,
    *, base: float = 10000.0
) -> jax.Array:
    """Rotary with explicit per-token positions (decode offsets / varlen).

    x: (..., s, d) with positions (..., s) int32 — gathers per-position
    cos/sin rows instead of assuming positions = arange(s).
    """
    d = x.shape[-1] if dim is None else dim
    inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., s, d/2)
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1).astype(x.dtype)
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1).astype(x.dtype)
    return x * cos + rotate_half(x) * sin


class RotaryEmbedding:
    """1D rotary embedding (reference rotary.py:45-100).

    Stateless callable: ``q_rot, k_rot = rot(q, k, seq_dimension=-2)``.
    """

    def __init__(self, dim_model: int, *, base: float = 10000.0):
        self.dim_model = dim_model
        self.base = base

    def __call__(self, q: jax.Array, k: jax.Array, seq_dimension: int = -2):
        if seq_dimension not in (-2, -3):
            raise ValueError("seq_dimension must be -2 or -3")
        s = k.shape[seq_dimension]
        cos, sin = rotary_cos_sin(
            s, self.dim_model, base=self.base, dtype=jnp.float32
        )
        return (
            apply_rotary_pos_emb(q, cos, sin, seq_dimension),
            apply_rotary_pos_emb(k, cos, sin, seq_dimension),
        )


class RotaryEmbedding2D:
    """2D rotary for sqrt(S) x sqrt(S) token grids (reference :103-135).

    First half of head dim rotates along grid columns, second half along
    grid rows.
    """

    def __init__(self, dim: int, *, base: float = 10000.0):
        if dim % 4 != 0:
            raise ValueError(f"2D rotary needs dim % 4 == 0, got {dim}")
        self.dim = dim
        self.rotary_1d = RotaryEmbedding(dim // 2, base=base)

    def __call__(self, q: jax.Array, k: jax.Array, seq_dimension: int = -2):
        if seq_dimension not in (-2, -3):
            raise ValueError("seq_dimension must be -2 or -3")
        if seq_dimension == -3:  # (b, s, h, d) -> (b, h, s, d)
            q = jnp.swapaxes(q, -3, -2)
            k = jnp.swapaxes(k, -3, -2)
        seqlen = q.shape[-2]
        side = int(math.sqrt(seqlen))
        if side * side != seqlen:
            raise ValueError(f"2D rotary needs a square grid, got S={seqlen}")

        def grid(x):  # (b, h, s, d2) -> (b, h, side, side, d2)
            return x.reshape(*x.shape[:-2], side, side, x.shape[-1])

        def flat(x):
            return x.reshape(*x.shape[:-3], seqlen, x.shape[-1])

        half = q.shape[-1] // 2
        q0, q1 = q[..., :half], q[..., half:]
        k0, k1 = k[..., :half], k[..., half:]
        # First half: rotate along the last grid axis (columns).
        q0, k0 = self.rotary_1d(grid(q0), grid(k0), seq_dimension=-2)
        # Second half: rotate along the first grid axis (rows).
        q1, k1 = self.rotary_1d(grid(q1), grid(k1), seq_dimension=-3)
        q_out = jnp.concatenate([flat(q0), flat(q1)], axis=-1)
        k_out = jnp.concatenate([flat(k0), flat(k1)], axis=-1)
        if seq_dimension == -3:
            q_out = jnp.swapaxes(q_out, -3, -2)
            k_out = jnp.swapaxes(k_out, -3, -2)
        return q_out, k_out
