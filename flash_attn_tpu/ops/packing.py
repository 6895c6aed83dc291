"""Varlen packing utilities: cu_seqlens <-> segment-id encodings, pad/unpad.

API parity with the reference's ``flash_attn/bert_padding.py`` (unpad_input,
pad_input, index_first_axis, ...) plus the TPU-idiomatic encoding: per-token
``segment_ids`` (-1 = padding) and local ``positions``, which is what the
Pallas kernels consume (SURVEY.md section 7 "Varlen without gather hell").

Two regimes:
  - ``unpad_input`` / ``pad_input``: shape-dynamic (output length = number
    of valid tokens). Like the reference's torch versions they are eager
    utilities — call them OUTSIDE jit, or pass a static ``total`` to get
    fixed-size (padded) outputs that are jit-compatible.
  - ``cu_seqlens_to_segments`` and friends: fully jittable, static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def index_first_axis(x: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather rows of the first axis (reference bert_padding.py:11-38).

    jnp.take has a well-defined gather gradient (scatter-add), so no custom
    VJP machinery is needed — XLA emits the efficient kernel directly.
    """
    return jnp.take(x, indices, axis=0)


def index_put_first_axis(
    values: jax.Array, indices: jax.Array, first_axis_dim: int
) -> jax.Array:
    """Scatter rows into a zero tensor (reference bert_padding.py:41-64)."""
    out = jnp.zeros((first_axis_dim, *values.shape[1:]), dtype=values.dtype)
    return out.at[indices].set(values)


def index_first_axis_residual(x: jax.Array, indices: jax.Array):
    """Gather + pass-through residual (reference bert_padding.py:67-96)."""
    return jnp.take(x, indices, axis=0), x


def unpad_input(hidden_states: jax.Array, attention_mask: jax.Array, total: int | None = None):
    """Remove padding: (b, s, ...) + bool mask -> packed (total, ...).

    Returns (packed, indices, cu_seqlens, max_seqlen_in_batch), matching the
    reference contract (bert_padding.py:99-119). ``attention_mask`` is True
    (or 1) at valid tokens.

    If ``total`` is None the output length is the number of valid tokens
    (shape-dynamic: eager only). With a static ``total`` the result is
    padded/truncated to that length and everything is jittable; padding rows
    are zeros and ``indices`` for them point at row 0 (mask them via
    segment ids downstream).
    """
    attention_mask = attention_mask.astype(bool)
    b, s = attention_mask.shape
    seqlens = jnp.sum(attention_mask, axis=-1).astype(jnp.int32)
    cu_seqlens = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens).astype(jnp.int32)]
    )
    max_seqlen = int(jnp.max(seqlens)) if total is None else s
    flat = attention_mask.reshape(-1)
    if total is None:
        indices = jnp.nonzero(flat)[0].astype(jnp.int32)
    else:
        indices = jnp.nonzero(flat, size=total, fill_value=0)[0].astype(jnp.int32)
    packed = index_first_axis(hidden_states.reshape(b * s, *hidden_states.shape[2:]), indices)
    if total is not None:
        n_valid = cu_seqlens[-1]
        valid = jnp.arange(total) < n_valid
        packed = jnp.where(
            valid.reshape((-1,) + (1,) * (packed.ndim - 1)), packed, 0
        )
    return packed, indices, cu_seqlens, max_seqlen


def pad_input(packed: jax.Array, indices: jax.Array, batch: int, seqlen: int) -> jax.Array:
    """Inverse of unpad_input (reference bert_padding.py:122-134)."""
    out = index_put_first_axis(packed, indices, batch * seqlen)
    return out.reshape(batch, seqlen, *packed.shape[1:])


def cu_seqlens_to_segments(cu_seqlens: jax.Array, total: int):
    """cu_seqlens (batch+1,) int32 -> (segment_ids, positions), each (total,).

    segment_ids[t] = which sequence token t belongs to (-1 past the last
    sequence, i.e. padding); positions[t] = offset within its sequence.
    Fully jittable (static output shapes).
    """
    cu_seqlens = cu_seqlens.astype(jnp.int32)
    t = jnp.arange(total, dtype=jnp.int32)
    # seg(t) = number of boundaries <= t among cu_seqlens[1:-1], i.e. index
    # of the containing sequence.
    seg = jnp.searchsorted(cu_seqlens[1:], t, side="right").astype(jnp.int32)
    n_seq = cu_seqlens.shape[0] - 1
    valid = t < cu_seqlens[-1]
    seg = jnp.where(valid, jnp.minimum(seg, n_seq - 1), -1)
    starts = jnp.take(cu_seqlens, jnp.clip(seg, 0, n_seq - 1))
    positions = jnp.where(valid, t - starts, 0)
    return seg, positions


def segments_to_padding_mask(segment_ids: jax.Array) -> jax.Array:
    """True at valid (non-padding) tokens."""
    return segment_ids >= 0


def make_segment_ids_from_mask(attention_mask: jax.Array):
    """(b, s) bool key-padding mask -> (segment_ids, positions) for the
    DENSE (padded) layout: each batch row is its own segment 0 with padding
    marked -1; positions are the in-row indices.

    Matches the reference module's padded+mask path semantics
    (flash_attention.py:27-72) without any gather/scatter.
    """
    attention_mask = attention_mask.astype(bool)
    b, s = attention_mask.shape
    seg = jnp.where(attention_mask, 0, -1).astype(jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    return seg, pos
