"""Shared in-kernel helpers for the flash-attention Pallas kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def default_interpret() -> bool:
    """Pallas interpret mode when not on a TPU backend (tests run on CPU)."""
    return jax.default_backend() != "tpu"

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


def block_coords(block_q: int, block_k: int, iq, ik):
    """Global (row, col) int32 coordinate grids for a (block_q, block_k)
    tile at block indices (iq, ik)."""
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        + iq * block_q
    )
    cols = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        + ik * block_k
    )
    return rows, cols


def attention_mask(
    rows,
    cols,
    *,
    sk: int,
    causal: bool,
    q_pos=None,
    kv_pos=None,
    q_seg=None,
    kv_seg=None,
):
    """Boolean (block_q, block_k) mask, True = attend.

    ``q_pos``/``kv_pos``/``q_seg``/``kv_seg`` are 1-D per-token arrays for
    this tile (local positions / segment ids; -1 segment = padding). When
    segs are given, causal compares local positions; otherwise global
    coordinates.
    """
    mask = cols < sk
    if q_seg is not None:
        qs = q_seg[:, None]
        ks = kv_seg[None, :]
        mask = mask & (qs == ks) & (ks >= 0) & (qs >= 0)
        if causal:
            mask = mask & (q_pos[:, None] >= kv_pos[None, :])
    elif causal:
        mask = mask & (rows >= cols)
    return mask
