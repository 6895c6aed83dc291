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


def block_mask_predicates(
    iq, ik, *, block_q: int, block_k: int, num_k_blocks: int,
    causal: bool, bounds_possible: bool,
    window_left: int | None, window_right: int | None,
):
    """Static/traced per-block mask requirement for the RECTANGULAR
    (iq, ik) grid, shared by the fwd and bwd kernels so the band-edge
    algebra can never diverge between them.

    Returns (needs_mask, should_run, have_mask, have_skip):
      - ``needs_mask``: the block intersects a mask component (padded
        bounds column, causal diagonal, or a window band edge) and must
        take the masked path;
      - ``should_run``: the block has at least one visible (q, k) pair
        (False = entirely above the diagonal / outside the band);
      - ``have_mask`` / ``have_skip``: Python bools — whether any mask /
        skip component exists statically for this launch.
    """
    needs_mask = jnp.bool_(False)
    should_run = jnp.bool_(True)
    have_mask = have_skip = False
    r0, r1 = iq * block_q, iq * block_q + block_q - 1
    c0, c1 = ik * block_k, ik * block_k + block_k - 1
    if bounds_possible:
        needs_mask = needs_mask | (ik == num_k_blocks - 1)
        have_mask = True
    if causal:
        # Not entirely below the diagonal: min_row < max_col.
        needs_mask = needs_mask | (r0 < c1)
        should_run = should_run & (r1 >= c0)
        have_mask = have_skip = True
    if window_left is not None:
        # Mask-free wrt the left band edge iff min_col >= max_row - L.
        needs_mask = needs_mask | (c0 < r1 - window_left)
        should_run = should_run & (c1 >= r0 - window_left)
        have_mask = have_skip = True
    if window_right is not None:
        # Mask-free wrt the right band edge iff max_col <= min_row + R.
        needs_mask = needs_mask | (c1 > r0 + window_right)
        should_run = should_run & (c0 <= r1 + window_right)
        have_mask = have_skip = True
    return needs_mask, should_run, have_mask, have_skip


def classify_segment_block(qp_vec, kp_vec, qs_vec, ks_vec, *, causal,
                           bounds_possible, window_left=None,
                           window_right=None):
    """Position-aware runtime block classification for the segment path,
    shared by the fwd and bwd kernels.

    Returns (live, uniform): ``live`` is False when every (q, k) pair in
    the block is masked (causally — max q_pos < min kv_pos, e.g. a
    fully-future ring-attention shard — or entirely outside the sliding
    window band), skipped entirely; ``uniform`` is True when the block is
    provably mask-free (single shared non-padding segment id, fully
    causally past, fully inside the window band, no bounds padding) and
    may run the fast path. Conservative: any uncertainty returns
    uniform=False.
    """
    import jax.numpy as jnp

    live = jnp.bool_(True)
    if causal:
        live = jnp.max(qp_vec) >= jnp.min(kp_vec)
    seg_lo = jnp.minimum(jnp.min(qs_vec), jnp.min(ks_vec))
    seg_hi = jnp.maximum(jnp.max(qs_vec), jnp.max(ks_vec))
    uniform = (seg_lo == seg_hi) & (seg_lo >= 0)
    if bounds_possible:
        uniform = jnp.bool_(False)
    if causal:
        uniform = uniform & (jnp.min(qp_vec) >= jnp.max(kp_vec))
    if window_left is not None:
        live = live & (jnp.max(kp_vec) >= jnp.min(qp_vec) - window_left)
        uniform = uniform & (
            jnp.min(kp_vec) >= jnp.max(qp_vec) - window_left
        )
    if window_right is not None:
        live = live & (jnp.min(kp_vec) <= jnp.max(qp_vec) + window_right)
        uniform = uniform & (
            jnp.max(kp_vec) <= jnp.min(qp_vec) + window_right
        )
    return live, uniform
