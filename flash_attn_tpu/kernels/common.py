"""Shared in-kernel helpers for the flash-attention Pallas kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def default_interpret() -> bool:
    """Pallas interpret mode when not on a TPU backend (tests run on CPU)."""
    return jax.default_backend() != "tpu"

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128

_FP8_FORMATS = {
    jnp.dtype(jnp.float8_e4m3fn): (3, 7),  # (mantissa bits, exp bias)
    jnp.dtype(jnp.float8_e5m2): (2, 15),
}


def dequant_cast(x, dtype=jnp.bfloat16):
    """Cast a KV payload tile to a compute dtype, fast under Mosaic.

    Mosaic lowers fp8->bf16 ``astype`` through a slow elementwise path
    (measured ~29 us per (16,1024,128) tile vs ~0 for int8->bf16 —
    benchmarks/probe_fp8cast.py); an integer shift-add decode of the
    e4m3fn/e5m2 bit pattern via ``pltpu.bitcast`` is ~6x faster and
    bit-exact vs XLA's own cast:

      normal (e>0):    bf16_bits = sign<<15 | (mag << (7-M)) + ((127-B)<<7)
      denormal (e==0): value = sign * m * 2^(1 - B - M)

    where mag = the 7 magnitude bits, M = mantissa bits, B = exp bias.
    e4m3fn has no inf; e5m2 inf/NaN decode to large finite values — a KV
    cache never stores either. Non-fp8 dtypes take the native ``astype``.
    """
    fmt = _FP8_FORMATS.get(jnp.dtype(x.dtype))
    if fmt is None:
        return x if x.dtype == dtype else x.astype(dtype)
    mbits, bias = fmt
    u = pltpu.bitcast(x, jnp.uint8).astype(jnp.int32)
    mag = u & 0x7F
    sign = (u >> 7) & 1
    if dtype == jnp.float32:
        # Decode straight into f32 bits: no 16-bit intermediates at all —
        # measured FREE (hidden behind the dots) vs 0.95 us/tile for the
        # bf16-intermediate route (benchmarks/probe_fp8cast2.py).
        bits = (sign << 31) | ((mag << (23 - mbits)) + ((127 - bias) << 23))
        norm = pltpu.bitcast(bits, jnp.float32)
    else:
        bits = (sign << 15) | ((mag << (7 - mbits)) + ((127 - bias) << 7))
        norm = pltpu.bitcast(bits.astype(jnp.uint16), jnp.bfloat16)
    denorm = (
        mag.astype(jnp.float32)
        * jnp.where(sign == 1, -1.0, 1.0)
        * jnp.float32(2.0 ** (1 - bias - mbits))
    ).astype(norm.dtype)
    out = jnp.where(mag < (1 << mbits), denorm, norm)
    return out if out.dtype == dtype else out.astype(dtype)


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


def window_band_mask(rows_t, cols_t, *, window_left, window_right,
                     window_cell=None, num_sinks: int = 0):
    """Sliding-window band visibility on GLOBAL coordinate grids (True =
    inside the band), shared by the fwd and bwd kernels.

    ``window_cell=(cq, ck)`` quantizes the comparison to cell granularity
    (the blocksparse band router, ops/blocksparse.py): key column j is
    visible from row i iff cell_c(j) lies in the band run of cell_r(i) —
    exactly the cell-ification of the element band, via the identities
      cc >= floor((rc*cq - L)/ck)        <=>  cw >= rw - (L + ck - 1)
      cc <= floor((rc*cq + cq-1 + R)/ck) <=>  cw <= rw + (R + cq - 1)
    with rw = (i // cq) * cq, cw = (j // ck) * ck. ``num_sinks > 0`` ORs
    in the leading global columns (StreamingLLM sinks / blocksparse
    global tokens); element-causal still composes by AND outside.

    Returns None when no window component exists."""
    if window_left is None and window_right is None:
        return None
    if window_cell is not None:
        cq, ck = window_cell
        rw = (rows_t // cq) * cq
        cw = (cols_t // ck) * ck
        l_eff = None if window_left is None else window_left + ck - 1
        r_eff = None if window_right is None else window_right + cq - 1
    else:
        rw, cw, l_eff, r_eff = rows_t, cols_t, window_left, window_right
    band = None
    if l_eff is not None:
        band = cw >= rw - l_eff
    if r_eff is not None:
        b2 = cw <= rw + r_eff
        band = b2 if band is None else band & b2
    if num_sinks > 0:
        band = band | (cols_t < num_sinks)
    return band


def block_mask_predicates(
    iq, ik, *, block_q: int, block_k: int, num_k_blocks: int,
    causal: bool, bounds_possible: bool,
    window_left: int | None, window_right: int | None,
    window_cell=None, num_sinks: int = 0,
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

    With ``window_cell=(cq, ck)`` the quantized band is a superset of the
    element band widened by at most cq + ck - 2 elements on each edge:
    liveness uses the widened band (conservative include), the mask-free
    test uses the narrow band (full narrow visibility implies full
    quantized visibility). ``num_sinks`` keeps leading-column blocks live
    and forces the masked path on any block touching the sink region.
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
    if window_left is not None or window_right is not None:
        slack = 0 if window_cell is None else sum(window_cell) - 2
        live = jnp.bool_(True)
        free = jnp.bool_(True)
        if window_left is not None:
            # Mask-free wrt the left band edge iff min_col >= max_row - L.
            free = free & (c0 >= r1 - window_left)
            live = live & (c1 >= r0 - window_left - slack)
        if window_right is not None:
            # Mask-free wrt the right band edge iff max_col <= min_row + R.
            free = free & (c1 <= r0 + window_right)
            live = live & (c0 <= r1 + window_right + slack)
        if num_sinks > 0:
            free = free | (c1 < num_sinks)
            live = live | (c0 < num_sinks)
        needs_mask = needs_mask | jnp.logical_not(free)
        should_run = should_run & live
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


def paged_block_live(j, bk, *, length, window_left, first_band_pos,
                     num_sinks: int = 0):
    """Liveness of kv block ``j`` (width ``bk``) for the paged serving
    kernels: some key column must be in-sequence and either inside the
    visible band or a StreamingLLM sink. ``first_band_pos`` is the
    LOOSEST band floor across the query rows this launch serves —
    ``length - 1 - window_left`` for single-token decode, the FIRST
    chunk row's ``qpos - window_left`` for multi-token chunks (using a
    tighter row's floor skips blocks earlier rows still need — the
    exact bug class of `09ce7a7`). Shared by _decode_kernel,
    _decode_dma_kernel and _chunk_kernel so the algebra cannot diverge.
    """
    live = j * bk < length
    if window_left is not None:
        band_or_sink = (j + 1) * bk > first_band_pos
        if num_sinks > 0:
            band_or_sink = band_or_sink | (j * bk < num_sinks)
        live = live & band_or_sink
    return live


def paged_visibility_mask(kpos, qpos, *, length, window_left,
                          num_sinks: int = 0):
    """(rows, bk) True = key visible: in-sequence, causal vs the row's
    query position, and (with a window) inside the band or a sink.
    ``qpos`` may be a scalar (decode: length - 1) or a per-row column
    (chunk: first_qpos + t_row). Shared across the paged kernels."""
    mask = (kpos < length) & (kpos <= qpos)
    if window_left is not None:
        visible = kpos >= qpos - window_left
        if num_sinks > 0:
            visible = visible | (kpos < num_sinks)
        mask = mask & visible
    return mask


def paged_block_softmax(s, mask, m_prev, l_prev, *, softcap=None,
                        alibi_col=None, rel=None):
    """Shared per-block masked online-softmax update for the paged
    serving kernels (decode BlockSpec path, decode DMA path, chunk).

    ``s``: (rows, bk) fp32 scores with softmax_scale AND any dequant
    column scales already applied. Order of operations (must match
    ops.attention training semantics): softcap on the scaled scores,
    then the ALiBi bias ``alibi_col * rel`` (rel = kpos - qpos), then
    masking. ``m_prev``/``l_prev`` are (rows, L) running stats (L = 1
    or NUM_LANES — the update broadcasts along L).

    Returns ``(p, alpha, m_next, l_next)``; the caller stores the stats
    and applies ``alpha`` to its accumulator (decode uses
    ``alpha[:, 0:1]`` with lane-replicated stats; chunk uses column
    stats directly).
    """
    if softcap is not None:
        s = jnp.float32(softcap) * jnp.tanh(s / jnp.float32(softcap))
    if alibi_col is not None:
        s = s + alibi_col * rel
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, 0:1])
    p = jnp.where(mask, p, 0.0)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    return p, alpha, m_next, l_next
