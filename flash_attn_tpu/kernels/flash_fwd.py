"""Pallas TPU flash-attention forward kernel.

TPU-native redesign of the reference forward pass (reference:
csrc/flash_attn/src/fmha_fprop_kernel_1xN.h). The reference is
K/V-stationary with fp32 partial-O round-trips through global memory
(fmha_api.cpp:190-191, o_tmp); on TPU the VMEM carry is free and HBM
round-trips are not, so this kernel is **Q-stationary**: grid
(batch, head, q_block, kv_block) with the online-softmax running statistics
(m, l) and the fp32 output accumulator carried in VMEM scratch across the
kv_block (innermost, "arbitrary") grid dimension.

Semantics reproduced from the reference (SURVEY.md section 2.3):
  - online softmax with fp32 (m, l) statistics and the rescale rule
    acc_new = acc_prev * exp(m_prev - m_next) + exp(s - m_next) @ V
  - causal + sequence-length masking; degenerate rows (no valid key)
    produce out = 0 and lse = -inf (fmha_fprop_kernel_1xN.h:617,645)
  - returns per-row fp32 logsumexp (b, h, sq)
  - dropout applied to the un-normalized probabilities with the global
    1/(1-p) rescale folded into the final normalization
    (fmha_api.cpp:100-107 rp_dropout)
  - varlen via per-token positions + segment ids (the TPU-idiomatic
    encoding of cu_seqlens; converters live in ops/packing.py)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels import int8 as int8_qk
from flash_attn_tpu.kernels import prng
from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.kernels.common import (
    block_mask_predicates,
    classify_segment_block,
    window_band_mask,
)

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


def _band_coords(t, nq, wb):
    """Invert the banded-causal enumeration: row ``iq`` holds
    ``min(iq, wb) + 1`` live blocks — the DIAGONAL first (j = 0), then the
    band interior ascending (ik = max(0, iq - wb) + j - 1). ``wb`` is the
    number of blocks the band extends left of the diagonal
    (ceil(window_left / block)). Integer-only (branch-free compares
    against the row-start offsets) so it is usable inside BlockSpec index
    maps on the scalar core. Degenerates to the triangular enumeration
    when wb >= nq - 1."""
    def off(r):
        if r <= wb:
            return r * (r + 1) // 2
        return wb * (wb + 1) // 2 + (r - wb) * (wb + 1)

    iq = jnp.int32(0)
    for r in range(1, nq):
        iq = iq + (t >= off(r)).astype(jnp.int32)
    off_iq = jnp.where(
        iq <= wb,
        iq * (iq + 1) // 2,
        wb * (wb + 1) // 2 + (iq - wb) * (wb + 1),
    )
    j = t - off_iq
    lo = jnp.maximum(iq - wb, 0)
    ik = jnp.where(j == 0, iq, lo + j - 1)
    return iq, ik, j


def _band_steps(nq, wb):
    """Total live blocks of the banded enumeration."""
    if nq <= wb:
        return nq * (nq + 1) // 2
    return wb * (wb + 1) // 2 + (nq - wb) * (wb + 1)


def _tri_coords(t, nq, descend=False):
    """Invert the lower-triangle enumeration: step ``t`` of nq*(nq+1)/2
    -> (iq, ik) with ik <= iq. Integer-only (branch-free sum of compares
    against the row-start offsets r*(r+1)/2) so it is usable inside
    BlockSpec index maps on the scalar core.

    Within each row the DIAGONAL block comes FIRST (j=0 -> ik=iq):
    online-softmax merging is order-independent, and leading with the
    masked diagonal lets its extra VPU work overlap the following
    interior blocks' MXU streams instead of idling at the row tail.
    ``descend=False`` visits the interiors ascending (ik=0..iq-1 — one
    backward kv jump mid-row after the diagonal); ``descend=True``
    visits them descending (ik=iq-1..0 — every mid-row fetch adjacent,
    the only jump is at the row boundary)."""
    iq = jnp.int32(0)
    for r in range(1, nq):
        iq = iq + (t >= r * (r + 1) // 2).astype(jnp.int32)
    j = t - iq * (iq + 1) // 2
    ik = jnp.where(j == 0, iq, iq - j if descend else j - 1)
    return iq, ik, j


def _fwd_kernel(
    *refs,
    sq: int,
    sk: int,
    sk_pad: int,
    block_q: int,
    block_k: int,
    num_q_blocks: int,
    num_k_blocks: int,
    causal: bool,
    has_segments: bool,
    scale: float,
    p_drop: float,
    num_heads: int,
    save_lse: bool,
    q_chains: int,
    diag_chains: int,
    diag_specialization: bool,
    tri_grid: bool,
    window_left: int | None,
    window_right: int | None,
    band_grid: bool,
    band_wb: int,
    has_alibi: bool = False,
    softcap: float | None = None,
    qk_int8: bool = False,
    window_cell: tuple[int, int] | None = None,
    num_sinks: int = 0,
    tri_descend: bool = False,
):
    idx = 0
    if p_drop > 0.0:
        seed_ref = refs[idx]
        idx += 1
    if has_alibi:
        alibi_ref = refs[idx]  # (b, h) SMEM slope table (pre /scale)
        idx += 1
    q_ref, k_ref, v_ref = refs[idx : idx + 3]
    idx += 3
    if qk_int8:
        # Experimental int8 QK^T (kernels/int8.py; demoted, INT8.md).
        qscale_ref, kscale_ref = refs[idx : idx + 2]
        idx += 2
    if has_segments:
        qpos_ref, kpos_ref, qseg_ref, kseg_ref = refs[idx : idx + 4]
        idx += 4
    if save_lse:
        o_ref, lse_ref, m_ref, l_ref, acc_ref = refs[idx : idx + 5]
    else:
        o_ref, m_ref, l_ref, acc_ref = refs[idx : idx + 4]

    if tri_grid:
        # Triangular linearized causal grid: (b, h, t) covers ONLY the
        # executed lower-triangle blocks — no skipped grid steps, no dead
        # K/V prefetch. Requires nq == nk and bq == bk (self-attention).
        # jpos is the position within the row (0 = the diagonal block,
        # which leads the row; see _tri_coords).
        iq, ik, jpos = _tri_coords(
            pl.program_id(2), num_q_blocks, tri_descend
        )
        is_first = jpos == 0
        is_last = jpos == iq
    elif band_grid:
        # Banded linearized grid (causal + window_left): (b, h, t) covers
        # ONLY the live band blocks — ~nq * (wb + 1) steps instead of
        # nq * nk, so wall-clock scales with band width. Row order is
        # diagonal-first like the triangular grid.
        iq, ik, jpos = _band_coords(
            pl.program_id(2), num_q_blocks, band_wb
        )
        is_first = jpos == 0
        is_last = jpos == jnp.minimum(iq, band_wb)
    else:
        iq = pl.program_id(2)
        ik = pl.program_id(3)
        is_first = ik == 0
        is_last = None  # rectangular grids finalize at num_k_blocks - 1
    # program_id must be read at kernel top level (the CPU interpreter does
    # not substitute it inside pl.when branches).
    bh = pl.program_id(0) * num_heads + pl.program_id(1)
    if has_alibi:
        # This (batch, head)'s slope from the whole-table SMEM block —
        # read here, not in the masking closure, for the same reason.
        alibi_slope = alibi_ref[pl.program_id(0), pl.program_id(1)]

    # Which mask components can this launch ever need? (static)
    bounds_possible = sk != sk_pad  # padded key columns at the last k block
    windowed = window_left is not None or window_right is not None
    bqs = block_q // q_chains  # sub-q chain height
    # Does exp2(DEFAULT_MASK_VALUE * c - m) underflow to exactly 0? With a
    # pathologically small softmax_scale (< ~1e-36) it does not, and masked
    # slots would leak probability mass — fall back to an explicit select.
    _c_static = scale * 1.4426950408889634
    mask_underflows = DEFAULT_MASK_VALUE * _c_static <= -150.0

    @pl.when(is_first)
    def _init():
        # Finite init (not -inf) so alpha = exp(m_prev - m_next) never hits
        # the NaN-producing (-inf) - (-inf) on fully-masked rows.
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _compute(masked: bool):
        """Process the (block_q x block_k) tile as ``q_chains`` independent
        sub-q chains: all QK^T dots are issued first (independent MXU
        streams), then each chain's online-softmax runs — chains share no
        state, so the VPU work of chain j overlaps the MXU streaming of
        later dots / earlier PV products (measured ~1.45x on v5e vs a
        single fused chain; benchmarks/bench_dev.py 'vard')."""
        k = k_ref[0, 0]  # (block_k, d)
        v = v_ref[0, 0]
        # Phase 1: issue every chain's QK^T up front, register-resident.
        # (int8 path accumulates in int32, dequantized per chain below.)
        dot_acc = jnp.int32 if qk_int8 else jnp.float32
        ss = []
        for j in range(q_chains):
            qj = q_ref[0, 0, j * bqs : (j + 1) * bqs, :]  # (bqs, d)
            ss.append(
                jax.lax.dot_general(
                    qj, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=dot_acc,
                )
            )

        # Phase 2: per-chain online softmax + PV.
        c = jnp.float32(scale * 1.4426950408889634)  # scale * log2(e)
        for j in range(q_chains):
            rows_sl = slice(j * bqs, (j + 1) * bqs)
            row0 = iq * block_q + j * bqs  # global first row of this chain
            s = ss[j]

            if qk_int8:
                s = int8_qk.dequant_scores(
                    s, qscale_ref[0, 0][rows_sl], kscale_ref[0, 0]
                )

            if softcap is not None:
                # Logit soft-capping (Gemma-2 / CUDA flash_attn v2.6
                # softcap): cap * tanh(u / cap) on the SCALED score u.
                # The kernel carries s in pre-scale units (scale folds
                # into the exp2 constant c below), so the transform is
                # s' = (cap/scale) * tanh(s * scale/cap): then
                # s' * scale = cap * tanh(u / cap) exactly. Applied
                # before the ALiBi bias and before masking (a capped
                # DEFAULT_MASK_VALUE would stop underflowing).
                s = jnp.tanh(s * jnp.float32(scale / softcap)) * jnp.float32(
                    softcap / scale
                )

            if has_alibi:
                # ALiBi (linear position bias): the slope arrives
                # pre-divided by softmax_scale, so adding it to the raw
                # QK^T keeps the exp2/scale fold intact
                # ((s + slope/scale * dist) * c = s*scale*log2e +
                # slope*dist*log2e). Distances use the same top-left /
                # global-index convention as this library's causal mask
                # (CUDA v2.4's bottom-right alignment differs only for
                # sq != sk); with segments the caller-supplied positions
                # are compared directly, so ALiBi is exact across ring
                # shards and under custom alignments via positions.
                slope = alibi_slope
                if has_segments:
                    qp_a = qpos_ref[0][rows_sl][:, None]
                    kp_a = kpos_ref[0][None, :]
                    dist = (
                        (kp_a - qp_a) if causal else -jnp.abs(qp_a - kp_a)
                    )
                else:
                    rows_a = jax.lax.broadcasted_iota(
                        jnp.int32, (bqs, block_k), 0
                    ) + row0
                    cols_a = jax.lax.broadcasted_iota(
                        jnp.int32, (bqs, block_k), 1
                    ) + ik * block_k
                    dist = (
                        (cols_a - rows_a)
                        if causal
                        else -jnp.abs(rows_a - cols_a)
                    )
                s = s + slope * dist.astype(jnp.float32)

            # Dropout hashes on (bqs, 1) / (1, block_k) index *vectors*
            # (prng.hash_coords is separable so the row half is vector
            # work); masks use full-tile iotas — measured faster on v5e
            # than broadcasting vector compares.
            rows = cols = None
            if p_drop > 0.0:
                rows = (
                    jax.lax.broadcasted_iota(jnp.int32, (bqs, 1), 0) + row0
                )
                cols = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                    + ik * block_k
                )

            mask = None
            if masked:
                rows_t = (
                    jax.lax.broadcasted_iota(jnp.int32, (bqs, block_k), 0)
                    + row0
                )
                cols_t = (
                    jax.lax.broadcasted_iota(jnp.int32, (bqs, block_k), 1)
                    + ik * block_k
                )
                mask = jnp.ones((bqs, block_k), jnp.bool_)
                if bounds_possible:
                    # Padded key columns never contribute.
                    mask = cols_t < sk
                if has_segments:
                    qs = qseg_ref[0][rows_sl][:, None]
                    ks = kseg_ref[0][None, :]
                    mask = mask & (qs == ks) & (ks >= 0) & (qs >= 0)
                    if causal or windowed:
                        qp = qpos_ref[0][rows_sl][:, None]
                        kp = kpos_ref[0][None, :]
                        if causal:
                            mask = mask & (qp >= kp)
                        if window_left is not None:
                            mask = mask & (kp >= qp - window_left)
                        if window_right is not None:
                            mask = mask & (kp <= qp + window_right)
                else:
                    if causal:
                        mask = mask & (rows_t >= cols_t)
                    band = window_band_mask(
                        rows_t, cols_t, window_left=window_left,
                        window_right=window_right, window_cell=window_cell,
                        num_sinks=num_sinks,
                    )
                    if band is not None:
                        mask = mask & band
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            m_prev = m_ref[rows_sl]  # (bqs, 1) column state
            l_prev = l_ref[rows_sl]
            # exp2 trick (reference softmax.h:211-226): softmax_scale AND
            # log2(e) fold into one constant; m is tracked in the
            # log2-scaled domain via a cheap (bqs, 1) multiply, so the
            # score tile needs only an FMA + exp2 per element.
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)  # (bqs, 1)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s * c - m_next)
            if masked and (has_segments or windowed or not mask_underflows):
                # Explicit zero for masked slots: a row fully masked in this
                # block but valid in a *later* one (possible with segments,
                # where a row's partner keys may start mid-sequence, and
                # with sliding windows, where a row's band may start after
                # this block's columns) would otherwise contribute
                # p = exp2(0) = 1. Without segments/window, every row sees
                # valid keys in kv block 0 (cols 0..r for causal; cols < sk
                # for bounds), so m is genuine by the time any
                # partially-masked block is processed and exp2(DMV*c - m)
                # underflows to exactly 0 — unless softmax_scale is tiny
                # (see mask_underflows above).
                p = jnp.where(mask, p, 0.0)

            # The normalizer sums the *un-dropped* probabilities (dropout
            # acts after softmax; the 1/(1-p) rescale folds into finalize).
            l_curr = jnp.sum(p, axis=1, keepdims=True)
            l_ref[rows_sl] = alpha * l_prev + l_curr
            m_ref[rows_sl] = m_next

            if p_drop > 0.0:
                keep = prng.keep_mask(
                    seed_ref[0, 0],
                    bh.astype(jnp.uint32),
                    rows.astype(jnp.uint32),
                    cols.astype(jnp.uint32),
                    p_drop,
                )
                p = jnp.where(keep, p, 0.0)

            pv = jax.lax.dot_general(
                p.astype(v.dtype),
                v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[rows_sl] = acc_ref[rows_sl] * alpha + pv

    def _compute_diag():
        """Diagonal-block specialization (causal, bq == bk, no segments /
        bounds / dropout): under those static conditions a masked block IS
        the diagonal (iq == ik — see the needs_mask/should_run algebra
        below), so sub-q chain ``j`` (rows [j*bqs, (j+1)*bqs)) only attends
        key columns [0, (j+1)*bqs). Each chain issues ONE narrower QK^T dot
        instead of the full-width one (3/8 of the block's dot FLOPs saved at
        q_chains=4 — the reference analog is its q-step skip,
        fmha_fprop_kernel_1xN.h:302, at 16-row granularity) and the causal
        mask reduces to a STATIC (bqs, bqs) triangle on the last chunk —
        no per-block iota/add over the full tile."""
        dch = diag_chains
        while block_q % (dch * 128) != 0 and dch > 1:
            dch -= 1
        bqd = block_q // dch
        k = k_ref[0, 0]  # (block_k, d)
        v = v_ref[0, 0]
        # Phase 1: all chains' dots first (independent MXU streams).
        ss = []
        for j in range(dch):
            w = (j + 1) * bqd
            qj = q_ref[0, 0, j * bqd : (j + 1) * bqd, :]
            ss.append(
                jax.lax.dot_general(
                    qj, k[:w], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        c = jnp.float32(scale * 1.4426950408889634)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (bqd, bqd), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (bqd, bqd), 1)
        )
        # Phase 2: per-chain online softmax + PV on [head | diag] halves.
        for j in range(dch):
            rows_sl = slice(j * bqd, (j + 1) * bqd)
            s = ss[j]  # (bqd, (j+1)*bqd)
            s_diag = jnp.where(tri, s[:, j * bqd :], DEFAULT_MASK_VALUE)
            m_prev = m_ref[rows_sl]
            l_prev = l_ref[rows_sl]
            m_curr = jnp.max(s_diag, axis=1, keepdims=True)
            if j > 0:
                s_head = s[:, : j * bqd]  # fully below the diagonal
                m_curr = jnp.maximum(
                    m_curr, jnp.max(s_head, axis=1, keepdims=True)
                )
            m_curr = m_curr * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p_diag = jnp.exp2(s_diag * c - m_next)
            l_curr = jnp.sum(p_diag, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p_diag.astype(v.dtype),
                v[j * bqd : (j + 1) * bqd],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if j > 0:
                p_head = jnp.exp2(s_head * c - m_next)
                l_curr = l_curr + jnp.sum(p_head, axis=1, keepdims=True)
                pv = pv + jax.lax.dot_general(
                    p_head.astype(v.dtype),
                    v[: j * bqd],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            l_ref[rows_sl] = alpha * l_prev + l_curr
            m_ref[rows_sl] = m_next
            acc_ref[rows_sl] = acc_ref[rows_sl] * alpha + pv

    # Static gate for the diagonal specialization: requires bq == bk so
    # that (should_run & needs_mask) implies iq == ik exactly, and the
    # underflow guarantee so masked slots vanish without a second select.
    use_diag = (
        diag_specialization
        and causal
        and not has_segments
        and not bounds_possible
        and not windowed
        and not has_alibi
        and softcap is None
        and not qk_int8
        and block_q == block_k
        and p_drop == 0.0
        and mask_underflows
    )

    if has_segments:
        # Position-aware runtime block classification (the segment-path
        # analog of the static causal skip): block min/max of the position
        # and segment-id vectors decide, per grid step, whether the block
        # is dead (every pair causally masked — e.g. fully-future shards in
        # ring attention), interior (uniform same-segment, fully past —
        # mask-free fast path), or boundary (full mask). Conservative: any
        # uncertainty falls back to masked=True.
        live, uniform = classify_segment_block(
            qpos_ref[0], kpos_ref[0], qseg_ref[0], kseg_ref[0],
            causal=causal, bounds_possible=bounds_possible,
            window_left=window_left, window_right=window_right,
        )
        pl.when(live & uniform)(lambda: _compute(masked=False))
        pl.when(live & jnp.logical_not(uniform))(
            lambda: _compute(masked=True)
        )
    elif tri_grid:
        # Triangular grid: every step is executed; the diagonal block
        # (ik == iq) is the only one needing a mask. With bounds padding
        # the only block touching cols >= sk is ik == nk-1, reached only
        # by row nq-1 — i.e. also its diagonal block, so the single
        # masked=True call covers causal + bounds together (use_diag is
        # gated off when bounds_possible).
        diag_fn = _compute_diag if use_diag else (
            lambda: _compute(masked=True)
        )
        pl.when(ik == iq)(diag_fn)
        pl.when(ik != iq)(lambda: _compute(masked=False))
    elif band_grid:
        # Banded grid: every step is live by construction. j == 0 is the
        # diagonal (causal mask; also the only block that can touch the
        # bounds padding — band_grid implies ik <= iq so ik == nk-1 only
        # at the last row's diagonal). j > 0 blocks need a mask only when
        # they cross the band's LEFT edge, which at element granularity
        # spans at most the two leftmost live blocks of the row. The
        # diagonal specialization applies when window_left >= block_q - 1
        # (the left edge then cannot cross the diagonal block).
        use_diag_band = (
            diag_specialization
            and not bounds_possible
            and not has_alibi
            and softcap is None
            and not qk_int8
            and block_q == block_k
            and p_drop == 0.0
            and mask_underflows
            and window_left is not None
            and window_left >= block_q - 1
        )
        diag_fn = _compute_diag if use_diag_band else (
            lambda: _compute(masked=True)
        )
        pl.when(jpos == 0)(diag_fn)
        needs_left = (
            ik * block_k < iq * block_q + block_q - 1 - window_left
        )
        pl.when((jpos != 0) & needs_left)(lambda: _compute(masked=True))
        pl.when((jpos != 0) & jnp.logical_not(needs_left))(
            lambda: _compute(masked=False)
        )
    else:
        # Per-block mask requirement (traced): the last k block when sk is
        # padded, blocks intersecting the causal diagonal, and blocks
        # crossing a sliding-window band edge. Interior blocks take a
        # mask-free fast path (no iota / compare / select passes over the
        # score tile). ``should_run`` skips blocks with no visible pair:
        # entirely above the causal diagonal or entirely outside the band
        # (reference analog: fmha_fprop_kernel_1xN.h:302 skips q steps
        # below the k block). Shared with the backward kernel
        # (kernels/common.py) so the band algebra cannot diverge.
        needs_mask, should_run, have_mask, have_skip = (
            block_mask_predicates(
                iq, ik, block_q=block_q, block_k=block_k,
                num_k_blocks=num_k_blocks, causal=causal,
                bounds_possible=bounds_possible,
                window_left=window_left, window_right=window_right,
                window_cell=window_cell, num_sinks=num_sinks,
            )
        )
        masked_fn = _compute_diag if use_diag else (
            lambda: _compute(masked=True)
        )
        if have_skip:
            pl.when(should_run & needs_mask)(masked_fn)
            pl.when(should_run & jnp.logical_not(needs_mask))(
                lambda: _compute(masked=False)
            )
        elif have_mask:
            pl.when(needs_mask)(masked_fn)
            pl.when(jnp.logical_not(needs_mask))(
                lambda: _compute(masked=False)
            )
        else:
            # No mask component exists statically: single fast path.
            _compute(masked=False)

    @pl.when(
        is_last if (tri_grid or band_grid) else (ik == num_k_blocks - 1)
    )
    def _finalize():
        l = l_ref[...]  # (block_q, 1)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        if p_drop > 0.0:
            l_inv = l_inv * (1.0 / (1.0 - p_drop))
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        if save_lse:
            m0 = m_ref[...]  # log2-scaled domain: true max = m0 * ln2
            l0 = l_ref[...]
            lse_col = jnp.where(
                l0 == 0.0,
                -jnp.inf,
                m0 * jnp.float32(0.6931471805599453) + jnp.log(l0),
            )  # (block_q, 1)
            # Packed store: the LSE output is a (b, h, sq, 1) column — i.e.
            # the reference's packed softmax_lse (b, h, sq) contract
            # (fmha_api.cpp:193) with a trailing unit lane — instead of a
            # 128x lane-replicated (b, h, sq, 128) tensor.
            lse_ref[0, 0] = lse_col


def flash_attention_fwd(
    q: jax.Array,  # (b, h, sq_pad, d_pad)
    k: jax.Array,  # (b, h, sk_pad, d_pad)
    v: jax.Array,
    q_positions: jax.Array | None,  # (b, sq_pad) int32
    kv_positions: jax.Array | None,
    q_segment_ids: jax.Array | None,  # (b, sq_pad) int32, -1 = padding
    kv_segment_ids: jax.Array | None,
    dropout_seed: jax.Array | None,  # () uint32
    *,
    sq: int,  # true (unpadded) lengths
    sk: int,
    causal: bool,
    softmax_scale: float,
    dropout_p: float = 0.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool = False,
    save_lse: bool = True,
    window_left: int | None = None,
    window_right: int | None = None,
    alibi: jax.Array | None = None,  # (b, h) fp32, pre-divided by scale
    softcap: float | None = None,
    q_scale: jax.Array | None = None,  # (b, h, sq_pad, 1) fp32: int8 path
    k_scale: jax.Array | None = None,  # (b, h_kv, 1, sk_pad) fp32
    out_dtype=None,
    window_cell: tuple[int, int] | None = None,
    num_sinks: int = 0,
):
    """Launch the forward kernel on block-aligned inputs.

    Returns (out, lse): out (b, h, sq_pad, d_pad) in q.dtype, lse
    (b, h, sq_pad) fp32 packed — the reference softmax_lse layout
    (fmha_api.cpp:193). Rows >= sq are garbage and must be sliced by the
    caller (ops/attention.py handles padding there).

    ``save_lse=False`` (inference): skips materializing the LSE tensor and
    returns (out, None).

    GQA/MQA: k/v may have fewer heads than q (h % h_kv == 0); query head
    ``h`` reads kv head ``h // group`` directly from HBM — no broadcasted
    KV copy is ever materialized.
    """
    b, h, sq_pad, d = q.shape
    sk_pad = k.shape[2]
    h_kv = k.shape[1]
    if h % h_kv != 0:
        raise ValueError(f"q heads {h} not a multiple of kv heads {h_kv}")
    group = h // h_kv
    if block_sizes is None:
        block_sizes = BlockSizes.choose(seq_len_q=sq, seq_len_k=sk, head_dim=d)
    bq = min(block_sizes.block_q, sq_pad)
    bk = min(block_sizes.block_k, sk_pad)
    assert sq_pad % bq == 0 and sk_pad % bk == 0, (sq_pad, bq, sk_pad, bk)
    num_q_blocks = sq_pad // bq
    num_k_blocks = sk_pad // bk
    # Largest chain count <= requested that keeps the sub-q height a
    # multiple of the 128-lane tile.
    q_chains = max(1, min(block_sizes.q_chains, bq // 128))
    while bq % (q_chains * 128) != 0:
        q_chains -= 1
    diag_chains = max(1, min(block_sizes.q_chains_diag, bq // 128))
    while bq % (diag_chains * 128) != 0:
        diag_chains -= 1
    has_segments = q_segment_ids is not None
    p_drop = float(dropout_p)
    windowed = window_left is not None or window_right is not None
    if window_cell is not None or num_sinks > 0:
        # Cell-quantized bands / sink columns (blocksparse band routing)
        # compare global coordinates; the positions path is unsupported.
        assert not has_segments, "window_cell/num_sinks require no segments"
        assert windowed, "window_cell/num_sinks require a window"
    # Band widening slack of the cell-quantized window (the quantized
    # band is a superset of the element band by < cq + ck - 2 per edge).
    wslack = 0 if window_cell is None else sum(window_cell) - 2

    # Triangular linearized grid for causal self-attention: enumerate only
    # the nq*(nq+1)/2 executed lower-triangle blocks instead of a dense
    # nq*nk grid where ~half the steps are skipped — each skipped step
    # still costs a grid-step of pipeline overhead (~0.35 ms at S=4K).
    # Sliding windows use the rectangular grid: most triangle blocks are
    # band-dead and the rectangular grid's DMA-redirect makes skipped
    # steps cheap.
    tri_grid = (
        causal
        and not has_segments
        and not windowed
        and bq == bk
        and sq_pad == sk_pad
        and num_q_blocks > 1
    )

    # Banded linearized grid for causal sliding-window self-attention:
    # enumerate only the live band blocks (~nq * (ceil(left/bq) + 1))
    # instead of a rectangular nq * nk grid where most steps are
    # band-dead — wall-clock scales with the band width. The backward
    # keeps the rectangular grid: its aliased dq RMW would see adjacent
    # equal block indices under a banded enumeration (stale-copy hazard,
    # see flash_bwd.py), and dKV rows are kv-major anyway.
    band_grid = (
        causal
        and not has_segments
        and window_left is not None
        and window_right is None
        and num_sinks == 0  # sink columns live outside the enumerated band
        and bq == bk
        and sq_pad == sk_pad
        and num_q_blocks > 1
    )
    band_wb = 0
    if band_grid:
        wl_eff = window_left + wslack  # widened: quantized band superset
        band_wb = -(-wl_eff // bq) if wl_eff > 0 else 0

    if tri_grid:
        grid = (b, h, num_q_blocks * (num_q_blocks + 1) // 2)

        def q_index(b_, h_, t):
            return (b_, h_, _tri_coords(t, num_q_blocks)[0], 0)

        def kv_index(b_, h_, t):
            return (
                b_,
                h_ // group,
                _tri_coords(t, num_q_blocks, block_sizes.tri_descend)[1],
                0,
            )
    elif band_grid:
        grid = (b, h, _band_steps(num_q_blocks, band_wb))

        def q_index(b_, h_, t):
            return (b_, h_, _band_coords(t, num_q_blocks, band_wb)[0], 0)

        def kv_index(b_, h_, t):
            return (
                b_,
                h_ // group,
                _band_coords(t, num_q_blocks, band_wb)[1],
                0,
            )
    else:
        grid = (b, h, num_q_blocks, num_k_blocks)

        def q_index(b_, h_, iq, ik):
            return (b_, h_, iq, 0)

        if windowed and not has_segments:
            # Band-skipped kv blocks are never read: clamp the DMA index
            # into the row's live block range so the pipeline prefetch
            # streams live K/V tiles only (and adjacent equal indices let
            # Pallas elide the refetch entirely). Safe for read-only
            # operands. The column upper bound combines causal (c <= r)
            # with window_right (c <= r + R); the lower bound is
            # window_left (c >= r - L).
            # Clamps use the WIDENED band (wslack) so a cell-quantized
            # window never redirects a live block's DMA; sink columns
            # keep their blocks un-clamped (they are live left of the
            # band).
            ub_terms = ([0] if causal else []) + (
                [window_right + wslack] if window_right is not None else []
            )
            ub_off = min(ub_terms) if ub_terms else None

            def kv_index(b_, h_, iq, ik):
                ike = ik
                if ub_off is not None:
                    hi = jnp.minimum(
                        ((iq + 1) * bq - 1 + ub_off) // bk,
                        num_k_blocks - 1,
                    )
                    if num_sinks > 0 and not causal:
                        # A sink block may sit right of an early row's
                        # band top; never clamp it away. (With causal the
                        # ub is the diagonal, which sinks do not cross.)
                        hi = jnp.maximum(hi, (num_sinks - 1) // bk)
                    ike = jnp.minimum(ike, jnp.maximum(hi, 0))
                if window_left is not None and num_sinks == 0:
                    lo = jnp.clip(
                        (iq * bq - window_left - wslack) // bk,
                        0, num_k_blocks - 1,
                    )
                    ike = jnp.maximum(ike, lo)
                return (b_, h_ // group, ike, 0)
        elif causal and not has_segments:
            # Causal-skipped kv blocks are never read: redirect their DMA
            # to block 0 — the block the *next* q row starts with — so the
            # pipeline prefetch does useful work instead of streaming dead
            # K/V tiles (~half the kv traffic at long seqlen).
            def kv_index(b_, h_, iq, ik):
                run = (iq + 1) * bq - 1 >= ik * bk
                return (b_, h_ // group, jax.lax.select(run, ik, 0), 0)
        else:
            def kv_index(b_, h_, iq, ik):
                return (b_, h_ // group, ik, 0)

    in_specs = []
    args = []
    if p_drop > 0.0:
        assert dropout_seed is not None
        in_specs.append(
            pl.BlockSpec(
                (1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM
            )
        )
        args.append(dropout_seed.reshape(1, 1).astype(jnp.uint32))
    has_alibi = alibi is not None
    if has_alibi:
        # Whole (b, h) slope table in SMEM, indexed by program ids inside
        # the kernel: a (1, 1) block over a (b, h) array fails Mosaic's
        # block-shape check on hardware (interpret mode accepts it —
        # caught by the round-4 on-device determinism run).
        in_specs.append(
            pl.BlockSpec(
                alibi.shape, lambda *_: (0, 0), memory_space=pltpu.SMEM
            )
        )
        args.append(alibi.astype(jnp.float32))

    in_specs += [
        pl.BlockSpec((1, 1, bq, d), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, d), kv_index, memory_space=pltpu.VMEM),
    ]
    args += [q, k, v]
    qk_int8 = q_scale is not None
    if qk_int8:
        assert k_scale is not None and q.dtype == jnp.int8, (
            q.dtype, k_scale,
        )
        in_specs += int8_qk.fwd_scale_specs(bq, bk, q_index, kv_index)
        args += [q_scale.astype(jnp.float32), k_scale.astype(jnp.float32)]
    if has_segments:
        assert (
            kv_segment_ids is not None
            and q_positions is not None
            and kv_positions is not None
        )
        in_specs += [
            pl.BlockSpec(
                (1, bq), lambda b_, h_, iq, ik: (b_, iq), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bk), lambda b_, h_, iq, ik: (b_, ik), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bq), lambda b_, h_, iq, ik: (b_, iq), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bk), lambda b_, h_, iq, ik: (b_, ik), memory_space=pltpu.VMEM
            ),
        ]
        args += [
            q_positions.astype(jnp.int32),
            kv_positions.astype(jnp.int32),
            q_segment_ids.astype(jnp.int32),
            kv_segment_ids.astype(jnp.int32),
        ]

    if out_dtype is None:
        out_dtype = q.dtype
    out_shape = [
        jax.ShapeDtypeStruct((b, h, sq_pad, d), out_dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, bq, d), q_index, memory_space=pltpu.VMEM),
    ]
    if save_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, 1, bq, 1), q_index, memory_space=pltpu.VMEM)
        )
    scratch_shapes = [
        # Column-shaped (bq, 1) m/l state: lane-replicated carries waste
        # 128x the VPU arithmetic (alpha exp2 etc.); measured ~2% whole-
        # kernel win (benchmarks/ab_interleave.py ml_col).
        pltpu.VMEM((bq, 1), jnp.float32),  # m
        pltpu.VMEM((bq, 1), jnp.float32),  # l
        pltpu.VMEM((bq, d), jnp.float32),  # acc
    ]

    kernel = functools.partial(
        _fwd_kernel,
        sq=sq,
        sk=sk,
        sk_pad=sk_pad,
        block_q=bq,
        block_k=bk,
        num_q_blocks=num_q_blocks,
        num_k_blocks=num_k_blocks,
        causal=causal,
        has_segments=has_segments,
        scale=float(softmax_scale),
        p_drop=p_drop,
        num_heads=h,
        save_lse=save_lse,
        q_chains=q_chains,
        diag_chains=diag_chains,
        diag_specialization=block_sizes.diag_specialization,
        tri_grid=tri_grid,
        window_left=window_left,
        window_right=window_right,
        band_grid=band_grid,
        band_wb=band_wb,
        has_alibi=has_alibi,
        softcap=None if softcap is None else float(softcap),
        qk_int8=qk_int8,
        window_cell=window_cell,
        num_sinks=num_sinks,
        tri_descend=block_sizes.tri_descend,
    )

    flops_mask = 0.5 if causal else 1.0
    if windowed:
        # Average visible band width as a fraction of sk.
        band = (window_left if window_left is not None else sk) + (
            0 if causal else (
                window_right if window_right is not None else sk
            )
        )
        flops_mask = min(flops_mask, min(band + 1, sk) / sk)
    cost = pl.CostEstimate(
        flops=int(4 * b * h * sq * sk * d * flops_mask),
        bytes_accessed=int(
            (q.size + k.size + v.size + q.size) * q.dtype.itemsize
        ),
        transcendentals=int(b * h * sq * sk * flops_mask),
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary")
                if (tri_grid or band_grid)
                else ("parallel", "parallel", "parallel", "arbitrary")
            ),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    if save_lse:
        # (b, h, sq_pad, 1) -> (b, h, sq_pad): free squeeze.
        return outs[0], outs[1].reshape(b, h, sq_pad)
    return outs[0], None
