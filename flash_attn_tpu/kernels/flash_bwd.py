"""Pallas TPU flash-attention backward kernels.

The reference snapshot never shipped its backward kernel (SURVEY.md: only
``fwd`` is bound, csrc/flash_attn/fmha_api.cpp:244-247); its contract is
defined by the Python call site (flash_attn/flash_attn_interface.py:29-36):
recompute probabilities from saved (q, k, lse), regenerate the identical
dropout mask, produce dq/dk/dv.

TPU-native design: ONE fused K/V-stationary kernel, grid
(b, h, kv_block, q_block): QK^T and dO V^T are computed once per tile
(5 dots) and feed dV, dK and dQ together. dK/dV accumulate in VMEM
scratch per kv block; the dQ carry lives in a full-sequence VMEM scratch
when it fits (sq <= 8K at d=128) and otherwise streams through an
input/output-aliased fp32 block per q tile (long-context training; 27%
faster at S=16K d=128 than a two-kernel split that recomputes the two
leading dots).

Both recompute the normalized probabilities as p = exp(scale*q.k - lse)
(no second softmax reduction), and use di = rowsum(dout * out) — the
``softmax_d`` correction of the reference contract. The dropout mask is
regenerated bit-identically from global element coordinates
(kernels/prng.py), so no mask tensor is ever stored.

Performance structure (mirrors flash_fwd.py; measured on v5e):
  - exp2 with softmax_scale * log2(e) folded into one constant; the saved
    lse converts to the log2 domain with a cheap (rows, 1) multiply.
  - interior blocks (fully below the causal diagonal, fully in-bounds)
    take a mask-free fast path.
  - each tile is processed as independent sub-chains whose leading dots
    (QK^T and dO V^T — themselves mutually independent) are all issued
    before any elementwise math, overlapping VPU and MXU work.
  - the trailing *scale on dS distributes over the block sum, so it is
    applied once to the fp32 accumulator at finalize instead of per tile.
  - causal-skipped grid steps redirect their DMA to the next block that
    will actually run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels import prng
from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.kernels.common import (
    NUM_LANES,
    block_mask_predicates,
    classify_segment_block,
    window_band_mask,
)

LOG2E = 1.4426950408889634
# dq carry threshold: use the VMEM scratch while (sq_pad, d) fp32 fits,
# else the input/output-aliased streaming mode (tests shrink this to
# exercise the aliased path on small shapes).
DQ_SCRATCH_BYTES = 4 * 1024 * 1024


def _chain_mask(
    shape, row0, col0, *, sk, bounds_possible, causal, has_segments,
    qpos, kpos, qseg, kseg, rows_sl, window_left=None, window_right=None,
    window_cell=None, num_sinks: int = 0,
):
    """Mask for one (bqs, bk) sub-chain tile at global offset (row0, col0).

    Uses full-tile iotas — measured faster on v5e than broadcasting
    (bqs, 1) vs (1, bk) vector compares (the dropout hash, by contrast,
    is separable and does use vectors; see prng.hash_coords)."""
    windowed = window_left is not None or window_right is not None
    mask = jnp.ones(shape, jnp.bool_)
    if bounds_possible:
        cols_t = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
        mask = cols_t < sk
    if has_segments:
        qs = qseg[rows_sl][:, None]
        ks = kseg[None, :]
        mask = mask & (qs == ks) & (ks >= 0) & (qs >= 0)
        if causal or windowed:
            qp = qpos[rows_sl][:, None]
            kp = kpos[None, :]
            if causal:
                mask = mask & (qp >= kp)
            if window_left is not None:
                mask = mask & (kp >= qp - window_left)
            if window_right is not None:
                mask = mask & (kp <= qp + window_right)
    elif causal or windowed:
        rows_t = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
        cols_t = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
        if causal:
            mask = mask & (rows_t >= cols_t)
        band = window_band_mask(
            rows_t, cols_t, window_left=window_left,
            window_right=window_right, window_cell=window_cell,
            num_sinks=num_sinks,
        )
        if band is not None:
            mask = mask & band
    return mask


def _fused_kernel(
    *refs,
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
    chains: int,
    dq_alias: bool,
    window_left: int | None,
    window_right: int | None,
    has_alibi: bool = False,
    softcap: float | None = None,
    window_cell: tuple[int, int] | None = None,
    num_sinks: int = 0,
):
    """Single-pass backward: grid (b, h, ik, iq), K/V-stationary.

    Computes QK^T and dO V^T once per tile (5 dots total vs 7 for the
    round-1 two-kernel split). dK/dV accumulate in their own VMEM-resident
    output blocks across the inner q loop. The dQ carry has two modes:

      - ``dq_alias=False`` (sq_pad*d fp32 fits VMEM, sq <= 8K at d=128):
        a full-sequence fp32 VMEM scratch, written once at the end.
      - ``dq_alias=True`` (long sequences): dq streams through an
        input/output-aliased fp32 (block_q, d) block — each grid step
        reads the running total for its q block from HBM, adds this
        tile's contribution, and writes it back (the RMW overlaps the 5
        dots in the pipeline). Replaces the round-1 split path that
        recomputed QK^T / dO V^T (7 dots).
    """
    idx = 0
    if p_drop > 0.0:
        seed_ref = refs[idx]
        idx += 1
    if has_alibi:
        alibi_ref = refs[idx]  # (b, h) SMEM slope table (pre /scale)
        idx += 1
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = refs[idx : idx + 6]
    idx += 6
    if has_segments:
        qpos_ref, kpos_ref, qseg_ref, kseg_ref = refs[idx : idx + 4]
        idx += 4
    if dq_alias:
        dqin_ref = refs[idx]
        idx += 1
        dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs[idx : idx + 5]
        dq_acc = None
    else:
        dq_ref, dk_ref, dv_ref, dq_acc, dk_acc, dv_acc = refs[idx : idx + 6]

    ik = pl.program_id(2)
    iq = pl.program_id(3)
    bh = pl.program_id(0) * num_heads + pl.program_id(1)
    if has_alibi:
        # Read at kernel top level (the CPU interpreter does not
        # substitute program_id inside pl.when branches / closures).
        alibi_slope = alibi_ref[pl.program_id(0), pl.program_id(1)]
    bounds_possible = sk != sk_pad
    bqs = block_q // chains

    if dq_alias:
        # Running total in -> out every step (skipped causal steps too:
        # the output buffer must hold the block's current value when the
        # pipeline writes it back).
        dq_ref[0, 0] = dqin_ref[0, 0]
    else:
        @pl.when((ik == 0) & (iq == 0))
        def _init_dq():
            dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(iq == 0)
    def _init_dkv():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def _compute(masked: bool):
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        c = jnp.float32(scale * LOG2E)
        lse_col = lse_ref[0, 0]  # (block_q, 1) packed column
        di_full = di_ref[0, 0]

        ss, dps = [], []
        for j in range(chains):
            sl = slice(j * bqs, (j + 1) * bqs)
            qj = q_ref[0, 0, sl, :]
            doj = do_ref[0, 0, sl, :]
            ss.append(jax.lax.dot_general(
                qj, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            dps.append(jax.lax.dot_general(
                doj, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))

        for j in range(chains):
            sl = slice(j * bqs, (j + 1) * bqs)
            row0 = iq * block_q + j * bqs
            s, dp = ss[j], dps[j]
            lse2 = lse_col[sl] * jnp.float32(LOG2E)  # (bqs, 1)
            di_col = di_full[sl]

            cap_gate = None
            if softcap is not None:
                # Same soft-capping transform as the forward (pre-scale
                # units: s' = (cap/scale) * tanh(s * scale/cap), applied
                # before the ALiBi bias) so the recomputed p matches.
                # Chain rule through the cap: d(capped)/d(u) =
                # 1 - tanh^2(u/cap) = 1 - (s' * scale/cap)^2 — saved here
                # (from the PRE-bias capped score) and multiplied into ds
                # below.
                t1 = jnp.float32(scale / softcap)
                s = jnp.tanh(s * t1) * jnp.float32(softcap / scale)
                cap_gate = 1.0 - jnp.square(s * t1)

            if has_alibi:
                # Same ALiBi bias as the forward (slope pre-divided by
                # scale; top-left/global-index distances, or position
                # vectors with segments) so the recomputed p matches
                # exactly. The bias is independent of q/k, so every
                # gradient formula below is unchanged.
                slope = alibi_slope
                if has_segments:
                    qp_a = qpos_ref[0][sl][:, None]
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

            rows = cols = None
            if p_drop > 0.0:
                # (bqs, 1) / (1, bk) index vectors for the separable
                # dropout hash (prng.hash_coords).
                rows = (jax.lax.broadcasted_iota(jnp.int32, (bqs, 1), 0)
                        + row0)
                cols = (jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                        + ik * block_k)

            p = jnp.exp2(s * c - lse2)
            if masked:
                mask = _chain_mask(
                    (bqs, block_k), row0, ik * block_k,
                    sk=sk, bounds_possible=bounds_possible,
                    causal=causal, has_segments=has_segments,
                    qpos=qpos_ref[0] if has_segments else None,
                    kpos=kpos_ref[0] if has_segments else None,
                    qseg=qseg_ref[0] if has_segments else None,
                    kseg=kseg_ref[0] if has_segments else None,
                    rows_sl=sl,
                    window_left=window_left,
                    window_right=window_right,
                    window_cell=window_cell,
                    num_sinks=num_sinks,
                )
                p = jnp.where(mask, p, 0.0)

            doj = do_ref[0, 0, sl, :]
            if p_drop > 0.0:
                keep = prng.keep_mask(
                    seed_ref[0, 0],
                    bh.astype(jnp.uint32),
                    rows.astype(jnp.uint32),
                    cols.astype(jnp.uint32),
                    p_drop,
                )
                rp = jnp.float32(1.0 / (1.0 - p_drop))
                p_dropped = jnp.where(keep, p, 0.0) * rp
                dp = jnp.where(keep, dp, 0.0) * rp
            else:
                p_dropped = p

            dv_acc[...] += jax.lax.dot_general(
                p_dropped.astype(doj.dtype), doj,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - di_col)  # unscaled; *scale applied at finalize
            if cap_gate is not None:
                ds = ds * cap_gate
            qj = q_ref[0, 0, sl, :]
            dk_acc[...] += jax.lax.dot_general(
                ds.astype(qj.dtype), qj,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_contrib = jax.lax.dot_general(
                ds.astype(k.dtype), k,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if dq_alias:
                # Local rows of this q block; *scale folded in here since
                # there is no final pass over dq in aliased mode.
                dq_ref[0, 0, sl, :] += dq_contrib * jnp.float32(scale)
            else:
                dq_acc[pl.ds(row0, bqs)] += dq_contrib

    if has_segments:
        # Position-aware runtime block classification (see flash_fwd.py):
        # skip blocks where every pair is causally masked (fully-future
        # ring shards), run uniform fully-past same-segment blocks on the
        # mask-free fast path, full mask otherwise.
        live, uniform = classify_segment_block(
            qpos_ref[0], kpos_ref[0], qseg_ref[0], kseg_ref[0],
            causal=causal, bounds_possible=bounds_possible,
            window_left=window_left, window_right=window_right,
        )
        pl.when(live & uniform)(lambda: _compute(masked=False))
        pl.when(live & jnp.logical_not(uniform))(
            lambda: _compute(masked=True)
        )
    else:
        # Same band/diagonal algebra as the forward — literally: the
        # shared helper in kernels/common.py keeps fwd and bwd masking
        # provably in sync.
        needs_mask, should_run, have_mask, have_skip = (
            block_mask_predicates(
                iq, ik, block_q=block_q, block_k=block_k,
                num_k_blocks=num_k_blocks, causal=causal,
                bounds_possible=bounds_possible,
                window_left=window_left, window_right=window_right,
                window_cell=window_cell, num_sinks=num_sinks,
            )
        )
        if have_skip:
            pl.when(should_run & needs_mask)(lambda: _compute(masked=True))
            pl.when(should_run & jnp.logical_not(needs_mask))(
                lambda: _compute(masked=False))
        elif have_mask:
            pl.when(needs_mask)(lambda: _compute(masked=True))
            pl.when(jnp.logical_not(needs_mask))(
                lambda: _compute(masked=False))
        else:
            # No mask component exists statically: single fast path.
            _compute(masked=False)

    @pl.when(iq == num_q_blocks - 1)
    def _finalize_dkv():
        dk_ref[0, 0] = (dk_acc[...] * jnp.float32(scale)).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)

    if not dq_alias:
        @pl.when((ik == num_k_blocks - 1) & (iq == num_q_blocks - 1))
        def _finalize_dq():
            dq_ref[0, 0] = (
                dq_acc[...] * jnp.float32(scale)
            ).astype(dq_ref.dtype)


def _seq_specs(bq, bk, d, *, kv_major: bool, causal: bool, group: int = 1):
    """BlockSpecs for (q, k, v, do, lse, di) given grid (b, h, X, Y) where
    (X, Y) = (ik, iq) if kv_major else (iq, ik). ``group`` maps query head
    h to kv head h // group (GQA/MQA).

    With causal masking, skipped grid steps redirect their DMA to the next
    block that will actually run (flash_fwd.py's prefetch-redirect trick;
    for the kv-major dKV grid the skipped q blocks are at the *start* of
    the row, so they redirect forward to the first running q block).
    """
    if kv_major:
        if causal:
            def qi(b_, h_, x, y):
                run = (y + 1) * bq - 1 >= x * bk
                first_running = (x * bk) // bq
                return (b_, h_, jax.lax.select(run, y, first_running), 0)
        else:
            def qi(b_, h_, x, y):
                return (b_, h_, y, 0)
        ki = lambda b_, h_, x, y: (b_, h_ // group, x, 0)  # noqa: E731
        qv = lambda b_, h_, x, y: (b_, y)  # noqa: E731
        kv = lambda b_, h_, x, y: (b_, x)  # noqa: E731
    else:
        qi = lambda b_, h_, x, y: (b_, h_, x, 0)  # noqa: E731
        if causal:
            def ki(b_, h_, x, y):
                run = (x + 1) * bq - 1 >= y * bk
                return (b_, h_ // group, jax.lax.select(run, y, 0), 0)
        else:
            def ki(b_, h_, x, y):
                return (b_, h_ // group, y, 0)
        qv = lambda b_, h_, x, y: (b_, x)  # noqa: E731
        kv = lambda b_, h_, x, y: (b_, y)  # noqa: E731
    tensor = [
        pl.BlockSpec((1, 1, bq, d), qi, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, 1, bk, d), ki, memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, 1, bk, d), ki, memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((1, 1, bq, d), qi, memory_space=pltpu.VMEM),  # do
        # lse / di arrive packed as (b, h, sq, 1) columns.
        pl.BlockSpec((1, 1, bq, 1), qi, memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, 1, bq, 1), qi, memory_space=pltpu.VMEM),  # di
    ]
    seg = [
        pl.BlockSpec((1, bq), qv, memory_space=pltpu.VMEM),  # q_pos
        pl.BlockSpec((1, bk), kv, memory_space=pltpu.VMEM),  # kv_pos
        pl.BlockSpec((1, bq), qv, memory_space=pltpu.VMEM),  # q_seg
        pl.BlockSpec((1, bk), kv, memory_space=pltpu.VMEM),  # kv_seg
    ]
    return tensor, seg


def _pick_chains(requested: int, bq: int) -> int:
    """Largest chain count <= requested with sub height >= 256 (bwd dots
    have 2x the streams of fwd, so smaller sub-blocks fragment the MXU),
    a multiple of 128."""
    chains = max(1, min(requested, bq // 256))
    while bq % (chains * 128) != 0:
        chains -= 1
    return chains


def flash_attention_bwd(
    q: jax.Array,  # (b, h, sq_pad, d_pad)
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    dout: jax.Array,
    lse: jax.Array,  # (b, h, sq_pad) fp32 packed (reference layout)
    q_positions: jax.Array | None,
    kv_positions: jax.Array | None,
    q_segment_ids: jax.Array | None,
    kv_segment_ids: jax.Array | None,
    dropout_seed: jax.Array | None,
    *,
    sq: int,
    sk: int,
    causal: bool,
    softmax_scale: float,
    dropout_p: float = 0.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool = False,
    dlse: jax.Array | None = None,  # (b, h, sq_pad) fp32 lse cotangent
    window_left: int | None = None,
    window_right: int | None = None,
    alibi: jax.Array | None = None,  # (b, h) fp32, pre-divided by scale
    softcap: float | None = None,
    window_cell: tuple[int, int] | None = None,
    num_sinks: int = 0,
):
    """Returns (dq, dk, dv) on the padded layout.

    ``dlse``: optional cotangent of the forward's logsumexp output. Since
    the kernel's dS uses the *pre-dropout* softmax P (ds = p*(dp - di)),
    the exact extra term d(lse)/d(s) * g = g * p folds into the di
    correction as di - g — no kernel change needed. Covers
    differentiating through ``flash_attention(..., return_lse=True)``.

    GQA/MQA: k/v may have fewer heads than q; dk/dv are computed per
    *query* head by the kernels (kv blocks read via h // group index
    maps) and group-summed in fp32 here, returning kv-head shapes.
    """
    b, h, sq_pad, d = q.shape
    sk_pad = k.shape[2]
    h_kv = k.shape[1]
    assert h % h_kv == 0, (h, h_kv)
    group = h // h_kv

    def _group_sum(dkv_per_qhead, like):
        if group == 1:
            return dkv_per_qhead
        summed = dkv_per_qhead.astype(jnp.float32).reshape(
            b, h_kv, group, sk_pad, d
        ).sum(axis=2)
        return summed.astype(like.dtype)
    if block_sizes is None:
        block_sizes = BlockSizes.choose(seq_len_q=sq, seq_len_k=sk, head_dim=d)
    has_segments = q_segment_ids is not None
    p_drop = float(dropout_p)
    windowed = window_left is not None or window_right is not None
    if window_cell is not None or num_sinks > 0:
        assert not has_segments, "window_cell/num_sinks require no segments"
        assert windowed, "window_cell/num_sinks require a window"

    # di = rowsum(dout * out): the softmax_d correction. Cheap fused XLA
    # op; both di and lse are carried PACKED as (b, h, sq, 1) columns —
    # contiguous (b, h, sq) fp32 in memory, 128x less HBM traffic than the
    # old lane-replicated (b, h, sq, 128) layout.
    di = jnp.sum(
        out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1
    )[..., None]  # (b, h, sq_pad, 1)
    if dlse is not None:
        di = di - dlse.astype(jnp.float32).reshape(b, h, sq_pad, 1)
    lse = lse.astype(jnp.float32).reshape(b, h, sq_pad, 1)

    seed_args = []
    seed_specs = []
    if p_drop > 0.0:
        assert dropout_seed is not None
        seed_specs = [
            pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)
        ]
        seed_args = [dropout_seed.reshape(1, 1).astype(jnp.uint32)]
    has_alibi = alibi is not None
    if has_alibi:
        # Whole (b, h) slope table in SMEM (see flash_fwd.py: a (1, 1)
        # block over (b, h) fails Mosaic's block-shape check on hardware).
        seed_specs = seed_specs + [
            pl.BlockSpec(
                alibi.shape, lambda *_: (0, 0), memory_space=pltpu.SMEM
            )
        ]
        seed_args = seed_args + [alibi.astype(jnp.float32)]

    seg_args = []
    if has_segments:
        seg_args = [
            q_positions.astype(jnp.int32),
            kv_positions.astype(jnp.int32),
            q_segment_ids.astype(jnp.int32),
            kv_segment_ids.astype(jnp.int32),
        ]

    # ---- fused single-pass kernel (5 dots per tile) ----
    # dq carry: VMEM scratch when (sq_pad, d) fp32 fits (~sq <= 8K at
    # d=128), else streamed through an input/output-aliased fp32 block
    # (long-context training; replaces the round-1 7-dot split path).
    # Interpret mode: the interpreter's input_output_aliases are donation-
    # only (input reads never see prior grid steps' writes), and its
    # "VMEM" scratch is unbounded numpy — so the aliased streaming mode is
    # compiled-only. On-device equivalence vs the scratch mode is checked
    # once per round by benchmarks/determinism_check.py.
    dq_alias = (not interpret) and sq_pad * d * 4 > DQ_SCRATCH_BYTES
    bq = min(block_sizes.block_q_dkv, sq_pad)
    bk = min(block_sizes.block_k_dkv, sk_pad)
    assert sq_pad % bq == 0 and sk_pad % bk == 0
    nq, nk = sq_pad // bq, sk_pad // bk
    tensor_specs, seg_specs = _seq_specs(
        bq, bk, d, kv_major=True, causal=causal and not has_segments,
        group=group)
    kv_out_spec = pl.BlockSpec(
        (1, 1, bk, d), lambda b_, h_, x, y: (b_, h_, x, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = seed_specs + tensor_specs + (
        seg_specs if has_segments else [])
    args = [*seed_args, q, k, v, dout, lse, di, *seg_args]
    aliases = {}
    if dq_alias:
        # Skipped causal steps redirect the dq RMW to block 0 (an identity
        # read-copy-write there is idempotent and its index can never
        # repeat an adjacent ACTIVE step's: iq=0 is only active at ik=0,
        # where no steps are skipped). Redirecting to first_running — the
        # q spec's choice — is UNSAFE here: at a row transition it can
        # equal the previous step's index, Pallas elides the dqin refetch,
        # and the stale copy clobbers that block's fresh accumulation.
        # With a sliding window that safety argument breaks (iq=0 can be
        # band-dead at ik=0 with more steps skipped in the same row), so
        # windowed launches use the identity map: every step RMWs its own
        # block (skipped steps do an idempotent copy).
        if causal and not has_segments and not windowed:
            def dq_index(b_, h_, x, y):
                run = (y + 1) * bq - 1 >= x * bk
                return (b_, h_, jax.lax.select(run, y, 0), 0)
        else:
            def dq_index(b_, h_, x, y):
                return (b_, h_, y, 0)
        dq_in = jnp.zeros(q.shape, jnp.float32)
        dq_in_spec = pl.BlockSpec(
            (1, 1, bq, d), dq_index, memory_space=pltpu.VMEM)
        in_specs = in_specs + [dq_in_spec]
        aliases = {len(args): 0}
        args.append(dq_in)
        dq_out_spec = dq_in_spec
        dq_out_shape = jax.ShapeDtypeStruct(q.shape, jnp.float32)
        scratch = [
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ]
    else:
        dq_out_spec = pl.BlockSpec(
            (1, 1, sq_pad, d), lambda b_, h_, x, y: (b_, h_, 0, 0),
            memory_space=pltpu.VMEM,
        )
        dq_out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
        scratch = [
            pltpu.VMEM((sq_pad, d), jnp.float32),  # dq carry
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ]
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            sk=sk,
            sk_pad=sk_pad,
            block_q=bq,
            block_k=bk,
            num_q_blocks=nq,
            num_k_blocks=nk,
            causal=causal,
            has_segments=has_segments,
            scale=float(softmax_scale),
            p_drop=p_drop,
            num_heads=h,
            chains=_pick_chains(block_sizes.q_chains, bq),
            dq_alias=dq_alias,
            window_left=window_left,
            window_right=window_right,
            has_alibi=has_alibi,
            softcap=None if softcap is None else float(softcap),
            window_cell=window_cell,
            num_sinks=num_sinks,
        ),
        grid=(b, h, nk, nq),
        in_specs=in_specs,
        out_specs=[dq_out_spec, kv_out_spec, kv_out_spec],
        out_shape=[
            dq_out_shape,
            jax.ShapeDtypeStruct((b, h, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk_pad, d), v.dtype),
        ],
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    if dq_alias:
        dq = dq.astype(q.dtype)
    return dq, _group_sum(dk, k), _group_sum(dv, v)
