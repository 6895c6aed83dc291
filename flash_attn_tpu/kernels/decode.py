"""Paged decode attention with optional quantized (int8 / fp8) KV pages.

Serving-path kernel (north star, BASELINE.json): one query token per
sequence attends to a paged KV cache scattered across HBM.

Layout:
  q:        (batch, n_kv_heads, group, d)   group = n_q_heads / n_kv_heads
  k_pages:  (n_kv_heads, num_pages, page_size, d)   bf16 / int8 / fp8
  k_scales: (n_kv_heads, num_pages, 1, page_size) fp32, or None
  lengths:  (batch,) int32 — valid tokens per sequence
  page_tbl: (batch, pages_per_seq_max) int32 physical page ids

Compiled path (TPU): grid **(batch, kv_block)** where one grid step covers
``pages_per_block`` pages for ALL kv heads; the KV arrays stay in HBM and
the kernel issues its own per-page async copies into a double-buffered
VMEM block — the copies for block j+1 start before block j's compute, so
page gathering overlaps the math (decode is bandwidth/overhead-bound;
per-page BlockSpec pipelining costs a grid step per page plus per-input
bookkeeping). The scattered pages land contiguously in the VMEM block, so
compute sees one wide (h, block, d) tile. Scores for every (head,
group-row) are carried as one (n_kv_heads * group, lanes) online-softmax
state. Dequant scales are applied to the SCORES (q.k^T * s_k) and to the
P@V accumulation (row-scaled P), so the int8/fp8 payload feeds the MXU
directly.

Interpret path (CPU tests): the same math with per-page data-dependent
BlockSpec index maps (the interpreter does not model DMA overlap anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels.common import (
    DEFAULT_MASK_VALUE,
    NUM_LANES,
    default_interpret,
    dequant_cast,
    paged_block_live,
    paged_block_softmax,
    paged_visibility_mask,
)


def _decode_kernel(
    page_tbl_ref,  # scalar prefetch (batch, pages_max)
    lengths_ref,  # scalar prefetch (batch,)
    *refs,
    page_size: int,
    num_blocks: int,
    pages_per_block: int,
    quantized: bool,
    scale: float,
    group: int,
    n_kv_heads: int,
    window_left: int | None,
    num_sinks: int,
    has_alibi: bool = False,
    softcap: float | None = None,
):
    ppb = pages_per_block
    idx = 0
    q_ref = refs[idx]
    idx += 1
    if has_alibi:
        alibi_ref = refs[idx]  # (hg, 1) fp32 per-q-head slopes
        idx += 1
    k_refs = refs[idx : idx + ppb]
    idx += ppb
    if quantized:
        ks_refs = refs[idx : idx + ppb]
        idx += ppb
    v_refs = refs[idx : idx + ppb]
    idx += ppb
    if quantized:
        vs_refs = refs[idx : idx + ppb]
        idx += ppb
    o_ref, m_ref, l_ref, acc_ref = refs[idx : idx + 4]

    b = pl.program_id(0)
    j = pl.program_id(1)
    length = lengths_ref[b]
    hg = n_kv_heads * group
    bk = ppb * page_size  # kv block width per grid step

    # Sliding window (rolling-KV decode): the single query sits at
    # position length-1, so visible keys are pos >= length-1-window_left,
    # plus the first num_sinks positions (StreamingLLM attention sinks).
    # Blocks entirely outside both regions are skipped (shared liveness
    # algebra: kernels/common.py paged_block_live).
    live = paged_block_live(
        j, bk, length=length, window_left=window_left,
        first_band_pos=length - 1 - (window_left or 0),
        num_sinks=num_sinks,
    )

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(live)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # (h, group, d)
        # Concatenate the ppb pages into one (h, bk, d) tile: a single wide
        # dot instead of ppb narrow ones (long contexts are otherwise
        # grid-step-overhead-bound at one page per step). fp8 payloads
        # decode via the integer fast path (common.dequant_cast).
        k = dequant_cast(
            jnp.concatenate([r[:, 0] for r in k_refs], axis=1), jnp.float32
        )
        # Batched over kv heads: (h, g, d) x (h, bk, d) -> (h, g, bk).
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)
        if quantized:
            # column-scale the scores by the per-token k scales
            ks = jnp.concatenate([r[:, 0] for r in ks_refs], axis=-1)
            s = s * ks.reshape(n_kv_heads, 1, bk)  # broadcasts over group
        s = s.reshape(hg, bk)
        # Shared per-block mask/softcap/alibi/online-softmax algebra
        # (kernels/common.py): the single query sits at position
        # length-1, so qpos is scalar; rel = kpos - qpos feeds ALiBi.
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (hg, bk), 1) + j * bk
        )
        mask = paged_visibility_mask(
            pos, length - 1, length=length, window_left=window_left,
            num_sinks=num_sinks,
        )
        p, alpha, m_next, l_next = paged_block_softmax(
            s, mask, m_ref[...], l_ref[...], softcap=softcap,
            alibi_col=alibi_ref[...] if has_alibi else None,
            rel=(pos - (length - 1)).astype(jnp.float32)
            if has_alibi else None,
        )
        l_ref[...] = l_next
        m_ref[...] = m_next

        v = dequant_cast(
            jnp.concatenate([r[:, 0] for r in v_refs], axis=1), jnp.float32
        )  # (h, bk, d)
        if quantized:
            # fold v row scales into p: (h, 1, bk) over (h, g, bk)
            vs = jnp.concatenate([r[:, 0] for r in vs_refs], axis=-1)
            p = (
                p.reshape(n_kv_heads, group, bk)
                * vs.reshape(n_kv_heads, 1, bk)
            ).reshape(hg, bk)
        # (h, g, bk) x (h, bk, d) -> (h, g, d)
        pv = jax.lax.dot_general(
            p.reshape(n_kv_heads, group, bk), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha[:, 0:1] + pv.reshape(hg, -1)

    @pl.when(j == num_blocks - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (
            (acc_ref[...] * l_inv)
            .reshape(n_kv_heads, group, -1)
            .astype(o_ref.dtype)
        )


def _decode_dma_kernel(
    page_tbl_ref,  # scalar prefetch (batch, pages_max)
    lengths_ref,  # scalar prefetch (batch,)
    *refs,
    page_size: int,
    num_blocks: int,
    ppb: int,
    quantized: bool,
    scale: float,
    group: int,
    n_kv_heads: int,
    window_left: int | None,
    num_sinks: int,
    has_alibi: bool = False,
    softcap: float | None = None,
):
    idx = 0
    q_ref = refs[idx]
    idx += 1
    if has_alibi:
        alibi_ref = refs[idx]  # (hg, 1) fp32 per-q-head slopes
        idx += 1
    k_hbm, v_hbm = refs[idx : idx + 2]
    idx += 2
    if quantized:
        ks_hbm, vs_hbm = refs[idx : idx + 2]
        idx += 2
    o_ref = refs[idx]
    idx += 1
    m_ref, l_ref, acc_ref, kbuf, vbuf = refs[idx : idx + 5]
    idx += 5
    if quantized:
        ksbuf, vsbuf = refs[idx : idx + 2]
        idx += 2
    sems = refs[idx]

    b = pl.program_id(0)
    j = pl.program_id(1)
    length = lengths_ref[b]
    hg = n_kv_heads * group
    bk = ppb * page_size

    # Sliding window: skip blocks entirely below pos = length-1-window_left
    # (see _decode_kernel), except blocks holding the first num_sinks
    # positions (attention sinks). Live blocks are [0, sink_blocks) u
    # [jlo, ...); the double-buffered prefetch chain hops the dead middle.
    # Buffer slots alternate on the LIVE-block ordinal, not on j — the j
    # parity would collide across the sink->band jump when both ends land
    # on the same parity, clobbering the buffer compute is reading.
    win_lo = None
    jlo = jnp.int32(0)
    sink_blocks = -(-num_sinks // bk) if num_sinks > 0 else 0  # static
    live = paged_block_live(
        j, bk, length=length, window_left=window_left,
        first_band_pos=length - 1 - (window_left or 0),
        num_sinks=num_sinks,
    )
    if window_left is not None:
        win_lo = length - 1 - window_left
        jlo = jnp.maximum(win_lo, 0) // bk

    def live_ordinal(blk):
        """Index of ``blk`` in the live-block sequence (valid for live
        blocks; dead-middle blocks never call this)."""
        if window_left is None:
            return blk
        skipped = jnp.maximum(jlo - sink_blocks, 0)
        return jnp.where(blk >= jlo, blk - skipped, blk)

    def next_live(blk):
        """First live block after ``blk`` (ignoring the length bound)."""
        if window_left is None:
            return blk + 1
        nxt_live = (blk + 2) * bk > win_lo  # blk+1 inside the band
        if sink_blocks > 0:
            nxt_live = nxt_live | (blk + 1 < sink_blocks)
        return jnp.where(nxt_live, blk + 1, jnp.maximum(jlo, blk + 1))

    def block_copies(slot, blk):
        """Descriptors gathering block ``blk``'s pages into buffer ``slot``.
        Scattered HBM pages land contiguously in the VMEM block."""
        descs = []
        for i in range(ppb):
            pid = page_tbl_ref[b, blk * ppb + i]
            sl = pl.ds(i * page_size, page_size)
            descs.append(pltpu.make_async_copy(
                k_hbm.at[:, pid], kbuf.at[slot, :, sl, :], sems.at[0, slot, i]
            ))
            descs.append(pltpu.make_async_copy(
                v_hbm.at[:, pid], vbuf.at[slot, :, sl, :], sems.at[1, slot, i]
            ))
            if quantized:
                descs.append(pltpu.make_async_copy(
                    ks_hbm.at[:, pid], ksbuf.at[slot, :, :, sl],
                    sems.at[2, slot, i],
                ))
                descs.append(pltpu.make_async_copy(
                    vs_hbm.at[:, pid], vsbuf.at[slot, :, :, sl],
                    sems.at[3, slot, i],
                ))
        return descs

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # Mirror _compute's guard: a batch element with length <= 0 never
        # waits on these copies, and un-awaited semaphore increments would
        # leak into the next batch element's waits (its compute could then
        # read kbuf/vbuf before its own copy lands). The first live block
        # is 0 with sinks, else jlo; its live ordinal is 0 either way.
        @pl.when(length > 0)
        def _():
            first = jnp.int32(0) if sink_blocks > 0 else jlo
            for c in block_copies(0, first):
                c.start()

    @pl.when(live)
    def _compute():
        ordinal = live_ordinal(j)
        slot = jax.lax.rem(ordinal, 2)
        # Prefetch the next LIVE block while this one computes (hops the
        # dead middle between the sink blocks and the band).
        nxt = next_live(j)

        @pl.when(nxt * bk < length)
        def _():
            for c in block_copies(jax.lax.rem(ordinal + 1, 2), nxt):
                c.start()

        for c in block_copies(slot, j):
            c.wait()

        # Dequant/compute in bf16 (payloads are <= 8 bits of mantissa
        # anyway); accumulation stays fp32 via preferred_element_type.
        q = q_ref[0].astype(jnp.bfloat16)  # (h, group, d)
        k = dequant_cast(kbuf[slot])  # (h, bk, d) bf16
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)
        if quantized:
            s = s * ksbuf[slot]  # (h, 1, bk) broadcasts over group
        s = s.reshape(hg, bk)
        # Shared mask/softcap/alibi/online-softmax (kernels/common.py).
        pos = jax.lax.broadcasted_iota(jnp.int32, (hg, bk), 1) + j * bk
        mask = paged_visibility_mask(
            pos, length - 1, length=length, window_left=window_left,
            num_sinks=num_sinks,
        )
        p, alpha, m_next, l_next = paged_block_softmax(
            s, mask, m_ref[...], l_ref[...], softcap=softcap,
            alibi_col=alibi_ref[...] if has_alibi else None,
            rel=(pos - (length - 1)).astype(jnp.float32)
            if has_alibi else None,
        )
        l_ref[...] = l_next
        m_ref[...] = m_next

        v = dequant_cast(vbuf[slot])  # (h, bk, d) bf16
        if quantized:
            p = (
                p.reshape(n_kv_heads, group, bk) * vsbuf[slot]
            ).reshape(hg, bk)
        pv = jax.lax.dot_general(
            p.reshape(n_kv_heads, group, bk).astype(jnp.bfloat16), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha[:, 0:1] + pv.reshape(hg, -1)

    @pl.when(j == num_blocks - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (
            (acc_ref[...] * l_inv)
            .reshape(n_kv_heads, group, -1)
            .astype(o_ref.dtype)
        )


def _paged_decode_dma(
    q4, k_pages, v_pages, lengths, page_table, k_scales, v_scales,
    *, softmax_scale, interpret, window_left=None, num_sinks=0,
    alibi=None, softcap=None,
):
    batch, n_kv_heads, group, d = q4.shape
    _, num_pages, page_size, _ = k_pages.shape
    pages_max = page_table.shape[1]
    quantized = k_scales is not None

    # Pages per compute block: wide enough to amortize per-step and
    # per-descriptor work, bounded by a VMEM budget covering the
    # double-buffered payload plus the bf16 dequant transients
    # ((2*itemsize + 2) bytes per element per k/v).
    budget = 10 * 1024 * 1024
    per_page = (
        2 * n_kv_heads * page_size * d
        * (2 * k_pages.dtype.itemsize + 2)
    )
    ppb = max(1, min(8, pages_max, budget // per_page))
    # Keep the budget-derived ppb and pad the page table up to a multiple
    # (padded slots fetch page 0; masked out by pos >= length) — shrinking
    # ppb to a divisor would degrade prime pages_per_seq to 1 page/step.
    if pages_max % ppb != 0:
        pad = ppb - pages_max % ppb
        page_table = jnp.pad(page_table, [(0, 0), (0, pad)])
        pages_max += pad
    num_blocks = pages_max // ppb
    bk = ppb * page_size
    hg = n_kv_heads * group

    in_specs = [
        pl.BlockSpec(
            (1, n_kv_heads, group, d), lambda b_, j, tbl, ln: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [q4]
    if alibi is not None:
        in_specs.append(pl.BlockSpec(
            (hg, 1), lambda b_, j, tbl, ln: (0, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(alibi.reshape(hg, 1).astype(jnp.float32))
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.ANY),  # k_pages stay in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args += [k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        args += [k_scales.astype(jnp.float32), v_scales.astype(jnp.float32)]

    scratch = [
        pltpu.VMEM((hg, NUM_LANES), jnp.float32),  # m
        pltpu.VMEM((hg, NUM_LANES), jnp.float32),  # l
        pltpu.VMEM((hg, d), jnp.float32),  # acc
        pltpu.VMEM((2, n_kv_heads, bk, d), k_pages.dtype),  # kbuf
        pltpu.VMEM((2, n_kv_heads, bk, d), v_pages.dtype),  # vbuf
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((2, n_kv_heads, 1, bk), jnp.float32),
            pltpu.VMEM((2, n_kv_heads, 1, bk), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((4 if quantized else 2, 2, ppb)))

    out = pl.pallas_call(
        functools.partial(
            _decode_dma_kernel,
            page_size=page_size,
            num_blocks=num_blocks,
            ppb=ppb,
            quantized=quantized,
            scale=float(softmax_scale),
            group=group,
            n_kv_heads=n_kv_heads,
            window_left=window_left,
            num_sinks=num_sinks,
            has_alibi=alibi is not None,
            softcap=softcap,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, num_blocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, n_kv_heads, group, d), lambda b_, j, tbl, ln: (b_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(q4.shape, q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), *args)
    return out


def paged_decode_attention(
    q: jax.Array,  # (batch, n_q_heads, d)
    k_pages: jax.Array,  # (n_kv_heads, num_pages, page_size, d)
    v_pages: jax.Array,
    lengths: jax.Array,  # (batch,) int32
    page_table: jax.Array,  # (batch, pages_per_seq_max) int32
    *,
    k_scales: jax.Array | None = None,  # (n_kv_heads, num_pages, 1, page_size)
    v_scales: jax.Array | None = None,
    softmax_scale: float | None = None,
    interpret: bool | None = None,
    window_left: int | None = None,
    num_sinks: int = 0,
    alibi_slopes: jax.Array | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """Single-token decode against a paged (optionally quantized) KV cache.

    Returns (batch, n_q_heads, d) in the q dtype. GQA/MQA: n_q_heads must be
    a multiple of n_kv_heads; each kv head serves its query group.

    ``window_left``: sliding-window (rolling-KV) decode — the query at
    position length-1 attends only keys at pos >= length-1-window_left.
    Pages entirely below the band are never fetched or computed, so decode
    cost is O(window), not O(context).

    ``num_sinks``: StreamingLLM-style attention sinks — with a window, the
    first num_sinks positions stay visible in addition to the band (the
    softmax anchor that keeps long-rolling generation stable). Only the
    sink pages and the band pages are fetched; the dead middle is skipped.
    Ignored without ``window_left`` (full attention already covers them).

    ``alibi_slopes``: (n_q_heads,) fp32 ALiBi slopes — bias
    -slope * (q_pos - key_pos) with the query at position length-1
    (serving path for ALiBi models; matches ops.attention's training
    semantics).

    ``softcap``: logit soft-capping ``cap * tanh(s / cap)`` on the scaled
    scores, before bias/masking (serving path for Gemma-2-style models;
    matches ops.attention's training semantics).
    """
    batch, n_q_heads, d = q.shape
    n_kv_heads, num_pages, page_size, dk = k_pages.shape
    assert dk == d and n_q_heads % n_kv_heads == 0
    group = n_q_heads // n_kv_heads
    pages_max = page_table.shape[1]
    quantized = k_scales is not None
    if quantized:
        assert v_scales is not None
    if softmax_scale is None:
        softmax_scale = d**-0.5
    if interpret is None:
        interpret = default_interpret()

    q4 = q.reshape(batch, n_kv_heads, group, d)

    # The manual-DMA path needs 128-lane-aligned page slices; head dims
    # below 128 use the BlockSpec pipeline instead.
    if window_left is not None and window_left < 0:
        raise ValueError(f"window_left must be >= 0, got {window_left}")
    if num_sinks < 0:
        raise ValueError(f"num_sinks must be >= 0, got {num_sinks}")
    num_sinks = int(num_sinks) if window_left is not None else 0
    alibi = None
    if alibi_slopes is not None:
        alibi = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi.shape != (n_q_heads,):
            raise ValueError(
                f"alibi_slopes must have shape ({n_q_heads},); "
                f"got {alibi.shape}"
            )
    if softcap is not None and softcap <= 0.0:
        raise ValueError(f"softcap must be > 0, got {softcap}")
    softcap = None if softcap is None else float(softcap)
    if not interpret and d % 128 == 0:
        out = _paged_decode_dma(
            q4, k_pages, v_pages, lengths, page_table, k_scales, v_scales,
            softmax_scale=softmax_scale, interpret=False,
            window_left=window_left, num_sinks=num_sinks, alibi=alibi,
            softcap=softcap,
        )
        return out.reshape(batch, n_q_heads, d)

    # One grid step = ``pages_per_block`` pages across ALL kv heads: the
    # page arrays are passed once per sub-page with offset index maps and
    # concatenated in-kernel, so long contexts are not grid-step-overhead
    # bound. Pad the table so pages_per_block divides it (extra slots point
    # at page 0; masked out by position >= length). Quantized runs carry
    # twice the inputs (payload + scales, each double-buffered): halve the
    # block to stay inside VMEM.
    pages_per_block = min(4 if quantized else 8, pages_max)
    if pages_max % pages_per_block != 0:
        pad = pages_per_block - pages_max % pages_per_block
        page_table = jnp.pad(page_table, [(0, 0), (0, pad)])
        pages_max = pages_max + pad
    num_blocks = pages_max // pages_per_block

    sink_blocks = (
        -(-num_sinks // (pages_per_block * page_size)) if num_sinks else 0
    )

    def page_map_i(i):
        def m(b_, j, tbl, ln):
            jj = j
            if window_left is not None:
                # Band-dead blocks are never computed: clamp their page
                # fetch up to the first live block (reads only; adjacent
                # equal indices let the pipeline elide the refetch).
                # Sink blocks (j < sink_blocks) fetch their own pages.
                lo_blk = jnp.maximum(ln[b_] - 1 - window_left, 0) // (
                    pages_per_block * page_size
                )
                jj = jnp.maximum(j, lo_blk)
                if sink_blocks > 0:
                    jj = jnp.where(j < sink_blocks, j, jj)
            return (0, tbl[b_, jj * pages_per_block + i], 0, 0)
        return m

    page_specs = [
        pl.BlockSpec(
            (n_kv_heads, 1, page_size, d), page_map_i(i),
            memory_space=pltpu.VMEM,
        )
        for i in range(pages_per_block)
    ]
    scale_specs = [
        pl.BlockSpec(
            (n_kv_heads, 1, 1, page_size), page_map_i(i),
            memory_space=pltpu.VMEM,
        )
        for i in range(pages_per_block)
    ]

    hg = n_kv_heads * group
    in_specs = [
        pl.BlockSpec(
            (1, n_kv_heads, group, d), lambda b_, j, tbl, ln: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [q4]
    if alibi is not None:
        in_specs.append(pl.BlockSpec(
            (hg, 1), lambda b_, j, tbl, ln: (0, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(alibi.reshape(hg, 1))
    in_specs += [*page_specs]
    args += [k_pages] * pages_per_block
    if quantized:
        in_specs += scale_specs
        args += [k_scales.astype(jnp.float32)] * pages_per_block
    in_specs += page_specs
    args += [v_pages] * pages_per_block
    if quantized:
        in_specs += scale_specs
        args += [v_scales.astype(jnp.float32)] * pages_per_block

    hg = n_kv_heads * group
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            page_size=page_size,
            num_blocks=num_blocks,
            pages_per_block=pages_per_block,
            quantized=quantized,
            scale=float(softmax_scale),
            group=group,
            n_kv_heads=n_kv_heads,
            window_left=window_left,
            num_sinks=num_sinks,
            has_alibi=alibi is not None,
            softcap=softcap,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, num_blocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, n_kv_heads, group, d), lambda b_, j, tbl, ln: (b_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((hg, NUM_LANES), jnp.float32),
                pltpu.VMEM((hg, NUM_LANES), jnp.float32),
                pltpu.VMEM((hg, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n_kv_heads, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), *args)
    return out.reshape(batch, n_q_heads, d)
