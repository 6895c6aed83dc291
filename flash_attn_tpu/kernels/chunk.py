"""Multi-token paged attention: a chunk of queries vs the paged KV cache.

The serving-side generalization of kernels/decode.py from one query token
to ``sq`` tokens per sequence — the compute core of chunked prefill (long
prompts processed in cache-resident chunks) and speculative-decoding
verification (score k draft tokens in one dispatch). This is the
TPU-native analog of the CUDA package's ``flash_attn_with_kvcache``
entry point (the reference snapshot predates it; the contract is defined
by the upstream interface: q of length >= 1 attends a cache of
``cache_seqlens`` tokens with causal alignment at the sequence tail).

Layout (mirrors decode.py):
  q:        (batch, sq, n_q_heads, d) — the chunk, already rotary'd etc.
  k_pages:  (n_kv_heads, num_pages, page_size, d)   bf16 / int8 / fp8
  k_scales: (n_kv_heads, num_pages, 1, page_size) fp32, or None
  lengths:  (batch,) int32 — total valid tokens INCLUDING the chunk
  chunk_lens: (batch,) int32 — valid chunk rows (<= sq; rest padding)
  page_tbl: (batch, pages_per_seq_max) int32

Query row t of sequence b sits at global position
``lengths[b] - chunk_lens[b] + t`` (the chunk is the tail of the cached
sequence; its K/V must already be written — serving/kvcache.py pairs the
write with this compute). Causality is always enforced against that
position; masking, ALiBi, softcap and the sliding window follow
ops/attention semantics.

Grid (batch, head_slice, kv_block): one step covers ``pages_per_block``
pages for ``heads_per_slice`` kv heads and all chunk rows at once —
scores are one (hps * group * sq, block) tile, so the MXU sees wide
batched dots instead of sq separate decode dispatches. The head axis is
a GRID dimension, not an in-kernel loop: Mosaic does NOT reuse stack
slots across an unrolled Python loop, so slicing inside the kernel left
every slice's score/exp temporaries co-resident (measured 16.9 MB stack
at 12 heads x 512-token chunks even with 1-head slices — the round-4
serving OOM); as a grid axis each step holds ONE slice's temporaries and
the inter-step pipeline hides the per-slice page refetch. Dead key
blocks (beyond the sequence, or below the window band of every chunk
row) redirect their page fetch and skip compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels import int8 as int8_qk
from flash_attn_tpu.kernels.common import (
    DEFAULT_MASK_VALUE,
    default_interpret,
    dequant_cast,
    paged_block_live,
    paged_block_softmax,
    paged_visibility_mask,
)


def _chunk_kernel(
    page_tbl_ref,  # scalar prefetch (batch, pages_max)
    lengths_ref,  # scalar prefetch (batch,)
    chunk_lens_ref,  # scalar prefetch (batch,)
    *refs,
    page_size: int,
    num_blocks: int,
    pages_per_block: int,
    quantized: bool,
    scale: float,
    group: int,
    n_kv_heads: int,
    sq: int,
    window_left: int | None,
    has_alibi: bool,
    softcap: float | None,
    compute_dtype=jnp.float32,
    qk_int8: bool = False,
    heads_per_slice: int | None = None,
):
    ppb = pages_per_block
    hps = heads_per_slice
    idx = 0
    q_ref = refs[idx]  # (1, hps, group*sq, d) — this slice's q
    idx += 1
    if qk_int8:
        qscale_ref = refs[idx]  # (1, hps, gq, 1) fp32 per-row q scales
        idx += 1
    if has_alibi:
        alibi_ref = refs[idx]  # (hps*gq, 1) fp32 per-ROW slopes
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
    j = pl.program_id(2)
    length = lengths_ref[b]
    chunk_len = chunk_lens_ref[b]
    gq = group * sq
    bk = ppb * page_size
    first_qpos = length - chunk_len  # global position of chunk row 0

    # Block liveness: some key column must be (a) inside the sequence and
    # (b) causally visible from some chunk row, i.e. <= the LAST row's
    # position (= length - 1), and (c) inside some row's window band —
    # the weakest (loosest) lower bound across rows is the FIRST row's:
    # pos >= first_qpos - left (the last row's band starts later, so
    # using it would skip blocks early rows still need). Shared algebra:
    # kernels/common.py paged_block_live (the `09ce7a7` bug class).
    live = paged_block_live(
        j, bk, length=length, window_left=window_left,
        first_band_pos=first_qpos - (window_left or 0),
    )

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rows_s = hps * gq

    @pl.when(live)
    def _compute():
        # compute_dtype: bf16 dots (fp32 accumulation) ride the MXU's
        # native rate — fp32 matmuls run ~1/8 peak on v5e, and chunked
        # prefill is dot-bound (unlike single-token decode). int8 page
        # payloads cast to bf16 exactly (|x| <= 127 fits the mantissa);
        # fp32 callers (tests) keep exact fp32 dots.
        k_all = jnp.concatenate([r[:, 0] for r in k_refs], axis=1)
        v_all = jnp.concatenate([r[:, 0] for r in v_refs], axis=1)
        if quantized:
            ks_all = jnp.concatenate([r[:, 0] for r in ks_refs], axis=-1)
            vs_all = jnp.concatenate([r[:, 0] for r in vs_refs], axis=-1)

        # Row r = (slice_head * group + g) * sq + t: chunk row index t
        # and its global query position. Head-independent.
        t_row = (
            jax.lax.broadcasted_iota(jnp.int32, (rows_s, bk), 0) % sq
        )
        qpos = first_qpos + t_row
        pos = jax.lax.broadcasted_iota(jnp.int32, (rows_s, bk), 1) + j * bk
        rel = (pos - qpos).astype(jnp.float32) if has_alibi else None
        # Shared visibility algebra (kernels/common.py) with the chunk's
        # extra padding-row kill (t_row >= chunk_len rows see nothing).
        mask = paged_visibility_mask(
            pos, qpos, length=length, window_left=window_left,
        ) & (t_row < chunk_len)

        if qk_int8:
            # int8 x int8 -> int32 QK^T on the MXU's 2x-rate int8
            # mode: the cache payload is ALREADY int8 (its per-token
            # scales are applied below via the existing `quantized`
            # branch); q was quantized per token by the launcher.
            q = q_ref[0]  # (hps, gq, d) int8
            k = k_all
        else:
            q = q_ref[0].astype(compute_dtype)  # (hps, gq, d)
            k = dequant_cast(k_all, compute_dtype)  # (hps, bk, d)
        # Batched over the slice's kv heads: (hps, gq, d) x (hps, bk, d)
        # -> (hps, gq, bk) — every chunk row and group member in one dot.
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=(
                jnp.int32 if qk_int8 else jnp.float32
            ),
        )
        s = s.astype(jnp.float32) * jnp.float32(scale)
        if qk_int8:
            s = s * qscale_ref[0]  # (hps, gq, 1) broadcasts
        if quantized:
            s = s * ks_all.reshape(hps, 1, bk)
        s = s.reshape(rows_s, bk)
        # Shared softcap/alibi/mask/online-softmax (kernels/common.py).
        p, alpha, m_next, l_next = paged_block_softmax(
            s, mask, m_ref[...], l_ref[...], softcap=softcap,
            alibi_col=alibi_ref[...] if has_alibi else None, rel=rel,
        )
        l_ref[...] = l_next
        m_ref[...] = m_next

        v = dequant_cast(v_all, compute_dtype)  # (hps, bk, d)
        if quantized:
            p = (
                p.reshape(hps, gq, bk)
                * vs_all.reshape(hps, 1, bk)
            ).reshape(rows_s, bk)
        pv = jax.lax.dot_general(
            p.reshape(hps, gq, bk).astype(compute_dtype), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (hps, gq, d)
        acc_ref[...] = acc_ref[...] * alpha + pv.reshape(rows_s, -1)

    @pl.when(j == num_blocks - 1)
    def _finalize():
        l = l_ref[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (
            (acc_ref[...] * l_inv)
            .reshape(hps, gq, -1)
            .astype(o_ref.dtype)
        )


def paged_chunk_attention(
    q: jax.Array,  # (batch, sq, n_q_heads, d)
    k_pages: jax.Array,  # (n_kv_heads, num_pages, page_size, d)
    v_pages: jax.Array,
    lengths: jax.Array,  # (batch,) TOTAL length incl. the chunk
    page_table: jax.Array,  # (batch, pages_per_seq_max)
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    *,
    chunk_lens: jax.Array | None = None,  # (batch,) valid rows, default sq
    softmax_scale: float | None = None,
    interpret: bool | None = None,
    window_left: int | None = None,
    alibi_slopes: jax.Array | None = None,
    softcap: float | None = None,
    qk_quant: str | None = None,
    heads_per_slice: int | None = None,
) -> jax.Array:
    """Chunk-of-queries decode against a paged (optionally quantized) KV
    cache. Returns (batch, sq, n_q_heads, d).

    Query row t of sequence b attends causally from global position
    ``lengths[b] - chunk_lens[b] + t``; the chunk's own K/V must already
    be in the cache (see serving/kvcache.py ``flash_attn_with_kvcache``
    for the fused write+attend wrapper). Rows t >= chunk_lens[b] are
    padding: their output is zero.

    ``window_left`` / ``alibi_slopes`` / ``softcap`` follow
    ops.attention semantics (positions are global cache positions).

    ``qk_quant="int8"`` (requires an int8-quantized cache): q is
    symmetrically quantized per token here and QK^T runs as an
    int8 x int8 -> int32 MXU dot against the cache payload directly —
    the 2x-rate path for dot-bound chunked prefill. The cache's own
    per-token k scales dequantize the scores as usual; softmax and PV
    stay full precision.
    """
    batch, sq, n_q_heads, d = q.shape
    n_kv_heads, num_pages, page_size, dk = k_pages.shape
    assert dk == d and v_pages.shape == k_pages.shape
    if n_q_heads % n_kv_heads != 0:
        raise ValueError(
            f"q heads {n_q_heads} not a multiple of kv heads {n_kv_heads}"
        )
    group = n_q_heads // n_kv_heads
    if softmax_scale is None:
        softmax_scale = d**-0.5
    if interpret is None:
        interpret = default_interpret()
    quantized = k_scales is not None
    if quantized:
        assert v_scales is not None
    if window_left is not None and window_left < 0:
        raise ValueError(f"window_left must be >= 0, got {window_left}")
    if softcap is not None and softcap <= 0.0:
        raise ValueError(f"softcap must be > 0, got {softcap}")
    softcap = None if softcap is None else float(softcap)
    if chunk_lens is None:
        chunk_lens = jnp.full((batch,), sq, jnp.int32)

    alibi = None
    if alibi_slopes is not None:
        alibi = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi.shape != (n_q_heads,):
            raise ValueError(
                f"alibi_slopes must have shape ({n_q_heads},); "
                f"got {alibi.shape}"
            )
    if qk_quant not in (None, "int8"):
        raise ValueError(f"qk_quant must be None or 'int8', got {qk_quant!r}")
    qk_int8 = qk_quant == "int8"
    if qk_int8 and (not quantized or k_pages.dtype != jnp.int8):
        raise ValueError(
            "qk_quant='int8' requires an int8-quantized KV cache "
            "(k_scales/v_scales and int8 pages) — the kernel dots q "
            f"against the cache payload directly; got {k_pages.dtype} "
            "pages"
        )

    # Pad the chunk rows to a sublane multiple (padded rows are masked by
    # t_row < chunk_len; chunk_lens <= sq always).
    sq_pad = max(8, -(-sq // 8) * 8)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0), (0, 0)))
    # (b, sq_pad, hq, d) -> (b, n_kv, group, sq_pad, d) -> (b, n_kv, gq, d)
    q4 = (
        jnp.transpose(q, (0, 2, 1, 3))
        .reshape(batch, n_kv_heads, group, sq_pad, d)
        .reshape(batch, n_kv_heads, group * sq_pad, d)
    )
    q_qscale = None
    if qk_int8:
        # Experimental int8 QK^T prep (kernels/int8.py; demoted, INT8.md).
        q4, q_qscale = int8_qk.quantize_q_rows(q4)

    pages_max = page_table.shape[1]
    # Keep the score tile (rows x bk) modest: rows grows with the chunk.
    rows = n_kv_heads * group * sq_pad
    gq_pad = group * sq_pad
    ppb_cap = 8 if gq_pad * 512 * 4 <= 2 * 1024 * 1024 else 4
    pages_per_block = min(ppb_cap, pages_max)
    # Scoped-VMEM bound: one grid step materializes a (hps*gq, bk) fp32
    # score tile plus ~4 exp/mask temporaries of the same shape; cap a
    # slice at ~2 MB so the stack stays well under the 16 MB limit. The
    # head axis is a GRID dim — an in-kernel unrolled slice loop does
    # NOT bound the stack (Mosaic keeps every unrolled slice's
    # temporaries co-resident: measured 16.9 MB at 12x1-head slices).
    slice_budget = 2 * 1024 * 1024
    if heads_per_slice is not None:
        if heads_per_slice < 1 or n_kv_heads % heads_per_slice != 0:
            raise ValueError(
                f"heads_per_slice must divide n_kv_heads={n_kv_heads}; "
                f"got {heads_per_slice}"
            )
    else:
        heads_per_slice = 1
        for cand in range(n_kv_heads, 0, -1):
            bk_hint = pages_per_block * page_size
            if (n_kv_heads % cand == 0
                    and cand * gq_pad * bk_hint * 4 <= slice_budget):
                heads_per_slice = cand
                break
        # Even a single head can blow the budget at large group*chunk
        # (e.g. group=8, sq=512 -> 16 MB score tile at bk=1024): shrink
        # the kv block instead of compiling toward a Mosaic VMEM OOM.
        while (pages_per_block > 1
               and gq_pad * pages_per_block * page_size * 4 > slice_budget):
            pages_per_block //= 2
        if gq_pad * pages_per_block * page_size * 4 > 4 * slice_budget:
            # ~4 live (rows, bk) temporaries per slice; past this the
            # kernel cannot fit the 16 MB VMEM stack at any tiling we
            # can reach from here.
            raise ValueError(
                "chunk too large for the paged-attention kernel: one "
                f"head slice needs {gq_pad * pages_per_block * page_size * 4} "
                f"bytes of score tile (group={group}, chunk={sq}, "
                f"page_size={page_size}); reduce the prefill chunk size "
                "or the page size"
            )
    hps = heads_per_slice
    n_slices = n_kv_heads // hps
    if pages_max % pages_per_block != 0:
        pad = pages_per_block - pages_max % pages_per_block
        page_table = jnp.pad(page_table, [(0, 0), (0, pad)])
        pages_max = pages_max + pad
    num_blocks = pages_max // pages_per_block

    def page_map_i(i):
        def m(b_, hs, j, tbl, ln, cl):
            # Dead trailing blocks redirect the fetch to the last live
            # block (reads only; adjacent equal indices elide the DMA).
            last_live = jnp.maximum(ln[b_] - 1, 0) // (
                pages_per_block * page_size
            )
            jj = jnp.minimum(j, last_live)
            if window_left is not None:
                # First (earliest) chunk row's band floor — the loosest
                # bound across rows (must match the kernel's liveness).
                lo_blk = jnp.maximum(
                    ln[b_] - cl[b_] - window_left, 0
                ) // (pages_per_block * page_size)
                jj = jnp.maximum(jj, jnp.minimum(lo_blk, last_live))
            return (hs, tbl[b_, jj * pages_per_block + i], 0, 0)
        return m

    page_specs = [
        pl.BlockSpec(
            (hps, 1, page_size, d), page_map_i(i),
            memory_space=pltpu.VMEM,
        )
        for i in range(pages_per_block)
    ]
    scale_specs = [
        pl.BlockSpec(
            (hps, 1, 1, page_size), page_map_i(i),
            memory_space=pltpu.VMEM,
        )
        for i in range(pages_per_block)
    ]

    gq = group * sq_pad
    in_specs = [
        pl.BlockSpec(
            (1, hps, gq, d),
            lambda b_, hs, j, tbl, ln, cl: (b_, hs, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [q4]
    if qk_int8:
        in_specs.append(pl.BlockSpec(
            (1, hps, gq, 1),
            lambda b_, hs, j, tbl, ln, cl: (b_, hs, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(q_qscale)
    if alibi is not None:
        # Per-row slopes: row (kvh*group + g)*sq_pad + t -> q head
        # kvh*group + g, i.e. each head's slope replicated sq_pad times.
        in_specs.append(pl.BlockSpec(
            (hps * gq, 1), lambda b_, hs, j, tbl, ln, cl: (hs, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(jnp.repeat(alibi, sq_pad).reshape(rows, 1))
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

    out = pl.pallas_call(
        functools.partial(
            _chunk_kernel,
            page_size=page_size,
            num_blocks=num_blocks,
            pages_per_block=pages_per_block,
            quantized=quantized,
            scale=float(softmax_scale),
            group=group,
            n_kv_heads=n_kv_heads,
            sq=sq_pad,
            window_left=window_left,
            has_alibi=alibi is not None,
            softcap=softcap,
            compute_dtype=(
                jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
            ),
            qk_int8=qk_int8,
            heads_per_slice=heads_per_slice,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, n_slices, num_blocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, hps, gq, d),
                lambda b_, hs, j, tbl, ln, cl: (b_, hs, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                # Per-slice carries, reused across the sequential
                # (b, hs) grid steps (re-inited at every j == 0).
                pltpu.VMEM((hps * gq, 1), jnp.float32),  # m
                pltpu.VMEM((hps * gq, 1), jnp.float32),  # l
                pltpu.VMEM((hps * gq, d), jnp.float32),  # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, n_kv_heads, gq, d), q.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        page_table.astype(jnp.int32),
        lengths.astype(jnp.int32),
        chunk_lens.astype(jnp.int32),
        *args,
    )
    # (b, n_kv, group*sq_pad, d) -> (b, sq, hq, d)
    out = out.reshape(batch, n_kv_heads, group, sq_pad, d)
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(
        batch, sq_pad, n_q_heads, d
    )
    return out[:, :sq]
