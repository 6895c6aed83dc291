"""Paged KV cache: functional jit-friendly state + host-side page allocator.

The device state (``PagedKVCache``) is a pytree updated functionally inside
jit (prefill writes whole pages, decode appends one token); the
``PageAllocator`` is plain Python bookkeeping used by the serving engine to
assign physical pages to sequences (continuous batching).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels.common import default_interpret
from flash_attn_tpu.serving import quantization as qz


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Per-layer paged cache. payload dtype is bf16 or a quantized type."""

    k_pages: jax.Array  # (n_kv_heads, num_pages, page_size, d)
    v_pages: jax.Array
    k_scales: Optional[jax.Array]  # (n_kv_heads, num_pages, 1, page_size)
    v_scales: Optional[jax.Array]

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


def init_cache(
    n_kv_heads: int,
    num_pages: int,
    page_size: int,
    head_dim: int,
    *,
    dtype=jnp.bfloat16,
    quantization: str | None = None,
) -> PagedKVCache:
    shape = (n_kv_heads, num_pages, page_size, head_dim)
    if quantization is None:
        return PagedKVCache(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            k_scales=None,
            v_scales=None,
        )
    qdtype = qz.QUANT_DTYPE[quantization]
    sshape = (n_kv_heads, num_pages, 1, page_size)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, qdtype),
        v_pages=jnp.zeros(shape, qdtype),
        k_scales=jnp.ones(sshape, jnp.float32),
        v_scales=jnp.ones(sshape, jnp.float32),
    )


def _quant_method(cache: PagedKVCache) -> str | None:
    if not cache.quantized:
        return None
    return {
        jnp.int8.dtype: "int8",
        jnp.float8_e4m3fn.dtype: "fp8_e4m3",
        jnp.float8_e5m2.dtype: "fp8_e5m2",
    }[cache.k_pages.dtype]


def _quantize_token(x, method, payload_dtype):
    """x: (batch, h, d) -> (payload (batch, h, d), scale (batch, h) | None)."""
    if method is None:
        return x.astype(payload_dtype), None
    qmax = qz.QUANT_MAX[method]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax)  # (batch, h)
    payload = x.astype(jnp.float32) / scale[..., None]
    if method == "int8":
        payload = jnp.clip(jnp.round(payload), -127, 127)
    return payload.astype(payload_dtype), scale


def _append_kernel(
    page_ids_ref,  # scalar prefetch (batch,)
    slots_ref,  # scalar prefetch (batch,)
    newk_ref,  # (1, h, d) block
    newv_ref,
    kin_ref,  # (h, 1, ps, d) page block (aliased with kout)
    vin_ref,
    *refs,
    quantized: bool,
):
    idx = 0
    if quantized:
        newks_ref, newvs_ref, ksin_ref, vsin_ref = refs[idx : idx + 4]  # (h,batch),(h,batch),(h,1,1,ps)x2
        idx += 4
    if quantized:
        kout_ref, vout_ref, ksout_ref, vsout_ref = refs[idx : idx + 4]
    else:
        kout_ref, vout_ref = refs[idx : idx + 2]

    b = pl.program_id(0)
    slot = slots_ref[b]
    ps = kin_ref.shape[2]
    # Read-modify-write the page via a row select (dynamic sublane stores
    # are not expressible in Mosaic): outputs alias the cache buffers, so
    # only this block round-trips, everything else is untouched.
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps, 1), 2) == slot
    kout_ref[...] = jnp.where(
        row, jnp.swapaxes(newk_ref[...], 0, 1)[:, :, None, :], kin_ref[...]
    )
    vout_ref[...] = jnp.where(
        row, jnp.swapaxes(newv_ref[...], 0, 1)[:, :, None, :], vin_ref[...]
    )
    if quantized:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ps), 3) == slot
        # scales arrive (h, batch); extract column b by masked reduction
        # (neither dynamic lane slices nor lane->sublane relayouts of a
        # (h,) vector are expressible in Mosaic).
        bcol = jax.lax.broadcasted_iota(
            jnp.int32, (1, newks_ref.shape[1]), 1
        ) == b
        ks_col = jnp.sum(
            jnp.where(bcol, newks_ref[...], 0.0), axis=1, keepdims=True
        )  # (h, 1)
        vs_col = jnp.sum(
            jnp.where(bcol, newvs_ref[...], 0.0), axis=1, keepdims=True
        )
        ksout_ref[...] = jnp.where(
            lane, ks_col[:, :, None, None], ksin_ref[...]
        )
        vsout_ref[...] = jnp.where(
            lane, vs_col[:, :, None, None], vsin_ref[...]
        )


def append_token(
    cache: PagedKVCache,
    new_k: jax.Array,  # (batch, n_kv_heads, d)
    new_v: jax.Array,
    page_table: jax.Array,  # (batch, pages_max) int32
    lengths: jax.Array,  # (batch,) int32: current length BEFORE the append.
    #   A negative length marks an inactive slot: its write is redirected to
    #   reserved page 0 (scratch) so stale page-table rows can never corrupt
    #   pages that have been reassigned to other sequences.
) -> PagedKVCache:
    """Write one token per sequence at its next slot. Jit-friendly.

    In-place paged write via a Pallas kernel with input_output_aliases —
    both an XLA scatter and a dynamic_update_slice chain copy the whole
    multi-MB page buffer per decode step (~2-4 ms/layer measured on v5e);
    the kernel round-trips exactly one page per sequence.
    """
    batch, h, d = new_k.shape
    ps = cache.page_size
    method = _quant_method(cache)
    quantized = method is not None
    active = lengths >= 0
    safe_len = jnp.maximum(lengths, 0)
    page_pos = safe_len // ps  # (batch,)
    slot = jnp.where(active, safe_len % ps, 0)
    page_ids = jnp.take_along_axis(page_table, page_pos[:, None], axis=1)[:, 0]
    page_ids = jnp.where(active, page_ids, 0)  # reserved scratch page

    new_k_p, k_scale = _quantize_token(new_k, method, cache.k_pages.dtype)
    new_v_p, v_scale = _quantize_token(new_v, method, cache.v_pages.dtype)

    page_map = lambda b_, pids, slots: (0, pids[b_], 0, 0)  # noqa: E731
    tok_map = lambda b_, pids, slots: (b_, 0, 0)  # noqa: E731
    scale_map = lambda b_, pids, slots: (0, pids[b_], 0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((1, h, d), tok_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, d), tok_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1, ps, d), page_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1, ps, d), page_map, memory_space=pltpu.VMEM),
    ]
    args = [new_k_p, new_v_p, cache.k_pages, cache.v_pages]
    out_shapes = [
        jax.ShapeDtypeStruct(cache.k_pages.shape, cache.k_pages.dtype),
        jax.ShapeDtypeStruct(cache.v_pages.shape, cache.v_pages.dtype),
    ]
    out_specs = [
        pl.BlockSpec((h, 1, ps, d), page_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1, ps, d), page_map, memory_space=pltpu.VMEM),
    ]
    # args are (page_ids, slots, *tensor_args): tensor index 2/3 = k/v pages.
    aliases = {4: 0, 5: 1}
    if quantized:
        in_specs += [
            # Full (h, batch) block (pre-transposed; see kernel comment);
            # a (1, h) block would violate the (8, 128)-tile rule.
            pl.BlockSpec((h, batch), lambda b_, p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, batch), lambda b_, p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1, 1, ps), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1, 1, ps), scale_map, memory_space=pltpu.VMEM),
        ]
        args += [
            k_scale.T.astype(jnp.float32),  # (h, batch)
            v_scale.T.astype(jnp.float32),
            cache.k_scales,
            cache.v_scales,
        ]
        out_shapes += [
            jax.ShapeDtypeStruct(cache.k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(cache.v_scales.shape, jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((h, 1, 1, ps), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1, 1, ps), scale_map, memory_space=pltpu.VMEM),
        ]
        aliases = {4: 0, 5: 1, 8: 2, 9: 3}

    outs = pl.pallas_call(
        functools.partial(_append_kernel, quantized=quantized),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(),
    )(page_ids.astype(jnp.int32), slot.astype(jnp.int32), *args)

    if quantized:
        k_pages, v_pages, k_scales, v_scales = outs
        return PagedKVCache(k_pages, v_pages, k_scales, v_scales)
    k_pages, v_pages = outs
    return PagedKVCache(k_pages, v_pages, None, None)


def _append_span_kernel(
    page_ids_ref,  # scalar prefetch (batch, nspan)
    base_ref,  # scalar prefetch (batch,) page-aligned base slot
    len_ref,  # scalar prefetch (batch,) length BEFORE the append (>= 0)
    newlen_ref,  # scalar prefetch (batch,) tokens to write (0 = none)
    *refs,
    quantized: bool,
):
    """RMW one page per grid step, writing EVERY chunk token that lands
    in it at once (page-aligned staging is prepared by the launcher)."""
    idx = 0
    sk_ref, sv_ref = refs[idx : idx + 2]  # (1, 1, h, ps, d) staged tokens
    idx += 2
    if quantized:
        sks_ref, svs_ref = refs[idx : idx + 2]  # (1, 1, h, 1, ps)
        idx += 2
    kin_ref, vin_ref = refs[idx : idx + 2]  # (h, 1, ps, d) aliased pages
    idx += 2
    if quantized:
        ksin_ref, vsin_ref = refs[idx : idx + 2]
        idx += 2
    if quantized:
        kout_ref, vout_ref, ksout_ref, vsout_ref = refs[idx : idx + 4]
    else:
        kout_ref, vout_ref = refs[idx : idx + 2]

    b = pl.program_id(0)
    p = pl.program_id(1)
    ps = kin_ref.shape[2]
    lo = len_ref[b]
    hi = lo + newlen_ref[b]
    row_global = (
        base_ref[b] + p * ps
        + jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps, 1), 2)
    )
    rowmask = (row_global >= lo) & (row_global < hi)
    kout_ref[...] = jnp.where(
        rowmask, jnp.swapaxes(sk_ref[0], 0, 1), kin_ref[...]
    )
    vout_ref[...] = jnp.where(
        rowmask, jnp.swapaxes(sv_ref[0], 0, 1), vin_ref[...]
    )
    if quantized:
        lane_global = (
            base_ref[b] + p * ps
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ps), 3)
        )
        lanemask = (lane_global >= lo) & (lane_global < hi)
        ksout_ref[...] = jnp.where(
            lanemask, jnp.swapaxes(sks_ref[0], 0, 1), ksin_ref[...]
        )
        vsout_ref[...] = jnp.where(
            lanemask, jnp.swapaxes(svs_ref[0], 0, 1), vsin_ref[...]
        )


def append_span(
    cache: PagedKVCache,
    new_k: jax.Array,  # (batch, sq, n_kv_heads, d)
    new_v: jax.Array,
    page_table: jax.Array,  # (batch, pages_max) int32
    lengths: jax.Array,  # (batch,) length BEFORE the append; < 0 inactive
    new_lens: jax.Array | None = None,  # (batch,) valid rows (<= sq)
) -> PagedKVCache:
    """Append up to ``sq`` tokens per sequence in ONE dispatch: one page
    RMW per TOUCHED page (ceil(sq/page_size)+1 per sequence), not one
    per token — the multi-token generalization of ``append_token``.

    Token t of sequence b lands at slot ``lengths[b] + t`` for
    ``t < new_lens[b]``; inactive rows (length < 0) and padding rows
    write nothing (their page fetches redirect to the reserved scratch
    page 0). The launcher stages the chunk page-aligned with an XLA
    gather, so the kernel's RMW is a pure row-select."""
    batch, sq, h, d = new_k.shape
    ps = cache.page_size
    method = _quant_method(cache)
    quantized = method is not None
    if new_lens is None:
        new_lens = jnp.full((batch,), sq, jnp.int32)
    new_lens = new_lens.astype(jnp.int32)
    active = lengths >= 0
    safe_len = jnp.maximum(lengths, 0)
    eff_new = jnp.where(active, new_lens, 0)
    nspan = (sq - 1) // ps + 2  # worst-case pages a chunk can touch

    # Per-(b, span) physical page ids; spans holding no written slot
    # (and inactive rows) redirect to the reserved scratch page 0.
    page_pos = safe_len[:, None] // ps + jnp.arange(nspan)[None]  # (b, ns)
    span_start = page_pos * ps
    touched = (
        active[:, None]
        & (span_start < (safe_len + eff_new)[:, None])
        & (page_pos < page_table.shape[1])
    )
    page_ids = jnp.take_along_axis(
        page_table,
        jnp.clip(page_pos, 0, page_table.shape[1] - 1),
        axis=1,
    )
    page_ids = jnp.where(touched, page_ids, 0)

    # Quantize per token, then stage page-aligned: staged slot r of span
    # p holds chunk token t = base + p*ps + r - len (clipped gather; the
    # kernel's row mask ignores out-of-range rows).
    def quant(x):
        if method is None:
            return x.astype(cache.k_pages.dtype), None
        xt = jnp.swapaxes(x, 1, 2)  # (b, h, sq, d)
        payload, scales = qz.quantize_tokens(xt, method)
        # payload (b, h, sq, d) -> (b, sq, h, d); scales (b, h, 1, sq)
        return (
            jnp.swapaxes(payload, 1, 2).astype(cache.k_pages.dtype),
            scales,
        )

    k_p, k_s = quant(new_k)
    v_p, v_s = quant(new_v)
    base = (safe_len // ps) * ps  # (b,) page-aligned base slot

    t_idx = (
        base[:, None]
        + jnp.arange(nspan * ps, dtype=jnp.int32)[None]
        - safe_len[:, None]
    )  # (b, nspan*ps) chunk-token index per staged row
    t_clip = jnp.clip(t_idx, 0, sq - 1)

    def stage(x):  # (b, sq, h, d) -> (b, nspan, h, ps, d)
        g = jnp.take_along_axis(
            x, t_clip[:, :, None, None], axis=1
        )  # (b, nspan*ps, h, d)
        return jnp.transpose(
            g.reshape(batch, nspan, ps, h, d), (0, 1, 3, 2, 4)
        )

    def stage_scales(s):  # (b, h, 1, sq) -> (b, nspan, h, 1, ps)
        g = jnp.take_along_axis(
            s, t_clip[:, None, None, :], axis=3
        )  # (b, h, 1, nspan*ps)
        g = g.reshape(batch, h, 1, nspan, ps)
        return jnp.transpose(g, (0, 3, 1, 2, 4)).astype(jnp.float32)

    sk, sv = stage(k_p), stage(v_p)

    staged_map = lambda b_, p_, *s: (b_, p_, 0, 0, 0)  # noqa: E731
    page_map = lambda b_, p_, ids, *s: (0, ids[b_, p_], 0, 0)  # noqa: E731
    staged_spec = pl.BlockSpec(
        (1, 1, h, ps, d), staged_map, memory_space=pltpu.VMEM
    )
    sscale_spec = pl.BlockSpec(
        (1, 1, h, 1, ps), staged_map, memory_space=pltpu.VMEM
    )
    page_spec = pl.BlockSpec(
        (h, 1, ps, d), page_map, memory_space=pltpu.VMEM
    )
    pscale_spec = pl.BlockSpec(
        (h, 1, 1, ps), page_map, memory_space=pltpu.VMEM
    )

    in_specs = [staged_spec, staged_spec]
    args = [sk, sv]
    if quantized:
        in_specs += [sscale_spec, sscale_spec]
        args += [stage_scales(k_s), stage_scales(v_s)]
    in_specs += [page_spec, page_spec]
    args += [cache.k_pages, cache.v_pages]
    out_specs = [page_spec, page_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(cache.k_pages.shape, cache.k_pages.dtype),
        jax.ShapeDtypeStruct(cache.v_pages.shape, cache.v_pages.dtype),
    ]
    n_prefetch = 4
    kin_idx = len(args) - 2
    aliases = {n_prefetch + kin_idx: 0, n_prefetch + kin_idx + 1: 1}
    if quantized:
        in_specs += [pscale_spec, pscale_spec]
        args += [cache.k_scales, cache.v_scales]
        out_specs += [pscale_spec, pscale_spec]
        out_shapes += [
            jax.ShapeDtypeStruct(cache.k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(cache.v_scales.shape, jnp.float32),
        ]
        aliases[n_prefetch + kin_idx + 2] = 2
        aliases[n_prefetch + kin_idx + 3] = 3

    outs = pl.pallas_call(
        functools.partial(_append_span_kernel, quantized=quantized),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(batch, nspan),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=default_interpret(),
    )(
        page_ids.astype(jnp.int32),
        base.astype(jnp.int32),
        safe_len.astype(jnp.int32),
        eff_new.astype(jnp.int32),
        *args,
    )
    if quantized:
        return PagedKVCache(*outs)
    return PagedKVCache(outs[0], outs[1], None, None)


def _write_pages_kernel(
    page_ids_ref,  # scalar prefetch (n_pages,)
    *refs,
    quantized: bool,
):
    """Overwrite one cache page per grid step with the prepared payload.
    Outputs alias the cache buffers: only the touched pages move."""
    if quantized:
        newk, newv, ks_new, vs_new, _ki, _vi, _ksi, _vsi = refs[:8]
        kout, vout, ksout, vsout = refs[8:12]
        ksout[...] = ks_new[...]
        vsout[...] = vs_new[...]
    else:
        newk, newv, _ki, _vi = refs[:4]
        kout, vout = refs[4:6]
    kout[...] = newk[...]
    vout[...] = newv[...]


def write_prompt(
    cache: PagedKVCache,
    k: jax.Array,  # (prompt_len, n_kv_heads, d)
    v: jax.Array,
    page_ids: jax.Array,  # (ceil(prompt_len/page_size),) int32
) -> PagedKVCache:
    """Prefill: write a whole prompt's K/V into its assigned pages.

    Pallas kernel with input_output_aliases — the `.at[:, ids].set`
    scatter this replaces copies the WHOLE multi-MB page buffer per layer
    per admission (the exact pattern append_token avoids), multiplying
    TTFT under concurrent admission; here only the prompt's own pages
    round-trip."""
    ps = cache.page_size
    n_pages = page_ids.shape[0]
    total = n_pages * ps
    h, d = k.shape[1], k.shape[2]
    method = _quant_method(cache)
    quantized = method is not None

    def prep(x, payload_dtype):
        pad = total - x.shape[0]
        xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        # (total, h, d) -> (h, n_pages, ps, d)
        xp = jnp.transpose(xp, (1, 0, 2)).reshape(h, n_pages, ps, d)
        if method is None:
            return xp.astype(payload_dtype), None
        payload, scale = qz.quantize_pages(xp, method)
        return payload.astype(payload_dtype), scale

    k_new, ks_new = prep(k, cache.k_pages.dtype)
    v_new, vs_new = prep(v, cache.v_pages.dtype)

    src_map = lambda j, pids: (0, j, 0, 0)  # noqa: E731
    dst_map = lambda j, pids: (0, pids[j], 0, 0)  # noqa: E731
    page_spec_src = pl.BlockSpec((h, 1, ps, d), src_map,
                                 memory_space=pltpu.VMEM)
    page_spec_dst = pl.BlockSpec((h, 1, ps, d), dst_map,
                                 memory_space=pltpu.VMEM)
    scale_spec_src = pl.BlockSpec((h, 1, 1, ps), src_map,
                                  memory_space=pltpu.VMEM)
    scale_spec_dst = pl.BlockSpec((h, 1, 1, ps), dst_map,
                                  memory_space=pltpu.VMEM)

    in_specs = [page_spec_src, page_spec_src]
    args = [k_new, v_new]
    out_specs = [page_spec_dst, page_spec_dst]
    out_shapes = [
        jax.ShapeDtypeStruct(cache.k_pages.shape, cache.k_pages.dtype),
        jax.ShapeDtypeStruct(cache.v_pages.shape, cache.v_pages.dtype),
    ]
    if quantized:
        in_specs += [scale_spec_src, scale_spec_src]
        args += [ks_new, vs_new]
        out_specs += [scale_spec_dst, scale_spec_dst]
        out_shapes += [
            jax.ShapeDtypeStruct(cache.k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(cache.v_scales.shape, jnp.float32),
        ]
    # aliased cache inputs — never read by the kernel, so ANY memory
    # space skips the pointless HBM->VMEM fetch of pages that are about
    # to be fully overwritten (append_token, by contrast, genuinely
    # reads its page for the row-select RMW)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_in = len(args)
    in_specs += [any_spec, any_spec]
    args += [cache.k_pages, cache.v_pages]
    # +1: scalar-prefetch page_ids precedes tensor args in alias indexing
    aliases = {n_in + 1: 0, n_in + 2: 1}
    if quantized:
        in_specs += [any_spec, any_spec]
        args += [cache.k_scales, cache.v_scales]
        aliases[n_in + 3] = 2
        aliases[n_in + 4] = 3

    outs = pl.pallas_call(
        functools.partial(_write_pages_kernel, quantized=quantized),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pages,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(),
    )(page_ids.astype(jnp.int32), *args)
    if quantized:
        return PagedKVCache(*outs)
    return PagedKVCache(outs[0], outs[1], None, None)


class PageAllocator:
    """Host-side physical-page bookkeeping for continuous batching."""

    def __init__(self, num_pages: int, page_size: int, pages_per_seq: int,
                 reserved: int = 1):
        """``reserved`` low page ids are never handed out. Defaults to 1
        because ``append_token`` unconditionally redirects inactive-slot
        writes to page 0 as scratch — handing page 0 to a sequence would
        let those writes silently corrupt it."""
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        self.capacity = num_pages - reserved  # total allocatable pages
        self._free = list(range(num_pages - 1, reserved - 1, -1))
        self._owned: dict[int, list[int]] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def can_admit(self, prompt_len: int) -> bool:
        need = (prompt_len + self.page_size - 1) // self.page_size
        return len(self._free) >= need

    def alloc(self, seq_id: int, prompt_len: int) -> list[int]:
        need = (prompt_len + self.page_size - 1) // self.page_size
        if need > self.pages_per_seq:
            raise ValueError(
                f"prompt of {prompt_len} tokens exceeds pages_per_seq"
            )
        if len(self._free) < need:
            raise RuntimeError("out of KV-cache pages")
        pages = [self._free.pop() for _ in range(need)]
        self._owned[seq_id] = pages
        return pages

    def extend(self, seq_id: int, new_length: int) -> int | None:
        """Ensure capacity for new_length tokens; returns a newly assigned
        page id if one was needed."""
        pages = self._owned[seq_id]
        need = (new_length + self.page_size - 1) // self.page_size
        if need <= len(pages):
            return None
        if need > self.pages_per_seq:
            raise RuntimeError("sequence exceeded pages_per_seq")
        if not self._free:
            raise RuntimeError("out of KV-cache pages")
        page = self._free.pop()
        pages.append(page)
        return page

    def release(self, seq_id: int) -> None:
        self._free.extend(
            p for p in reversed(self._owned.pop(seq_id)) if p != 0
        )

    def release_range(self, seq_id: int, start_page: int,
                      end_page: int) -> int:
        """Free logical pages [start_page, end_page) of a LIVE sequence
        (streaming sliding-window serving: pages that fell out of the
        attention band forever). Freed slots keep a page-0 placeholder so
        logical indexing (extend / table_row) is unchanged; the decode
        kernel never computes on out-of-band positions — at worst a live
        block straddling the band edge fetches the placeholder page and
        masks it. Returns the number of pages actually freed (idempotent:
        already-freed slots are skipped; page 0 is reserved so the
        placeholder is unambiguous)."""
        pages = self._owned[seq_id]
        freed = 0
        for p in range(max(start_page, 0), min(end_page, len(pages))):
            if pages[p] != 0:
                self._free.append(pages[p])
                pages[p] = 0
                freed += 1
        return freed

    def table_row(self, seq_id: int) -> list[int]:
        pages = self._owned[seq_id]
        return pages + [0] * (self.pages_per_seq - len(pages))
