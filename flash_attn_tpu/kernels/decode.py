"""Paged decode attention with optional quantized (int8 / fp8) KV pages.

Serving-path kernel (north star, BASELINE.json): one query token per
sequence attends to a paged KV cache scattered across HBM. TPU-native
design: instead of hand-rolled multi-page DMA descriptors, the page table
is a scalar-prefetch operand and each page is fetched through a
data-dependent BlockSpec index_map — Pallas's pipeline machinery then
double-buffers page loads against compute automatically.

Layout:
  q:        (batch, n_kv_heads, group, d)   group = n_q_heads / n_kv_heads
  k_pages:  (n_kv_heads, num_pages, page_size, d)   bf16 / int8 / fp8
  k_scales: (n_kv_heads, num_pages, 1, page_size) fp32, or None
  lengths:  (batch,) int32 — valid tokens per sequence
  page_tbl: (batch, pages_per_seq_max) int32 physical page ids

Grid: **(batch, page)** — one grid step streams a page for *all* KV heads
at once (decode is bandwidth/overhead-bound: merging the head dimension
into the step cuts grid steps by n_kv_heads and makes each DMA
n_kv_heads * page_size * d wide). Scores for every (head, group-row) are
carried as one (n_kv_heads * group, lanes) online-softmax state. Dequant
scales are applied to the SCORES (q.k^T * s_k) and to the P@V accumulation
(row-scaled P), so the int8/fp8 payload feeds the MXU directly.
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
)


def _decode_kernel(
    page_tbl_ref,  # scalar prefetch (batch, pages_max)
    lengths_ref,  # scalar prefetch (batch,)
    *refs,
    page_size: int,
    pages_max: int,
    quantized: bool,
    scale: float,
    group: int,
    n_kv_heads: int,
):
    idx = 0
    q_ref = refs[idx]
    idx += 1
    k_ref = refs[idx]
    idx += 1
    if quantized:
        ks_ref = refs[idx]
        idx += 1
    v_ref = refs[idx]
    idx += 1
    if quantized:
        vs_ref = refs[idx]
        idx += 1
    o_ref, m_ref, l_ref, acc_ref = refs[idx : idx + 4]

    b = pl.program_id(0)
    j = pl.program_id(1)
    length = lengths_ref[b]
    hg = n_kv_heads * group

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j * page_size < length)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # (h, group, d)
        k = k_ref[:, 0].astype(jnp.float32)  # (h, page_size, d)
        # Batched over kv heads: (h, g, d) x (h, ps, d) -> (h, g, ps).
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)
        if quantized:
            # column-scale the scores by the per-token k scales
            s = s * ks_ref[:, 0]  # (h, 1, ps) broadcasts over group
        s = s.reshape(hg, page_size)
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (hg, page_size), 1)
            + j * page_size
        )
        mask = pos < length
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[...]  # (hg, NUM_LANES)
        l_prev = l_ref[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, 0:1])
        p = jnp.where(mask, p, 0.0)
        l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next

        v = v_ref[:, 0].astype(jnp.float32)  # (h, page_size, d)
        if quantized:
            # fold v row scales into p: (h, 1, ps) over (h, g, ps)
            p = (p.reshape(n_kv_heads, group, page_size) * vs_ref[:, 0]
                 ).reshape(hg, page_size)
        # (h, g, ps) x (h, ps, d) -> (h, g, d)
        pv = jax.lax.dot_general(
            p.reshape(n_kv_heads, group, page_size), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha[:, 0:1] + pv.reshape(hg, -1)

    @pl.when(j == pages_max - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (
            (acc_ref[...] * l_inv)
            .reshape(n_kv_heads, group, -1)
            .astype(o_ref.dtype)
        )


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
) -> jax.Array:
    """Single-token decode against a paged (optionally quantized) KV cache.

    Returns (batch, n_q_heads, d) in the q dtype. GQA/MQA: n_q_heads must be
    a multiple of n_kv_heads; each kv head serves its query group.
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

    # One grid step = one page across ALL kv heads.
    page_map = lambda b_, j, tbl, ln: (0, tbl[b_, j], 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec(
            (1, n_kv_heads, group, d), lambda b_, j, tbl, ln: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_kv_heads, 1, page_size, d), page_map, memory_space=pltpu.VMEM
        ),
    ]
    args = [q4, k_pages]
    if quantized:
        in_specs.append(
            pl.BlockSpec(
                (n_kv_heads, 1, 1, page_size), page_map,
                memory_space=pltpu.VMEM,
            )
        )
        args.append(k_scales.astype(jnp.float32))
    in_specs.append(
        pl.BlockSpec(
            (n_kv_heads, 1, page_size, d), page_map, memory_space=pltpu.VMEM
        )
    )
    args.append(v_pages)
    if quantized:
        in_specs.append(
            pl.BlockSpec(
                (n_kv_heads, 1, 1, page_size), page_map,
                memory_space=pltpu.VMEM,
            )
        )
        args.append(v_scales.astype(jnp.float32))

    hg = n_kv_heads * group
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            page_size=page_size,
            pages_max=pages_max,
            quantized=quantized,
            scale=float(softmax_scale),
            group=group,
            n_kv_heads=n_kv_heads,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, pages_max),
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
