"""Dev micro-benchmarks: find where the fwd kernel's time goes.

Times (on the real chip):
  - pure-matmul kernel with the same grid/blocking (MXU + pipeline ceiling)
  - the real flash fwd kernel, causal and dense
  - block-size sweep

Usage: python benchmarks/bench_dev.py [sweep|parts]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

B, S, H, D = 4, 4096, 16, 128


def median_time(f, *args, iters=3, chain=8):
    def chained(n):
        @jax.jit
        def g(*a):
            a = list(a)
            for _ in range(n):
                a[0] = f(*a)
            return jnp.sum(a[0][..., :1, :1].astype(jnp.float32))

        return g

    g1, gN = chained(1), chained(chain + 1)
    np.asarray(g1(*args))
    np.asarray(gN(*args))
    ts = []
    for i in range(iters):
        a = list(args)
        a[0] = a[0] * (1.0 + 0.5 * i)
        t0 = time.perf_counter()
        np.asarray(g1(*a))
        t1 = time.perf_counter()
        np.asarray(gN(*a))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / chain)
    return max(sorted(ts)[len(ts) // 2], 1e-9)


def make_inputs():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    return q, k, v


def matmul_only_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, nk):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    pv = jax.lax.dot_general(
        s.astype(v_ref.dtype),
        v_ref[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += pv

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)


def run_matmul_only(q, k, v, bq, bk):
    nq, nk = S // bq, S // bk
    grid = (B, H, nq, nk)
    return pl.pallas_call(
        functools.partial(matmul_only_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, iq, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, iq, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def _split_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, nk, bq, bk, causal, scale, nsplit):
    """Prototype A: split the kv block into ``nsplit`` sub-blocks and
    interleave the dots so the MXU streams sub-block j+1 while the VPU
    runs softmax on sub-block j."""
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -3.0e38)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = jnp.float32(scale * 1.4426950408889634)
    bks = bk // nsplit

    def run():
        q = q_ref[0, 0]
        # Issue all QK^T dots up front; each is an independent MXU stream.
        ss = []
        for j in range(nsplit):
            kj = k_ref[0, 0, j * bks:(j + 1) * bks, :]
            ss.append(jax.lax.dot_general(
                q, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        for j in range(nsplit):
            s = ss[j]
            m_prev = m_ref[...]
            l_prev = l_ref[...]
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s * c - m_next[:, 0:1])
            l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[...] = m_next
            vj = v_ref[0, 0, j * bks:(j + 1) * bks, :]
            pv = jax.lax.dot_general(
                p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha[:, 0:1] + pv

    if causal:
        pl.when((iq + 1) * bq - 1 >= ik * bk)(run)
    else:
        run()

    @pl.when(ik == nk - 1)
    def _():
        l = l_ref[:, 0:1]
        o_ref[0, 0] = (
            acc_ref[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)
        ).astype(o_ref.dtype)


def run_split(q, k, v, bq, bk, causal, nsplit):
    S_ = q.shape[2]
    nq, nk = S_ // bq, S_ // bk
    if causal:
        def kv_index(b, h, iq, ik):
            run = (iq + 1) * bq - 1 >= ik * bk
            return (b, h, jax.lax.select(run, ik, 0), 0)
    else:
        def kv_index(b, h, iq, ik):
            return (b, h, ik, 0)
    return pl.pallas_call(
        functools.partial(_split_kernel, nk=nk, bq=bq, bk=bk, causal=causal,
                          scale=D ** -0.5, nsplit=nsplit),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S_, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def _split2_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, s_buf,
                   *, nk, bq, bk, causal, scale, nsplit):
    """Production candidate: interleaved sub-block dots + sub-block-level
    causal skip (scores staged through VMEM scratch) + diagonal-only
    masking."""
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -3.0e38)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = jnp.float32(scale * 1.4426950408889634)
    bks = bk // nsplit
    q_lo = iq * bq  # first q row of this block

    def sub_cols(j):
        return ik * bk + j * bks  # first col of sub-block j

    for j in range(nsplit):
        def dot_j(j=j):
            kj = k_ref[0, 0, j * bks:(j + 1) * bks, :]
            s_buf[j] = jax.lax.dot_general(
                q_ref[0, 0], kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        if causal:
            pl.when(q_lo + bq - 1 >= sub_cols(j))(dot_j)
        else:
            dot_j()

    for j in range(nsplit):
        def sm_j(masked, j=j):
            s = s_buf[j]
            if masked:
                rows = (jax.lax.broadcasted_iota(jnp.int32, (bq, bks), 0)
                        + q_lo)
                cols = (jax.lax.broadcasted_iota(jnp.int32, (bq, bks), 1)
                        + sub_cols(j))
                s = jnp.where(rows >= cols, s, -3.0e38)
            m_prev = m_ref[...]
            l_prev = l_ref[...]
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s * c - m_next[:, 0:1])
            l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[...] = m_next
            vj = v_ref[0, 0, j * bks:(j + 1) * bks, :]
            pv = jax.lax.dot_general(
                p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha[:, 0:1] + pv
        if causal:
            run_j = q_lo + bq - 1 >= sub_cols(j)
            diag_j = q_lo < sub_cols(j) + bks - 1
            pl.when(run_j & diag_j)(functools.partial(sm_j, True))
            pl.when(run_j & jnp.logical_not(diag_j))(
                functools.partial(sm_j, False))
        else:
            sm_j(False)

    @pl.when(ik == nk - 1)
    def _():
        l = l_ref[:, 0:1]
        o_ref[0, 0] = (
            acc_ref[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)
        ).astype(o_ref.dtype)


def run_split2(q, k, v, bq, bk, causal, nsplit):
    S_ = q.shape[2]
    nq, nk = S_ // bq, S_ // bk
    if causal:
        def kv_index(b, h, iq, ik):
            run = (iq + 1) * bq - 1 >= ik * bk
            return (b, h, jax.lax.select(run, ik, 0), 0)
    else:
        def kv_index(b, h, iq, ik):
            return (b, h, ik, 0)
    return pl.pallas_call(
        functools.partial(_split2_kernel, nk=nk, bq=bq, bk=bk, causal=causal,
                          scale=D ** -0.5, nsplit=nsplit),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S_, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((nsplit, bq, bk // nsplit), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def _varc_kernel(d0_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                 *, nk, bq, bk, causal, scale, nsplit):
    """Variant C: register-resident sub-k interleave; causal mask applied on
    every sub-block via a hoisted (rows - cols) iota-difference input
    (1 compare + 1 select per element)."""
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -3.0e38)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = jnp.float32(scale * 1.4426950408889634)
    bks = bk // nsplit

    def run():
        q = q_ref[0, 0]
        d0 = d0_ref[...] if causal else None  # (bq, bks) rows - cols
        ss = []
        for j in range(nsplit):
            kj = k_ref[0, 0, j * bks:(j + 1) * bks, :]
            ss.append(jax.lax.dot_general(
                q, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        for j in range(nsplit):
            s = ss[j]
            if causal:
                # rows + iq*bq >= cols + ik*bk + j*bks
                t = ik * bk + j * bks - iq * bq
                s = jnp.where(d0 >= t, s, -3.0e38)
            m_prev = m_ref[...]
            l_prev = l_ref[...]
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s * c - m_next[:, 0:1])
            l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[...] = m_next
            vj = v_ref[0, 0, j * bks:(j + 1) * bks, :]
            pv = jax.lax.dot_general(
                p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha[:, 0:1] + pv

    if causal:
        pl.when((iq + 1) * bq - 1 >= ik * bk)(run)
    else:
        run()

    @pl.when(ik == nk - 1)
    def _():
        l = l_ref[:, 0:1]
        o_ref[0, 0] = (
            acc_ref[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)
        ).astype(o_ref.dtype)


def run_varc(q, k, v, bq, bk, causal, nsplit):
    S_ = q.shape[2]
    nq, nk = S_ // bq, S_ // bk
    bks = bk // nsplit
    d0 = (jax.lax.broadcasted_iota(jnp.int32, (bq, bks), 0)
          - jax.lax.broadcasted_iota(jnp.int32, (bq, bks), 1))
    if causal:
        def kv_index(b, h, iq, ik):
            run = (iq + 1) * bq - 1 >= ik * bk
            return (b, h, jax.lax.select(run, ik, 0), 0)
    else:
        def kv_index(b, h, iq, ik):
            return (b, h, ik, 0)
    return pl.pallas_call(
        functools.partial(_varc_kernel, nk=nk, bq=bq, bk=bk, causal=causal,
                          scale=D ** -0.5, nsplit=nsplit),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((bq, bks), lambda b, h, iq, ik: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S_, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(d0, q, k, v)


def _vard_kernel(d0_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                 *, nk, bq, bk, causal, scale, nsplit):
    """Variant D: sub-q interleave — nsplit independent q chains per grid
    step; their softmax chains have no cross-dependency, so the VPU work of
    chain 0 overlaps the MXU dots of chain 1."""
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -3.0e38)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = jnp.float32(scale * 1.4426950408889634)
    bqs = bq // nsplit

    def run():
        k_ = k_ref[0, 0]
        v_ = v_ref[0, 0]
        d0 = d0_ref[...] if causal else None  # (bqs, bk) rows - cols
        ss = []
        for j in range(nsplit):
            qj = q_ref[0, 0, j * bqs:(j + 1) * bqs, :]
            ss.append(jax.lax.dot_general(
                qj, k_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        for j in range(nsplit):
            s = ss[j]
            rows = slice(j * bqs, (j + 1) * bqs)
            if causal:
                t = ik * bk - (iq * bq + j * bqs)
                s = jnp.where(d0 >= t, s, -3.0e38)
            m_prev = m_ref[rows]
            l_prev = l_ref[rows]
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s * c - m_next[:, 0:1])
            l_ref[rows] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[rows] = m_next
            pv = jax.lax.dot_general(
                p.astype(v_.dtype), v_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[rows] = acc_ref[rows] * alpha[:, 0:1] + pv

    if causal:
        pl.when((iq + 1) * bq - 1 >= ik * bk)(run)
    else:
        run()

    @pl.when(ik == nk - 1)
    def _():
        l = l_ref[:, 0:1]
        o_ref[0, 0] = (
            acc_ref[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)
        ).astype(o_ref.dtype)


def run_vard(q, k, v, bq, bk, causal, nsplit):
    S_ = q.shape[2]
    nq, nk = S_ // bq, S_ // bk
    bqs = bq // nsplit
    d0 = (jax.lax.broadcasted_iota(jnp.int32, (bqs, bk), 0)
          - jax.lax.broadcasted_iota(jnp.int32, (bqs, bk), 1))
    if causal:
        def kv_index(b, h, iq, ik):
            run = (iq + 1) * bq - 1 >= ik * bk
            return (b, h, jax.lax.select(run, ik, 0), 0)
    else:
        def kv_index(b, h, iq, ik):
            return (b, h, ik, 0)
    return pl.pallas_call(
        functools.partial(_vard_kernel, nk=nk, bq=bq, bk=bk, causal=causal,
                          scale=D ** -0.5, nsplit=nsplit),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((bqs, bk), lambda b, h, iq, ik: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S_, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(d0, q, k, v)


def flash(q, k, v, causal, bs):
    out, _ = flash_attention_fwd(
        q, k, v, None, None, None, None, None,
        sq=S, sk=S, causal=causal, softmax_scale=D ** -0.5,
        block_sizes=bs,
    )
    return out


def report(name, t, causal):
    frac = 0.5 if causal else 1.0
    fl = 4 * B * H * S * S * D * frac
    print(f"{name:42s} {t*1e3:8.2f} ms  {fl/t/1e12:7.2f} TFLOP/s")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "parts"
    q, k, v = make_inputs()

    if mode == "prod":
        for causal in (True, False):
            for bq, bk, ch in [(1024, 1024, 4), (1024, 512, 4), (1024, 512, 8),
                               (2048, 512, 8), (1024, 768 // 128 * 128, 4),
                               (1024, 1024, 8), (1536, 512, 6),
                               (2048, 1024, 8), (1024, 2048, 4)]:
                try:
                    bs = BlockSizes(block_q=bq, block_k=bk, q_chains=ch)
                    t = median_time(
                        jax.jit(functools.partial(flash, causal=causal, bs=bs)),
                        q, k, v)
                    report(f"prod causal={causal} bq={bq} bk={bk} ch={ch}",
                           t, causal)
                except Exception as e:
                    print(f"{bq}/{bk}/{ch}: {type(e).__name__}: {str(e)[:100]}")
        return
    if mode == "bwd":
        import flash_attn_tpu.ops.attention as A

        def loss(q, k, v, causal):
            return jnp.sum(A.flash_attention(
                q, k, v, causal=causal, layout="bhsd").astype(jnp.float32)
                * 1e-3)

        for causal in (True, False):
            f = jax.jit(jax.grad(functools.partial(loss, causal=causal),
                                 argnums=(0, 1, 2)))

            def step(q, k, v):
                dq, dk, dv = f(q, k, v)
                return (dq + dk + dv).astype(q.dtype)  # consume all grads

            t = median_time(jax.jit(step), q, k, v)
            frac = 0.5 if causal else 1.0
            # Standard accounting: fwd 2 matmuls + bwd 5 -> 3.5x fwd flops.
            fl = 3.5 * 4 * B * H * S * S * D * frac / 2
            print(f"fwd+bwd causal={causal}: {t*1e3:8.2f} ms "
                  f"{fl/t/1e12:7.2f} TFLOP/s (3.5x-fwd accounting)")
        return
    if mode == "cd":
        from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
        for name, fn, cfgs in [
            ("varc", run_varc, [(512, 2048, 2), (512, 1024, 2),
                                (512, 2048, 4), (1024, 2048, 2)]),
            ("vard", run_vard, [(1024, 1024, 2), (1024, 2048, 2),
                                (2048, 1024, 4), (1024, 1024, 4),
                                (2048, 2048, 2), (512, 1024, 2)]),
        ]:
            for causal in (True,):
                ref, _ = flash_attention_fwd(
                    q, k, v, None, None, None, None, None, sq=S, sk=S,
                    causal=causal, softmax_scale=D ** -0.5, save_lse=False)
                bq, bk, ns = cfgs[0]
                got = fn(q, k, v, bq, bk, causal, ns)
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"{name} causal={causal}: max err vs prod = {err:.3e}")
            for causal in (True, False):
                for bq, bk, ns in cfgs:
                    try:
                        t = median_time(
                            jax.jit(functools.partial(
                                fn, bq=bq, bk=bk, causal=causal, nsplit=ns)),
                            q, k, v)
                        report(f"{name} causal={causal} bq={bq} bk={bk} ns={ns}",
                               t, causal)
                    except Exception as e:
                        print(f"{name} {bq}/{bk}/{ns}: {type(e).__name__}:"
                              f" {str(e)[:120]}")
        return
    if mode == "split2":
        # Correctness spot check on device (dense + causal).
        from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
        for causal in (True, False):
            ref, _ = flash_attention_fwd(
                q, k, v, None, None, None, None, None, sq=S, sk=S,
                causal=causal, softmax_scale=D ** -0.5, save_lse=False)
            got = run_split2(q, k, v, 512, 2048, causal, 2)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"causal={causal} max |split2 - prod| = {err:.3e}")
        for causal in (True, False):
            for bq, bk, nsplit in [(512, 2048, 2), (512, 1024, 2),
                                   (512, 4096, 4), (512, 2048, 4),
                                   (1024, 2048, 2), (512, 4096, 2)]:
                try:
                    t = median_time(
                        jax.jit(functools.partial(
                            run_split2, bq=bq, bk=bk, causal=causal,
                            nsplit=nsplit)), q, k, v)
                    report(f"split2 causal={causal} bq={bq} bk={bk} ns={nsplit}",
                           t, causal)
                except Exception as e:
                    print(f"{bq}/{bk}/{nsplit}: {type(e).__name__}: {str(e)[:150]}")
        return
    if mode == "split":
        for causal in (True, False):
            for bq, bk, nsplit in [(512, 1024, 1), (512, 1024, 2),
                                   (512, 1024, 4), (512, 2048, 4),
                                   (512, 2048, 2), (1024, 1024, 2)]:
                try:
                    t = median_time(
                        jax.jit(functools.partial(
                            run_split, bq=bq, bk=bk, causal=causal,
                            nsplit=nsplit)), q, k, v)
                    report(f"split causal={causal} bq={bq} bk={bk} ns={nsplit}",
                           t, causal)
                except Exception as e:
                    print(f"{bq}/{bk}/{nsplit}: {type(e).__name__}: {str(e)[:150]}")
        return
    if mode == "parts":
        for bq, bk in [(512, 512), (512, 1024)]:
            t = median_time(
                jax.jit(functools.partial(run_matmul_only, bq=bq, bk=bk)),
                q, k, v)
            report(f"matmul-only bq={bq} bk={bk} (dense)", t, causal=False)
        for causal in (False, True):
            bs = BlockSizes(block_q=512, block_k=512)
            t = median_time(
                jax.jit(functools.partial(flash, causal=causal, bs=bs)), q, k, v)
            report(f"flash causal={causal} bq=512 bk=512", t, causal)
    else:
        for causal in (True,):
            for bq, bk in [(512, 1024), (512, 2048), (256, 2048),
                           (1024, 2048), (128, 1024), (512, 4096),
                           (256, 4096)]:
                bs = BlockSizes(block_q=bq, block_k=bk)
                try:
                    t = median_time(
                        jax.jit(functools.partial(flash, causal=causal, bs=bs)),
                        q, k, v)
                    report(f"flash causal={causal} bq={bq} bk={bk}", t, causal)
                except Exception as e:
                    print(f"bq={bq} bk={bk}: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
