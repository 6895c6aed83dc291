"""Drift-immune A/B: variants measured round-robin in one process,
reporting per-round ratios vs variant 0. Usage: ab_interleave.py [dense|causal]
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

from bench_dev import B, H, S, D, make_inputs

BQ = BK = 1024
CH = 4
BQS = BQ // CH


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, nk,
            variant, scale):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -3.0e38)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = jnp.float32(scale * 1.4426950408889634)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    sdt = jnp.bfloat16 if variant in ("s_bf16", "mega") else jnp.float32

    def dot_j(j):
        qj = q_ref[0, 0, j * BQS:(j + 1) * BQS, :]
        s = jax.lax.dot_general(
            qj, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return s.astype(sdt)

    def softmax_j(j, s):
        rows = slice(j * BQS, (j + 1) * BQS)
        sf = s.astype(jnp.float32)
        if variant == "ml_col":
            # column-shaped (bqs, 1) m/l state: no lane-replicated
            # arithmetic (alpha exp2 on 1 lane instead of 128).
            m_prev = m_ref[rows, 0:1]
            l_prev = l_ref[rows, 0:1]
            m_curr = jnp.max(sf, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            pf = jnp.exp2(sf * c - m_next)
            l_ref[rows, 0:1] = alpha * l_prev + jnp.sum(
                pf, axis=1, keepdims=True)
            m_ref[rows, 0:1] = m_next
            p = pf.astype(v.dtype)
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[rows] = acc_ref[rows] * alpha + pv
            return
        m_prev = m_ref[rows]
        l_prev = l_ref[rows]
        m_curr = jnp.max(sf, axis=1, keepdims=True) * c
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        pf = jnp.exp2(sf * c - m_next[:, 0:1])
        if variant in ("sum_after", "mega"):
            p = pf.astype(v.dtype)
            l_ref[rows] = alpha * l_prev + jnp.sum(
                p.astype(jnp.float32), axis=1, keepdims=True)
        else:
            l_ref[rows] = alpha * l_prev + jnp.sum(pf, axis=1, keepdims=True)
            p = pf.astype(v.dtype)
        m_ref[rows] = m_next
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[rows] = acc_ref[rows] * alpha[:, 0:1] + pv

    if variant in ("pipe2", "mega"):
        # 2-deep software pipeline: dot j+2 issued before softmax j.
        ss = [dot_j(0), dot_j(1)]
        for j in range(CH):
            if j + 2 < CH:
                ss.append(dot_j(j + 2))
            softmax_j(j, ss[j])
    else:
        ss = [dot_j(j) for j in range(CH)]
        for j in range(CH):
            softmax_j(j, ss[j])

    @pl.when(ik == nk - 1)
    def _():
        l = l_ref[:, 0:1]
        o_ref[0, 0] = (
            acc_ref[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)
        ).astype(o_ref.dtype)


def run(q, k, v, variant):
    nq, nk = S // BQ, S // BK
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk, variant=variant, scale=D ** -0.5),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, iq, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, iq, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v)


def chained(f, n):
    @jax.jit
    def g(*a):
        a = list(a)
        for _ in range(n):
            a[0] = f(*a)
        return jnp.sum(a[0][..., :1, :1].astype(jnp.float32))
    return g


def main():
    q, k, v = make_inputs()
    variants = ["base", "ml_col", "sum_after"]
    CHAIN = 12
    fns = {}
    for name in variants:
        f = functools.partial(run, variant=name)
        g1, gN = chained(f, 1), chained(f, CHAIN + 1)
        np.asarray(g1(q, k, v)); np.asarray(gN(q, k, v))  # compile+warm
        fns[name] = (g1, gN)
    rounds = 7
    times = {n: [] for n in variants}
    for r in range(rounds):
        for name in variants:
            g1, gN = fns[name]
            a = q * (1.0 + 0.37 * r)
            t0 = time.perf_counter(); np.asarray(g1(a, k, v))
            t1 = time.perf_counter(); np.asarray(gN(a, k, v))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / CHAIN)
    fl = 4 * B * H * S * S * D
    base_med = sorted(times["base"])[rounds // 2]
    for name in variants:
        med = sorted(times[name])[rounds // 2]
        print(f"{name:12s} {med*1e3:8.3f} ms  {fl/med/1e12:7.2f} TFLOP/s "
              f" ratio={med/base_med:6.3f}")


if __name__ == "__main__":
    main()
