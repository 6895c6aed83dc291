"""Interleaved sustained A/B: fp32 vs bf16 softmax VPU math in the fwd kernel.

Question: v5e VPU lanes are 32-bit; if Mosaic packs 2x bf16 per lane for
elementwise ops, doing the exp2/max/sum chain in bf16 halves the unhidden
VPU time (the sustained flash rate is ~132 TF/s vs a 181 TF/s matmul-only
pipeline ceiling at the same blocking — the gap is softmax VPU work).

Numerics note: p is cast to bf16 for the PV dot anyway; computing
exp2(s*c - m) in bf16 perturbs p by ~0.4% relative — same order as the
final cast. m/l/acc carries stay fp32.

Timing: sustained marginal slope between chain=3 and chain=25 programs
(first ~2 calls of a program run ~45% faster — burst window — so short
chains overstate; see CLAUDE.md round-3 notes).

Run: python benchmarks/ab_bf16sm.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_dev import B, H, S, D, make_inputs

BQ = BK = 1024
CH = 2
BQS = BQ // CH


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, nk, scale,
            mode):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -3.0e38)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    c = jnp.float32(scale * 1.4426950408889634)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    ss = []
    for j in range(CH):
        qj = q_ref[0, 0, j * BQS:(j + 1) * BQS, :]
        ss.append(jax.lax.dot_general(
            qj, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    for j in range(CH):
        rows = slice(j * BQS, (j + 1) * BQS)
        s = ss[j]
        m_prev = m_ref[rows, 0:1]
        l_prev = l_ref[rows, 0:1]
        if mode == "f32":
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            pf = jnp.exp2(s * c - m_next)
            l_curr = jnp.sum(pf, axis=1, keepdims=True)
            p = pf.astype(v.dtype)
        elif mode == "bf16":
            sb = (s * c).astype(jnp.bfloat16)
            m_curr = jnp.max(sb, axis=1, keepdims=True).astype(jnp.float32)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(sb - m_next.astype(jnp.bfloat16))
            l_curr = jnp.sum(p, axis=1, keepdims=True).astype(jnp.float32)
        l_ref[rows, 0:1] = alpha * l_prev + l_curr
        m_ref[rows, 0:1] = m_next
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[rows] = acc_ref[rows] * alpha + pv

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0, 0] = (acc_ref[...] / l_ref[..., 0:1]).astype(o_ref.dtype)


def run(q, k, v, mode):
    nq, nk = S // BQ, S // BK
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk, scale=D ** -0.5, mode=mode),
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
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v)


def sustained(fns, q, k, v, reps=7):
    """Marginal chain slope (3 -> 25), variants interleaved per rep."""
    def chained(f, n):
        @jax.jit
        def g(q, k, v):
            for _ in range(n):
                q = f(q, k, v)
            return jnp.sum(q[..., :1, :1])
        return g

    gs = {(name, n): chained(f, n) for name, f in fns.items()
          for n in (3, 25)}
    for g in gs.values():
        np.asarray(g(q, k, v))
    times = {key: [] for key in gs}
    for i in range(reps):
        qi = q * (1.25 + 0.5 * i)
        for key, g in gs.items():
            t0 = time.perf_counter()
            np.asarray(g(qi, k, v))
            t1 = time.perf_counter()
            times[key].append(t1 - t0)
    out = {}
    for name in fns:
        t3 = sorted(times[(name, 3)])[reps // 3]
        t25 = sorted(times[(name, 25)])[reps // 3]
        out[name] = (t25 - t3) / 22
    return out


def main():
    q, k, v = make_inputs()
    # numerics first
    a = np.asarray(jax.jit(functools.partial(run, mode="f32"))(q, k, v),
                   np.float32)
    b = np.asarray(jax.jit(functools.partial(run, mode="bf16"))(q, k, v),
                   np.float32)
    err = np.max(np.abs(a - b)) / max(1e-6, np.max(np.abs(a)))
    print(f"bf16-softmax rel err vs f32-softmax: {err:.2e}")

    fns = {m: jax.jit(functools.partial(run, mode=m)) for m in ("f32", "bf16")}
    ts = sustained(fns, q, k, v)
    flops = 4 * B * H * S * S * D
    for name, t in ts.items():
        print(f"{name:5s} sustained {t * 1e3:.3f} ms/call "
              f"= {flops / t / 1e12:.1f} TFLOP/s (dense)")


if __name__ == "__main__":
    main()
