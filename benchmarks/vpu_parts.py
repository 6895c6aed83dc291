"""Dissect the dense flash kernel's VPU cost: incremental variants from
matmul-only up to the full online softmax, same grid/blocking (1024/1024,
4 sub-q chains), S=4K d=128 bf16."""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_dev import B, H, S, D, make_inputs, median_time, report, flash
from flash_attn_tpu.kernels.block_sizes import BlockSizes

BQ = BK = 1024
CH = 4
BQS = BQ // CH


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, nk, level,
            scale):
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
        if level == 0:  # cast only
            p = s.astype(v.dtype)
        elif level == 1:  # exp2 + cast
            p = jnp.exp2(s * c).astype(v.dtype)
        elif level == 2:  # + row max (fresh, no merge)
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            p = jnp.exp2(s * c - m_curr[:, 0:1]).astype(v.dtype)
        elif level == 3:  # + running merge + l sum (full online softmax)
            m_prev = m_ref[rows]
            l_prev = l_ref[rows]
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            pf = jnp.exp2(s * c - m_next[:, 0:1])
            l_ref[rows] = alpha * l_prev + jnp.sum(pf, axis=1, keepdims=True)
            m_ref[rows] = m_next
            p = pf.astype(v.dtype)
        elif level == 4:  # online softmax but NO separate sum pass:
            # fold l into an extra MXU column via ones? here: skip sum,
            # compute l from pv's extra lane later — emulate cost only.
            m_prev = m_ref[rows]
            m_curr = jnp.max(s, axis=1, keepdims=True) * c
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            pf = jnp.exp2(s * c - m_next[:, 0:1])
            m_ref[rows] = m_next
            p = pf.astype(v.dtype)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if level >= 3:
            acc_ref[rows] = acc_ref[rows] * alpha[:, 0:1] + pv
        elif level == 4:
            acc_ref[rows] = acc_ref[rows] * alpha[:, 0:1] + pv
        else:
            acc_ref[rows] += pv

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)


def run_level(q, k, v, level):
    nq, nk = S // BQ, S // BK
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk, level=level, scale=D ** -0.5),
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


def main():
    q, k, v = make_inputs()
    for level, name in [(0, "dots+cast only"), (1, "+exp2"),
                        (2, "+rowmax"), (3, "full online softmax"),
                        (4, "online, no l-sum pass")]:
        t = median_time(jax.jit(functools.partial(run_level, level=level)),
                        q, k, v)
        report(f"level {level}: {name}", t, False)
    bs = BlockSizes(block_q=BQ, block_k=BK, q_chains=CH)

    def flash_nolse(q, k, v):
        from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
        out, _ = flash_attention_fwd(
            q, k, v, None, None, None, None, None,
            sq=S, sk=S, causal=False, softmax_scale=D ** -0.5,
            block_sizes=bs, save_lse=False)
        return out

    t = median_time(jax.jit(flash_nolse), q, k, v)
    report("prod dense save_lse=False", t, False)


if __name__ == "__main__":
    main()
