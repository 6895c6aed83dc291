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
