"""Interleaved A/B: matmul ceiling vs dense vs causal (diag on/off)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_dev import B, H, S, D, make_inputs, run_matmul_only

import flash_attn_tpu.kernels.flash_fwd as FF
from flash_attn_tpu.kernels.block_sizes import BlockSizes

BS = BlockSizes(block_q=1024, block_k=1024, q_chains=4)
BS_NODIAG = BlockSizes(block_q=1024, block_k=1024, q_chains=4,
                       diag_specialization=False)


def flash(q, k, v, causal, bs=BS):
    out, _ = FF.flash_attention_fwd(
        q, k, v, None, None, None, None, None,
        sq=S, sk=S, causal=causal, softmax_scale=D ** -0.5,
        block_sizes=bs, save_lse=False)
    return out


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
    builders = {}
    builders["matmul_only"] = functools.partial(run_matmul_only, bq=1024,
                                                bk=1024)
    builders["dense"] = functools.partial(flash, causal=False)
    builders["causal_diag"] = jax.jit(functools.partial(flash, causal=True))
    builders["causal_nodiag"] = functools.partial(
        flash, causal=True, bs=BS_NODIAG
    )

    CHAIN = 12
    fns = {}
    for name, f in builders.items():
        g1, gN = chained(f, 1), chained(f, CHAIN + 1)
        np.asarray(g1(q, k, v)); np.asarray(gN(q, k, v))
        fns[name] = (g1, gN)
    rounds = 7
    times = {n: [] for n in fns}
    for r in range(rounds):
        for name, (g1, gN) in fns.items():
            a = q * (1.0 + 0.37 * r)
            t0 = time.perf_counter(); np.asarray(g1(a, k, v))
            t1 = time.perf_counter(); np.asarray(gN(a, k, v))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / CHAIN)
    for name in fns:
        med = sorted(times[name])[rounds // 2]
        frac = 0.5 if name.startswith("causal") else 1.0
        fl = 4 * B * H * S * S * D * frac
        print(f"{name:14s} {med*1e3:8.3f} ms  {fl/med/1e12:7.2f} TFLOP/s")


if __name__ == "__main__":
    main()
