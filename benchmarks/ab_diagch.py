"""Interleaved A/B over the diagonal-block chain count."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_dev import B, H, S, D, make_inputs

import flash_attn_tpu.kernels.flash_fwd as FF
from flash_attn_tpu.kernels.block_sizes import BlockSizes

BS = BlockSizes(block_q=1024, block_k=1024, q_chains=2)


def build(dch):
    import dataclasses
    bs = dataclasses.replace(BS, q_chains_diag=dch)

    def flash(q, k, v):
        out, _ = FF.flash_attention_fwd(
            q, k, v, None, None, None, None, None,
            sq=S, sk=S, causal=True, softmax_scale=D ** -0.5,
            block_sizes=bs, save_lse=False)
        return out

    @jax.jit
    def g1(q, k, v):
        return jnp.sum(flash(q, k, v)[..., :1, :1].astype(jnp.float32))

    n = 12

    @jax.jit
    def gN(q, k, v):
        for _ in range(n + 1):
            q = flash(q, k, v)
        return jnp.sum(q[..., :1, :1].astype(jnp.float32))

    return g1, gN, n


def main():
    q, k, v = make_inputs()
    fns = {}
    for dch in [2, 4, 8]:
        g1, gN, n = build(dch)
        np.asarray(g1(q, k, v)); np.asarray(gN(q, k, v))
        fns[dch] = (g1, gN, n)
    rounds = 7
    times = {d: [] for d in fns}
    for r in range(rounds):
        for dch, (g1, gN, n) in fns.items():
            a = q * (1.0 + 0.37 * r)
            t0 = time.perf_counter(); np.asarray(g1(a, k, v))
            t1 = time.perf_counter(); np.asarray(gN(a, k, v))
            t2 = time.perf_counter()
            times[dch].append(((t2 - t1) - (t1 - t0)) / n)
    fl = 4 * B * H * S * S * D * 0.5
    for dch in fns:
        med = sorted(times[dch])[rounds // 2]
        print(f"diag_chains={dch}  {med*1e3:8.3f} ms  {fl/med/1e12:7.2f} TFLOP/s")


if __name__ == "__main__":
    main()
