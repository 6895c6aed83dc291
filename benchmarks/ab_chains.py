"""Interleaved A/B over interior q_chains (post column-m/l)."""
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


def build(ch, causal):
    bs = BlockSizes(block_q=1024, block_k=1024, q_chains=ch)

    def flash(q, k, v):
        out, _ = FF.flash_attention_fwd(
            q, k, v, None, None, None, None, None,
            sq=S, sk=S, causal=causal, softmax_scale=D ** -0.5,
            block_sizes=bs, save_lse=False)
        return out

    n = 12

    @jax.jit
    def g1(q, k, v):
        return jnp.sum(flash(q, k, v)[..., :1, :1].astype(jnp.float32))

    @jax.jit
    def gN(q, k, v):
        x = q
        for _ in range(n + 1):
            x = flash(x, k, v)
        return jnp.sum(x[..., :1, :1].astype(jnp.float32))

    return g1, gN, n


def main():
    q, k, v = make_inputs()
    fns = {}
    for causal in (True, False):
        for ch in (2, 4, 8):
            g1, gN, n = build(ch, causal)
            np.asarray(g1(q, k, v)); np.asarray(gN(q, k, v))
            fns[(causal, ch)] = (g1, gN, n)
    rounds = 7
    times = {kk: [] for kk in fns}
    for r in range(rounds):
        for kk, (g1, gN, n) in fns.items():
            a = q * (1.0 + 0.37 * r)
            t0 = time.perf_counter(); np.asarray(g1(a, k, v))
            t1 = time.perf_counter(); np.asarray(gN(a, k, v))
            t2 = time.perf_counter()
            times[kk].append(((t2 - t1) - (t1 - t0)) / n)
    for (causal, ch) in fns:
        med = sorted(times[(causal, ch)])[rounds // 2]
        fl = 4 * B * H * S * S * D * (0.5 if causal else 1.0)
        print(f"causal={causal} chains={ch}  {med*1e3:8.3f} ms  "
              f"{fl/med/1e12:7.2f} TFLOP/s")


if __name__ == "__main__":
    main()
