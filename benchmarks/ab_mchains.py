"""Interleaved A/B: masked-tile chain count in the blocksparse fwd kernel.

Banded masks make nearly every active tile PARTIAL, so the mask VPU has
no trailing full tiles to hide under (the dense kernel's diag trick:
finer chains give the VPU more independent MXU streams to overlap).
Sweeps MASKED_CHAINS on the window+global @ ~21% mask, S=8K.

Usage: python benchmarks/ab_mchains.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import flash_attn_tpu.kernels.blocksparse as BS
from flash_attn_tpu.kernels.blocksparse import (
    blocksparse_attention_fwd, build_layout,
)

B, H, S, D = 2, 16, 8192, 128


def window_mask(s, win_cells, global_cols):
    nrc, ncc = s // 16, s // 256
    bm = np.zeros((nrc, ncc), bool)
    for rc in range(nrc):
        c = (rc * 16) // 256
        bm[rc, max(0, c - win_cells + 1): c + 1] = True
        bm[rc, :global_cols] = True
    return bm


def chain_time(f, q, k, v, chain=8):
    @jax.jit
    def g1(q, k, v):
        return jnp.sum(f(q, k, v)[0][..., :1, :1].astype(jnp.float32))

    @jax.jit
    def gN(q, k, v):
        for _ in range(chain):
            q = f(q, k, v)[0]
        return jnp.sum(q[..., :1, :1].astype(jnp.float32))

    np.asarray(g1(q, k, v))
    np.asarray(gN(q, k, v))

    def once(i):
        qq = q * (1.25 + 0.5 * i)
        t0 = time.perf_counter()
        np.asarray(g1(qq, k, v))
        t1 = time.perf_counter()
        np.asarray(gN(qq, k, v))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (chain - 1)

    return once


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    bm = window_mask(S, 7, 1)
    lay = build_layout(bm, sq=S, sk=S, causal=True)
    assert lay.mask_bank is not None

    timers = {}
    for mc in (4, 8):
        BS.MASKED_CHAINS = mc

        def f(q, k, v):
            return blocksparse_attention_fwd(
                q, k, v, lay, None, None, None,
                sk=S, softmax_scale=D**-0.5, interpret=False,
            )
        timers[f"mchains={mc}"] = chain_time(f, q, k, v)
    BS.MASKED_CHAINS = None

    results = {n: [] for n in timers}
    for r in range(rounds):
        for name, once in timers.items():
            t = once(r)
            results[name].append(t)
            print(f"round{r} {name:12s}: {t * 1e3:7.3f} ms", flush=True)
    print()
    for name, ts in results.items():
        ts = sorted(ts)
        print(f"{name:12s}: median {ts[len(ts) // 2] * 1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
