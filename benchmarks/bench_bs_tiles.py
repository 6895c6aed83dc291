"""Sweep blocksparse tile geometry on structured window masks."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_blocksparse import B, S, H, D, make_window_mask, chained
from flash_attn_tpu.ops.blocksparse import blocksparse_attention, build_layout


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

    CHAIN = 8
    built = {}
    for wname, wc in (("w25", 3), ("w50", 7)):
        m = make_window_mask(wc, 1)
        for bq, bk in ((1024, 1024), (512, 512), (1024, 512), (512, 1024),
                       (1024, 256), (256, 512)):
            try:
                lay = build_layout(m, sq=S, sk=S, block_q=bq, block_k=bk)

                def f(q, k, v, lay=lay):
                    return blocksparse_attention(
                        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                        jnp.swapaxes(v, 1, 2), lay,
                    ).swapaxes(1, 2)

                g1, gN = chained(f, 1), chained(f, CHAIN + 1)
                np.asarray(g1(q, k, v)); np.asarray(gN(q, k, v))
                built[f"{wname} bq={bq} bk={bk}"] = (g1, gN)
            except Exception as e:
                print(f"{wname} {bq}/{bk}: {type(e).__name__}: {str(e)[:90]}")
    rounds = 5
    times = {n: [] for n in built}
    for r in range(rounds):
        for name, (g1, gN) in built.items():
            a = q * (1.0 + 0.37 * r)
            t0 = time.perf_counter(); np.asarray(g1(a, k, v))
            t1 = time.perf_counter(); np.asarray(gN(a, k, v))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / CHAIN)
    for name in built:
        med = sorted(times[name])[rounds // 2]
        print(f"{name:24s} {med*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
