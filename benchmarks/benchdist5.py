"""Round-5 bench distribution: official config vs BOTH controls.

TILECOST.md showed the right ceiling for the official causal config is
the same-tile-geometry matmul-only pipeline (d=128 contraction), not the
8192^3 chained matmul BENCHDIST round 4 normalized against. This run
records a 10-window distribution of all three in one process:

  flash   — official bench config (b=4 h=16 S=4096 d=128 bf16 causal)
  mm_geo  — same grid/tiles, dots only (the structural ceiling's base)
  mm_big  — chained 8192^3 bf16 matmul (chip ambient control)

and prints flash/mm_geo (the structural ratio, cap ~0.80 measured) and
mm_geo/mm_big (the geometry penalty, ~0.93) per window.

Usage: python benchmarks/benchdist5.py   (real TPU, ~15 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from probe_tilecost import BS, flash, matmul_only, mk


def chained(f, n):
    @jax.jit
    def g(*a):
        a = list(a)
        for _ in range(n):
            a[0] = f(*a)
        return jnp.sum(a[0][..., :1, :1].astype(jnp.float32))
    return g


def big_matmul(x, y, z):
    return (x @ y).astype(x.dtype)


def main():
    q, k, v = mk(4, 16, 4096, 0), mk(4, 16, 4096, 1), mk(4, 16, 4096, 2)
    rng = np.random.default_rng(3)
    m = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)

    import functools
    variants = {
        "flash": (functools.partial(flash, causal=True), (q, k, v),
                  4 * 4 * 16 * 4096 * 4096 * 128 * 0.5),
        "mm_geo": (matmul_only, (q, k, v), 4 * 4 * 16 * 4096 * 4096 * 128),
        "mm_big": (big_matmul, (m, m, m), 2 * 8192 ** 3),
    }
    CHAIN = 10
    fns = {}
    for name, (f, args, _) in variants.items():
        t0 = time.time()
        g1, gN = chained(f, 1), chained(f, CHAIN + 1)
        np.asarray(g1(*args)); np.asarray(gN(*args))
        fns[name] = (g1, gN)
        print(f"  compiled {name} in {time.time() - t0:.0f}s", flush=True)

    print("\n| window | flash | mm_geo | mm_big | flash/geo | geo/big |")
    print("|---|---|---|---|---|---|")
    rows = []
    for w in range(10):
        med = {}
        for name, (g1, gN) in fns.items():
            _, args, fl = variants[name]
            reps = []
            for r in range(3):
                a = list(args)
                a[0] = a[0] * (1.0 + 0.37 * (w * 3 + r))
                t0 = time.perf_counter(); np.asarray(g1(*a))
                t1 = time.perf_counter(); np.asarray(gN(*a))
                t2 = time.perf_counter()
                reps.append(((t2 - t1) - (t1 - t0)) / CHAIN)
            med[name] = fl / sorted(reps)[1] / 1e12
        rows.append(med)
        print(f"| {time.strftime('%H:%M:%S')} | {med['flash']:.1f} "
              f"| {med['mm_geo']:.1f} | {med['mm_big']:.1f} "
              f"| {med['flash']/med['mm_geo']:.3f} "
              f"| {med['mm_geo']/med['mm_big']:.3f} |", flush=True)
        time.sleep(10)

    for name in ("flash", "mm_geo", "mm_big"):
        vals = sorted(r[name] for r in rows)
        print(f"{name}: min {vals[0]:.1f} / median {vals[len(vals)//2]:.1f}"
              f" / max {vals[-1]:.1f}")
    ratios = sorted(r["flash"] / r["mm_geo"] for r in rows)
    print(f"flash/mm_geo ratio: min {ratios[0]:.3f} / "
          f"median {ratios[len(ratios)//2]:.3f} / max {ratios[-1]:.3f}")


if __name__ == "__main__":
    main()
