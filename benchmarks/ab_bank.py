"""Interleaved A/B: blocksparse partial-tile mask BANK vs in-kernel build.

Round-3 question (VERDICT r2 #3): does precomputing the elementwise
partial-tile masks into an int8 bank (one load + compare per tile) beat
rebuilding them in-kernel from the per-cell rowmask (per-cell
lane-selects + iota compares, ~dense+40% per partial tile)? Variants
round-robin inside ONE process (cross-process ambient drift on the
shared chip is ±10%+ and produces phantom wins).

Run: python benchmarks/ab_bank.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import flash_attn_tpu.kernels.blocksparse as BS
from flash_attn_tpu.ops.blocksparse import blocksparse_attention, build_layout
from flash_attn_tpu.kernels.blocksparse import COL_CELL, ROW_CELL

B, S, H, D = 2, 8192, 16, 128


def make_window_mask(window_cells, global_cells):
    nr, nc = S // ROW_CELL, S // COL_CELL
    m = np.zeros((nr, nc), bool)
    for r in range(nr):
        c_mid = r * ROW_CELL // COL_CELL
        lo = max(0, c_mid - window_cells)
        hi = min(nc, c_mid + window_cells + 1)
        m[r, lo:hi] = True
    m[:, :global_cells] = True
    return m


def chained(f, n):
    @jax.jit
    def g(*a):
        a = list(a)
        for _ in range(n):
            a[0] = f(*a)
        return jnp.sum(a[0][..., :1, :1].astype(jnp.float32))
    return g


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

    CHAIN = 8
    fns = {}
    for wname, wc in (("w23%", 3), ("w12%", 1)):
        for bank in (True, False):
            m = make_window_mask(wc, 1)
            saved = BS.MASK_BANK_MAX_BYTES
            if not bank:
                BS.MASK_BANK_MAX_BYTES = 0
            try:
                lay = build_layout(m, sq=S, sk=S)
            finally:
                BS.MASK_BANK_MAX_BYTES = saved
            assert (lay.mask_bank is not None) == bank

            def f(q, k, v, lay=lay):
                return blocksparse_attention(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                    jnp.swapaxes(v, 1, 2), lay,
                ).swapaxes(1, 2)

            fns[f"{wname} {'bank' if bank else 'fallback'}"] = f

    built = {}
    for name, f in fns.items():
        g1, gN = chained(f, 1), chained(f, CHAIN + 1)
        np.asarray(g1(q, k, v)); np.asarray(gN(q, k, v))
        built[name] = (g1, gN)
        print("compiled", name, flush=True)
    rounds = 7
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
        print(f"{name:16s} {med*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
