"""Bench-floor dossier: the official bench config measured across many
ambient windows, interleaved with a matmul-only control.

VERDICT r3 #2: the driver-recorded official bench has been flat at
~135 TFLOP/s for two rounds while spot runs see 150-176 — this harness
decides whether that is kernel floor or tunnel ambient. Per window it
times, round-robin in ONE process (the only drift-immune comparison):

  - ``flash``: the EXACT bench.py workload (causal fwd, b=4 h=16 S=4K
    d=128, bf16, chained readback),
  - ``matmul``: a chained bf16 matmul stream of comparable FLOPs — the
    chip's achievable ceiling in that same window.

The per-window ratio flash/matmul cancels ambient; its distribution
across >= 20 windows is the kernel-quality number. Writes BENCHDIST.md.

Usage: python benchmarks/bench_dossier.py [--windows 20] [--gap 15]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import flash_attention

B, H, S, D = 4, 16, 4096, 128
FLOPS_FLASH = 4 * B * H * S * S * D * 0.5  # causal fwd
# Matmul control: (8192, 8192) @ (8192, 8192) chained — same dtype, same
# readback protocol. FLOPs per call:
MM = 8192
FLOPS_MM = 2 * MM * MM * MM


def chained(f, n, vary=0):
    @jax.jit
    def g(*a):
        a = list(a)
        for _ in range(n):
            a[vary] = f(*a)
        return jnp.sum(a[vary][..., :1, :1].astype(jnp.float32))
    return g


def one_window(fns, args, chain, reps):
    """One ambient window: all variants round-robin, per-variant estimate
    = 25th percentile of (chain - median single)/chain across reps."""
    out = {}
    singles = {n: [] for n in fns}
    chains_t = {n: [] for n in fns}
    for r in range(reps):
        for name, (g1, gN, a0) in fns.items():
            a = list(a0)
            a[0] = a[0] * (1.25 + 0.5 * r)
            t0 = time.perf_counter(); np.asarray(g1(*a))
            t1 = time.perf_counter(); np.asarray(gN(*a))
            t2 = time.perf_counter()
            singles[name].append(t1 - t0)
            chains_t[name].append(t2 - t1)
    for name in fns:
        sm = sorted(singles[name])[len(singles[name]) // 2]
        ests = sorted((c - sm) / chain for c in chains_t[name])
        out[name] = max(ests[max(0, len(ests) // 4)], 1e-9)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=20)
    ap.add_argument("--gap", type=float, default=15.0)
    ap.add_argument("--chain", type=int, default=12)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((MM, MM)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((MM, MM)), jnp.bfloat16)

    flash = functools.partial(flash_attention, causal=True, layout="bhsd")
    mm = lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.bfloat16)

    fns = {}
    for name, f, fa in (("flash", flash, (q, k, v)), ("matmul", mm, (a, b))):
        g1, gN = chained(f, 1), chained(f, args.chain + 1)
        np.asarray(g1(*fa)); np.asarray(gN(*fa))  # compile + warm
        fns[name] = (g1, gN, fa)

    rows = []
    for w in range(args.windows):
        r = one_window(fns, None, args.chain, args.reps)
        tf = FLOPS_FLASH / r["flash"] / 1e12
        tm = FLOPS_MM / r["matmul"] / 1e12
        rows.append((time.strftime("%H:%M:%S"), tf, tm, tf / tm))
        print(f"[{rows[-1][0]}] flash {tf:6.1f}  matmul {tm:6.1f}  "
              f"ratio {tf / tm:.3f}", flush=True)
        if w != args.windows - 1:
            time.sleep(args.gap)

    tfs = sorted(x[1] for x in rows)
    tms = sorted(x[2] for x in rows)
    ratios = sorted(x[3] for x in rows)
    n = len(rows)
    med = lambda xs: xs[n // 2]
    lines = [
        "# BENCHDIST — official bench config across ambient windows",
        "",
        f"{n} windows, ~{args.gap:.0f}s apart, one process; per window the "
        "flash causal fwd (bench.py config: b=4 h=16 S=4K d=128 bf16) and "
        "a chained 8192^3 bf16 matmul control run round-robin "
        "(chained-readback timing, 25th-pct per window). The ratio "
        "flash/matmul cancels the shared tunnel/chip ambient: a stable "
        "ratio with a wide matmul spread = ambient noise, not kernel "
        "floor.",
        "",
        "| window | flash TFLOP/s | matmul TFLOP/s | ratio |",
        "|---|---|---|---|",
    ]
    for t, tf, tm, ra in rows:
        lines.append(f"| {t} | {tf:.1f} | {tm:.1f} | {ra:.3f} |")
    lines += [
        "",
        f"flash:  min {tfs[0]:.1f} / p25 {tfs[n // 4]:.1f} / median "
        f"{med(tfs):.1f} / p75 {tfs[3 * n // 4]:.1f} / max {tfs[-1]:.1f}",
        "",
        f"matmul: min {tms[0]:.1f} / median {med(tms):.1f} / max "
        f"{tms[-1]:.1f}",
        "",
        f"ratio:  min {ratios[0]:.3f} / median {med(ratios):.3f} / max "
        f"{ratios[-1]:.3f}",
        "",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BENCHDIST.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCHDIST.md")


if __name__ == "__main__":
    main()
