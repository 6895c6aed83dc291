"""Interleaved A/B: int8-QK (qk_quant="int8") vs bf16 forward.

Same-process round-robin (the only drift-immune comparison on the shared
tunneled chip): chained-readback per-call times for the public
flash_attention at the official bench shape, variants alternating per
round. Reports per-round ratios and effective TFLOP/s. The int8 path's
ceiling is set by the MXU's 2x int8 rate on HALF the dot flops (QK^T;
PV stays bf16) => ideal ~1.33x, minus the quantization prolog (per-token
scales + round/clip — fused elementwise, HBM-bound).

Usage: python benchmarks/ab_int8.py [rounds]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import flash_attention


def chain_time(f, q, k, v, chain=12):
    @jax.jit
    def g1(q, k, v):
        return jnp.sum(f(q, k, v)[..., :1, :1])

    @jax.jit
    def gN(q, k, v):
        for _ in range(chain):
            q = f(q, k, v)
        return jnp.sum(q[..., :1, :1])

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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    b, s, h, d = 4, 4096, 16, 128
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        for _ in range(3)
    )
    flops = 4 * b * h * s * s * d * 0.5  # causal

    variants = {
        "bf16": functools.partial(
            flash_attention, causal=True, layout="bhsd"
        ),
        "int8": functools.partial(
            flash_attention, causal=True, layout="bhsd", qk_quant="int8"
        ),
    }
    timers = {name: chain_time(f, q, k, v) for name, f in variants.items()}

    # accuracy spot check first
    o_b = variants["bf16"](q, k, v).astype(jnp.float32)
    o_8 = variants["int8"](q, k, v).astype(jnp.float32)
    print("int8-vs-bf16 max |diff|:", float(jnp.max(jnp.abs(o_b - o_8))))

    times = {name: [] for name in variants}
    for r in range(rounds):
        for name in variants:
            times[name].append(timers[name](r))
        line = " ".join(
            f"{name}={times[name][-1] * 1e3:.2f}ms" for name in variants
        )
        ratio = times["bf16"][-1] / times["int8"][-1]
        print(f"round {r}: {line}  int8 speedup x{ratio:.3f}", flush=True)

    for name in variants:
        med = sorted(times[name])[len(times[name]) // 2]
        print(
            f"{name}: median {med * 1e3:.2f} ms = "
            f"{flops / med / 1e12:.1f} TFLOP/s-equivalent"
        )
    meds = {
        name: sorted(ts)[len(ts) // 2] for name, ts in times.items()
    }
    print(f"median speedup: x{meds['bf16'] / meds['int8']:.3f}")


if __name__ == "__main__":
    main()
