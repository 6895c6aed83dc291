"""Official benchmark: attention fwd TFLOP/s/chip at S=4K (north star #1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over plain XLA (unfused) attention on the same
chip — the TPU analog of the reference's "speedup vs PyTorch standard
attention" headline (reference README.md:64-84).

Timing: median of per-call block_until_ready() wall times (async dispatch
through the axon tunnel is unreliable — see .claude/skills/verify).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _readback(x):
    """Force real synchronization: block_until_ready on the axon tunnel
    does NOT wait for remote execution; only a device->host readback of a
    value derived from the output does."""
    return np.asarray(jnp.sum(x[..., :1, :1]))


def _median_time(f, *args, iters=13, chain=24, vary=0):
    """Robust per-call time on the axon tunnel (RTT ~27 ms, block_until_ready
    lies): run an unrolled chain of ``chain+1`` calls where each output feeds
    the next call's ``vary`` input (serialized, all-distinct data — immune to
    XLA CSE and RPC caching), readback once, and subtract the dispatch
    overhead measured by single calls. Requires f's output shape ==
    args[vary] shape.

    Noise policy (round 3): ambient noise on a shared tunneled chip is
    ONE-SIDED — contention only ever adds time — so the round's number is
    the 25th percentile of the per-rep chain estimates, with the
    single-call overhead taken as the MEDIAN across reps (using the
    paired single call would let a hiccup in it fake a faster kernel).
    One bad ambient window can no longer set the round's floor."""

    def chained(n):
        @jax.jit
        def g(*a):
            a = list(a)
            for _ in range(n):
                a[vary] = f(*a)
            return jnp.sum(a[vary][..., :1, :1])

        return g

    g1, gN = chained(1), chained(chain + 1)
    np.asarray(g1(*args))  # compile + warm
    np.asarray(gN(*args))

    def one_pass():
        singles, chains = [], []
        for i in range(iters):
            a = list(args)
            a[vary] = a[vary] * (1.25 + 0.5 * i)  # real bf16 change each rep
            t0 = time.perf_counter()
            np.asarray(g1(*a))
            t1 = time.perf_counter()
            np.asarray(gN(*a))
            t2 = time.perf_counter()
            singles.append(t1 - t0)
            chains.append(t2 - t1)
        single_med = sorted(singles)[len(singles) // 2]
        ests = sorted((c - single_med) / chain for c in chains)
        return ests[max(0, len(ests) // 4)]

    # Best-of-k windows: ambient windows on the shared chip last tens of
    # seconds; spacing passes out keeps one bad window from setting the
    # round's number. Noise is one-sided (contention only adds time), so
    # the minimum across windows is the least-contaminated estimate.
    best = one_pass()
    for _ in range(4):
        time.sleep(20)
        best = min(best, one_pass())
    return max(best, 1e-9)


def _xla_attention(q, k, v, scale):
    """Plain (unfused, causal) attention — the baseline implementation.
    Inputs (b, h, s, d)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    sl = s.shape[-1]
    mask = jnp.tril(jnp.ones((sl, sl), bool))
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def main():
    from flash_attn_tpu import flash_attention

    # Kernel-native (b, h, s, d) layout, analogous to the reference
    # benchmark preparing (unpadding) inputs outside the timed region
    # (reference benchmarks/benchmark_flash_attention.py:60-63).
    b, s, h, d = 4, 4096, 16, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)

    flash = jax.jit(
        functools.partial(flash_attention, causal=True, layout="bhsd")
    )
    t_flash = _median_time(flash, q, k, v)
    flops = 4 * b * h * s * s * d * 0.5  # causal
    tflops = flops / t_flash / 1e12

    # XLA baseline at b=1 (the full batch materializes a 4 GB score tensor);
    # compare per-example times.
    naive = jax.jit(functools.partial(_xla_attention, scale=d**-0.5))
    t_naive = _median_time(naive, q[:1], k[:1], v[:1], iters=5)
    speedup = (t_naive * b) / t_flash

    print(
        json.dumps(
            {
                "metric": "attn_fwd_tflops_per_chip_s4k_causal_bf16",
                "value": round(tflops, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(speedup, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
