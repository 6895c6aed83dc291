"""Benchmark utilities: timing, profiling, memory, roofline.

TPU analog of the reference's ``benchmarks/utils.py`` (reference
benchmarks/utils.py:8-75 benchmark_forward/backward/combined via
torch.utils.benchmark; :89-117 pytorch_profiler; :119-129
benchmark_memory). Differences by design:

  - Timing uses a chained-readback harness instead of wall-clocking single
    calls: on a remote-tunneled TPU, ``block_until_ready`` does not wait
    for remote execution, and XLA CSE collapses repeated identical calls.
    An unrolled chain of N calls, each feeding the next call's input, is
    timed against a single call; the difference / N is a per-call time
    immune to both effects.
  - Profiling wraps ``jax.profiler.trace`` (view with TensorBoard or
    Perfetto) instead of torch.profiler.
  - Memory reports XLA's compile-time memory analysis (argument/output/
    temp/peak bytes) instead of a CUDA allocator high-water mark: TPU
    memory is statically planned by the compiler, so the plan *is* the
    peak.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e (TPU v5 lite) per-chip peaks; override for other generations.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES_PER_S = 819e9


def median_time(f, *args, iters: int = 3, chain: int = 8, vary: int = 0):
    """Median per-call wall time of ``f(*args)`` (see module docstring).

    ``f``'s output must have the same shape/dtype as ``args[vary]`` so the
    chain can feed outputs back in. Inputs are perturbed by >= 25% between
    timing reps — bf16 needs a large relative change to defeat CSE.
    """

    def chained(n):
        @jax.jit
        def g(*a):
            a = list(a)
            for _ in range(n):
                a[vary] = f(*a)
            return jnp.sum(a[vary][..., :1, :1].astype(jnp.float32))

        return g

    g1, gN = chained(1), chained(chain + 1)
    np.asarray(g1(*args))  # compile + warm
    np.asarray(gN(*args))
    ts = []
    for i in range(iters):
        a = list(args)
        a[vary] = a[vary] * (1.0 + 0.5 * i)
        t0 = time.perf_counter()
        np.asarray(g1(*a))
        t1 = time.perf_counter()
        np.asarray(gN(*a))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / chain)
    return max(sorted(ts)[len(ts) // 2], 1e-9)


def benchmark_forward(fn, *args, desc: str = "", verbose: bool = True, **kw):
    """Time fn(*args) (reference benchmark_forward, utils.py:8-26)."""
    t = median_time(lambda *a: fn(*a, **kw), *args)
    if verbose:
        print(f"{desc} fwd: {t * 1e3:.3f} ms")
    return t


def benchmark_backward(fn, *args, desc: str = "", verbose: bool = True, **kw):
    """Time the VJP of sum(fn(*args)) w.r.t. args[0] (reference
    benchmark_backward, utils.py:29-46). The forward is run untimed to
    build the cotangent structure; only grad evaluation is chained."""

    def loss(*a):
        return jnp.sum(fn(*a, **kw).astype(jnp.float32))

    def grad_step(*a):
        g = jax.grad(loss, argnums=tuple(range(len(a))))(*a)
        out = g[0]
        for x in g[1:]:
            if x.shape == out.shape:
                out = out + x  # consume every grad
        return out.astype(a[0].dtype)

    t = median_time(jax.jit(grad_step), *args)
    if verbose:
        print(f"{desc} bwd(+fwd rerun): {t * 1e3:.3f} ms")
    return t


def benchmark_combined(fn, *args, desc: str = "", verbose: bool = True, **kw):
    """Time forward + backward together (reference benchmark_combined,
    utils.py:49-66)."""
    return benchmark_backward(fn, *args, desc=desc + " fwd+bwd",
                              verbose=verbose, **kw)


def benchmark_all(fn, *args, desc: str = "", verbose: bool = True, **kw):
    """Reference benchmark_all (utils.py:78-86)."""
    return (
        benchmark_forward(fn, *args, desc=desc, verbose=verbose, **kw),
        benchmark_combined(fn, *args, desc=desc, verbose=verbose, **kw),
    )


def jax_profiler(fn, *args, trace_dir: str = "/tmp/jax-trace", **kw):
    """Run fn under a profiler trace (reference pytorch_profiler,
    utils.py:89-117). View with ``tensorboard --logdir <trace_dir>`` or
    upload the .pb to ui.perfetto.dev."""
    f = jax.jit(lambda *a: fn(*a, **kw))
    np.asarray(jnp.sum(f(*args)))  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        np.asarray(jnp.sum(f(*args)))
    return trace_dir


@dataclasses.dataclass(frozen=True)
class MemoryReport:
    argument_bytes: int
    output_bytes: int
    temp_bytes: int
    peak_bytes: int

    def __str__(self):
        gib = 1024 ** 3
        return (
            f"args {self.argument_bytes / gib:.3f} GiB, "
            f"out {self.output_bytes / gib:.3f} GiB, "
            f"temp {self.temp_bytes / gib:.3f} GiB, "
            f"peak {self.peak_bytes / gib:.3f} GiB"
        )


def benchmark_memory(fn, *args, desc: str = "", verbose: bool = True, **kw):
    """Compile-time memory plan of fn(*args) (reference benchmark_memory,
    utils.py:119-129: CUDA max_memory_allocated)."""
    compiled = jax.jit(lambda *a: fn(*a, **kw)).lower(*args).compile()
    m = compiled.memory_analysis()
    rep = MemoryReport(
        argument_bytes=int(getattr(m, "argument_size_in_bytes", 0)),
        output_bytes=int(getattr(m, "output_size_in_bytes", 0)),
        temp_bytes=int(getattr(m, "temp_size_in_bytes", 0)),
        peak_bytes=int(
            getattr(m, "temp_size_in_bytes", 0)
            + getattr(m, "argument_size_in_bytes", 0)
            + getattr(m, "output_size_in_bytes", 0)
        ),
    )
    if verbose:
        print(f"{desc} memory: {rep}")
    return rep


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Roofline model: is a kernel compute- or bandwidth-bound, and how
    close is it to the speed of light (SURVEY.md section 5 'roofline
    calculator')."""

    flops: int
    hbm_bytes: int
    seconds: float
    peak_flops: float = PEAK_BF16_FLOPS
    peak_bw: float = PEAK_HBM_BYTES_PER_S

    @property
    def achieved_tflops(self):
        return self.flops / self.seconds / 1e12

    @property
    def achieved_gbps(self):
        return self.hbm_bytes / self.seconds / 1e9

    @property
    def arithmetic_intensity(self):
        return self.flops / max(self.hbm_bytes, 1)

    @property
    def bound(self):
        ridge = self.peak_flops / self.peak_bw
        return "compute" if self.arithmetic_intensity >= ridge else "memory"

    @property
    def speed_of_light_seconds(self):
        return max(self.flops / self.peak_flops,
                   self.hbm_bytes / self.peak_bw)

    @property
    def fraction_of_roofline(self):
        return self.speed_of_light_seconds / self.seconds

    def __str__(self):
        return (
            f"{self.achieved_tflops:.1f} TFLOP/s, "
            f"{self.achieved_gbps:.0f} GB/s, AI={self.arithmetic_intensity:.0f} "
            f"({self.bound}-bound), {self.fraction_of_roofline * 100:.0f}% of "
            f"roofline"
        )
