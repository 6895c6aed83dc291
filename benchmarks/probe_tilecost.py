"""Per-tile-class cost probe for the causal forward kernel (round 5).

VERDICT round 4 (Weak #1): the official-bench "structural cap" was
asserted three inconsistent ways (~121 / ~151 / 171) and derived zero
ways. This probe measures it: every grid-tile CLASS the S=4K causal
schedule executes is isolated in its own launch, all variants run
round-robin in ONE process (chained-readback timing, medians), and a
3-parameter linear model

    T_total = n_bh * (n_diag * t_d  +  n_interior * t_i  +  n_rows * r)

is least-squares fitted across 10 independent grid geometries:

  t_d  = full cost of a diagonal grid step (diag-specialized compute,
         including its share of per-step pipeline overhead)
  t_i  = full cost of an interior (mask-free) grid step
  r    = extra per-ROW cost (q-tile switch, m/l/acc init, finalize +
         o/lse writeback) on top of the steps' own cost

Isolation trick: a (b, h, 1024, 128) causal launch at bq=bk=1024 is a
grid of PURE diagonal steps (1-tile rows, every step runs
_compute_diag); a (b, h, 1024) q against a (b, h, N*1024) kv non-causal
launch is a single row of N PURE interior steps. Varying N (1/6/10)
separates t_i from r; the causal/non-causal pairs at S=4K/8K/16K vary
the diag fraction (40%/22%/12% of steps) and validate the fit out of
sample.

Outputs a table of measured vs model-predicted times, the fitted
per-class costs, and the derived caps:
  - model rate at the official config (the MEASURED structural cap)
  - counterfactual rates: flops-proportional diagonal (t_d =
    0.5625 * t_i at 8 diag chains), zero row overhead, both
  - the interior-step MXU ceiling (t_i vs the same dots at the
    matmul-only rate, measured in-process)

Usage: python benchmarks/probe_tilecost.py  (real TPU, ~10 min incl.
compiles). Writes nothing; paste the table into TILECOST.md.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import flash_attn_tpu.kernels.flash_fwd as FF
from flash_attn_tpu.kernels.block_sizes import BlockSizes

D = 128
BQ = BK = 1024
BS = BlockSizes.choose(seq_len_q=4096, seq_len_k=4096, head_dim=D)
BS_NODIAG = BlockSizes(
    block_q=BS.block_q, block_k=BS.block_k, q_chains=BS.q_chains,
    q_chains_diag=BS.q_chains_diag, diag_specialization=False,
)


def flash(q, k, v, causal, bs=BS):
    out, _ = FF.flash_attention_fwd(
        q, k, v, None, None, None, None, None,
        sq=q.shape[2], sk=k.shape[2], causal=causal,
        softmax_scale=D ** -0.5, block_sizes=bs, save_lse=False)
    return out


def _mm_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, nk):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        s.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)


def matmul_only(q, k, v):
    """The official config's dots with zero softmax/mask work: the
    in-process MXU ceiling for the same tile geometry."""
    b, h, s, d = q.shape
    nq, nk = s // BQ, s // BK
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk),
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v)


def mk(b, h, s, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, h, s, D)), jnp.bfloat16)


def chained(f, n):
    @jax.jit
    def g(*a):
        a = list(a)
        for _ in range(n):
            a[0] = f(*a)
        return jnp.sum(a[0][..., :1, :1].astype(jnp.float32))
    return g


def tri_counts(nq):
    """(n_diag, n_interior, n_rows) per (b, h) of the triangular grid."""
    return nq, nq * (nq - 1) // 2, nq


def main():
    # name -> (fn, (q, k, v), n_bh, (n_diag, n_int, n_rows), useful_flops)
    variants = {}

    def causal_flops(b, h, s):
        return 4 * b * h * s * s * D * 0.5

    def dense_flops(b, h, sq, sk):
        return 4 * b * h * sq * sk * D

    def add(name, fn, q, k, v, n_bh, counts, flops):
        variants[name] = (fn, (q, k, v), n_bh, counts, flops)

    fl_c = functools.partial(flash, causal=True)
    fl_n = functools.partial(flash, causal=False)

    # Causal / non-causal pairs across diag fractions (same useful flops).
    q4 = mk(4, 16, 4096)
    add("C4 official", fl_c, q4, mk(4, 16, 4096, 1), mk(4, 16, 4096, 2),
        64, tri_counts(4), causal_flops(4, 16, 4096))
    add("N4 dense", fl_n, q4, mk(4, 16, 4096, 1), mk(4, 16, 4096, 2),
        64, (0, 16, 4), dense_flops(4, 16, 4096, 4096))
    add("C4 nodiag", functools.partial(flash, causal=True, bs=BS_NODIAG),
        q4, mk(4, 16, 4096, 1), mk(4, 16, 4096, 2),
        64, tri_counts(4), causal_flops(4, 16, 4096))
    q8 = mk(1, 16, 8192)
    add("C8", fl_c, q8, mk(1, 16, 8192, 1), mk(1, 16, 8192, 2),
        16, tri_counts(8), causal_flops(1, 16, 8192))
    add("N8", fl_n, q8, mk(1, 16, 8192, 1), mk(1, 16, 8192, 2),
        16, (0, 64, 8), dense_flops(1, 16, 8192, 8192))
    q16 = mk(1, 4, 16384)
    add("C16", fl_c, q16, mk(1, 4, 16384, 1), mk(1, 4, 16384, 2),
        4, tri_counts(16), causal_flops(1, 4, 16384))
    add("N16", fl_n, q16, mk(1, 4, 16384, 1), mk(1, 4, 16384, 2),
        4, (0, 256, 16), dense_flops(1, 4, 16384, 16384))

    # Isolated tile classes.
    qd = mk(16, 16, 1024)
    add("D1 diag-only", fl_c, qd, mk(16, 16, 1024, 1), mk(16, 16, 1024, 2),
        256, (1, 0, 1), causal_flops(16, 16, 1024))
    # (16, 16) batch-heads: 256 one-tile rows — a 64-step launch measured
    # an impossible 328 TFLOP/s (launch time ~ dispatch-subtraction noise),
    # so the small-row variants use 4x the rows of the official config.
    add("I1 int x1", fl_n, qd, mk(16, 16, 1024, 1), mk(16, 16, 1024, 2),
        256, (0, 1, 1), dense_flops(16, 16, 1024, 1024))
    add("I3 int x3", fl_n, qd, mk(16, 16, 3072, 1), mk(16, 16, 3072, 2),
        256, (0, 3, 1), dense_flops(16, 16, 1024, 3072))
    q1 = mk(4, 16, 1024)
    add("I6 int x6", fl_n, q1, mk(4, 16, 6144, 1), mk(4, 16, 6144, 2),
        64, (0, 6, 1), dense_flops(4, 16, 1024, 6144))
    add("I10 int x10", fl_n, q1, mk(4, 16, 10240, 1), mk(4, 16, 10240, 2),
        64, (0, 10, 1), dense_flops(4, 16, 1024, 10240))

    # MXU ceiling control at the official geometry.
    add("MM control", matmul_only, q4, mk(4, 16, 4096, 1),
        mk(4, 16, 4096, 2), 64, (0, 16, 4), dense_flops(4, 16, 4096, 4096))

    CHAIN = 10
    fns = {}
    for name, (f, args, *_rest) in variants.items():
        t0 = time.time()
        g1, gN = chained(f, 1), chained(f, CHAIN + 1)
        np.asarray(g1(*args)); np.asarray(gN(*args))
        fns[name] = (g1, gN)
        print(f"  compiled {name} in {time.time() - t0:.0f}s", flush=True)

    ROUNDS = 11
    times = {n: [] for n in variants}
    for rd in range(ROUNDS):
        for name, (g1, gN) in fns.items():
            args = list(variants[name][1])
            args[0] = args[0] * (1.0 + 0.37 * rd)
            t0 = time.perf_counter(); np.asarray(g1(*args))
            t1 = time.perf_counter(); np.asarray(gN(*args))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / CHAIN)

    import json
    print("RAW_ROUNDS_JSON " + json.dumps(
        {n: [round(t * 1e6, 2) for t in ts] for n, ts in times.items()}))

    # Ambient cancellation: the chip's rate drifts +-10% between rounds
    # (shared tunneled chip), which pollutes a fit on absolute medians.
    # Every round times ALL variants back-to-back, so the per-round ratio
    # T_v / T_control cancels the drift; the per-variant estimate is
    # median(ratio) x median(T_control).
    mm = times["MM control"]
    mm_med = sorted(mm)[ROUNDS // 2]
    med = {}
    for n, ts in times.items():
        ratios = sorted(t / c for t, c in zip(ts, mm))
        med[n] = ratios[ROUNDS // 2] * mm_med

    # Least-squares fit over the flash variants (exclude MM control and
    # the nodiag variant: its diagonal runs different code).
    fit_names = [n for n in variants
                 if n not in ("MM control", "C4 nodiag")]
    A, y = [], []
    for n in fit_names:
        _, _, n_bh, (nd, ni, nr), _ = variants[n]
        A.append([n_bh * nd, n_bh * ni, n_bh * nr])
        y.append(med[n])
    A, y = np.array(A, float), np.array(y, float)
    (t_d, t_i, r), *_ = np.linalg.lstsq(A, y, rcond=None)

    print()
    print("| variant | time ms | TFLOP/s | model ms | err % |")
    print("|---|---|---|---|---|")
    for n in variants:
        _, _, n_bh, (nd, ni, nr), fl = variants[n]
        pred = n_bh * (nd * t_d + ni * t_i + nr * r)
        err = (med[n] - pred) / pred * 100
        print(f"| {n} | {med[n]*1e3:.3f} | {fl/med[n]/1e12:.1f} "
              f"| {pred*1e3:.3f} | {err:+.1f} |")

    print()
    print(f"fitted per-step costs: t_diag = {t_d*1e6:.3f} us, "
          f"t_interior = {t_i*1e6:.3f} us, row overhead = {r*1e6:.3f} us")

    # Derived caps at the official config (64 bh, 4 diag + 6 int + 4 rows).
    fl_off = causal_flops(4, 16, 4096)

    def rate(td, ti, rr):
        return fl_off / (64 * (4 * td + 6 * ti + 4 * rr)) / 1e12

    mm_step = med["MM control"] / (64 * 16)  # per-tile incl. its overhead
    print(f"per-tile matmul-only control: {mm_step*1e6:.3f} us "
          f"({variants['MM control'][4]/med['MM control']/1e12:.1f} TFLOP/s)")
    print()
    print(f"model rate @ official config:            {rate(t_d, t_i, r):7.1f} TFLOP/s")
    print(f"  if t_d -> 0.5625*t_i (flops-prop diag): {rate(0.5625*t_i, t_i, r):7.1f}")
    print(f"  if r -> 0 (free row switches):          {rate(t_d, t_i, 0):7.1f}")
    print(f"  if both:                                {rate(0.5625*t_i, t_i, 0):7.1f}")
    print(f"  if t_i -> matmul-only step:             {rate(t_d, mm_step, r):7.1f}")
    print(f"  all three (schedule speed of light):    {rate(0.5625*mm_step, mm_step, 0):7.1f}")


if __name__ == "__main__":
    main()
