"""Flash attention vs. plain XLA attention: the reference's headline
benchmark, on TPU.

TPU analog of reference benchmarks/benchmark_flash_attention.py — same
reproduction config (batch 64, 16 heads, head dim 64, seqlen 1024,
dropout 0.1; reference :40-49), same structure (prepare inputs outside the
timed region :60-63, then benchmark_all on the flash path :65-68 and the
standard-attention baseline :69-70), reporting fwd / fwd+bwd speedups —
the analog of the reference's "2-4x speedup vs PyTorch standard
attention" (reference README.md:64-84) — plus memory and roofline, which
the reference reports as README graphs.

Usage: python benchmarks/benchmark_flash_attention.py [--causal] [--seqlen N]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.utils import (
    Roofline,
    benchmark_combined,
    benchmark_forward,
    benchmark_memory,
)
from flash_attn_tpu import flash_attention


def attention_xla(q, k, v, *, causal, dropout_p=0.0, key=None):
    """Standard (unfused) attention baseline, (b, h, s, d) layout — the
    analog of the reference's ``attention_pytorch``
    (benchmarks/benchmark_flash_attention.py:14-36)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (d ** -0.5)
    if causal:
        sl = s.shape[-1]
        mask = jnp.tril(jnp.ones((sl, sl), bool))
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_p > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - dropout_p, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--headdim", type=int, default=64)
    ap.add_argument("--seqlen", type=int, default=1024)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    b, h, s, d = args.batch, args.heads, args.seqlen, args.headdim
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
               for _ in range(3))
    print(f"config: b={b} h={h} d={d} S={s} dropout={args.dropout} "
          f"causal={args.causal} {dtype} on {jax.devices()[0].device_kind}")

    flash = functools.partial(
        flash_attention, causal=args.causal, layout="bhsd",
        dropout_p=args.dropout, dropout_seed=0 if args.dropout else None,
    )
    base = functools.partial(
        attention_xla, causal=args.causal, dropout_p=args.dropout,
        key=jax.random.PRNGKey(0) if args.dropout else None,
    )

    t_ff = benchmark_forward(flash, q, k, v, desc="flash")
    t_fc = benchmark_combined(flash, q, k, v, desc="flash")
    # The unfused baseline materializes the (b,h,s,s) score tensor; shrink
    # the batch if it would not fit and scale times per-example.
    bb = b
    while bb * h * s * s * 4 * 2 > 8e9 and bb > 1:
        bb //= 2
    scalef = b / bb
    t_bf = benchmark_forward(base, q[:bb], k[:bb], v[:bb], desc="xla-std") * scalef
    t_bc = benchmark_combined(base, q[:bb], k[:bb], v[:bb], desc="xla-std") * scalef

    frac = 0.5 if args.causal else 1.0
    fwd_flops = int(4 * b * h * s * s * d * frac)
    bytes_ = 4 * b * h * s * d * dtype.itemsize
    print(f"flash fwd:     {Roofline(fwd_flops, bytes_, t_ff)}")
    print(f"speedup fwd:     {t_bf / t_ff:.2f}x")
    print(f"speedup fwd+bwd: {t_bc / t_fc:.2f}x")

    benchmark_memory(flash, q, k, v, desc="flash")
    benchmark_memory(base, q[:bb], k[:bb], v[:bb], desc=f"xla-std (b={bb})")


if __name__ == "__main__":
    main()
