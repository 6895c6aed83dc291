"""GPT-2 training-step throughput on one chip (flagship end-to-end).

Reports tokens/s and model FLOPs utilization (MFU) for a GPT-2-small
train step (fwd+bwd+adamw) at S=1024, the reference benchmark seqlen.

Usage: python benchmarks/benchmark_gpt2_train.py [--batch 8] [--seqlen 1024]
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
import optax

from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    cfg = GPT2Config(
        vocab_size=50257, n_layer=args.layers, n_head=12, n_embd=768,
        max_position_embeddings=max(1024, args.seqlen), dropout=0.1,
        dtype=jnp.bfloat16,
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    b, s = args.batch, args.seqlen
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0, 1))

    params, opt_state, loss = step(params, opt_state, batch, jax.random.PRNGKey(1))
    print(f"warm loss: {float(loss):.3f}  ({n_params/1e6:.0f}M params)")
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
    loss = float(loss)  # sync
    dt = (time.perf_counter() - t0) / args.steps
    toks = b * s
    # 6*N*T matmul flops + attention 12*L*s^2*e (fwd+bwd causal ~ x0.5 each way)
    attn_flops = 3.5 * 4 * args.layers * b * cfg.n_head * s * s * 64 * 0.5
    flops = 6 * n_params * toks + attn_flops
    print(
        f"train step: {dt * 1e3:.1f} ms, {toks / dt:,.0f} tokens/s, "
        f"MFU {flops / dt / 197e12 * 100:.1f}% (v5e bf16), final loss {loss:.3f}"
    )


if __name__ == "__main__":
    main()
