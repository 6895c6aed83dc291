"""Train a small GPT-2 with flash attention on synthetic data.

Single-chip by default; pass --shard to run data+tensor parallel over all
visible devices (on CPU, get 8 virtual devices with
XLA_FLAGS=--xla_force_host_platform_device_count=8):

    python examples/train_gpt2.py [--shard] [--steps N]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.models.gpt2 import (
    GPT2Config,
    GPT2LMHeadModel,
    make_sharded_model,
    make_train_step,
    param_shardings,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = (
        GPT2Config(dtype=jnp.bfloat16)  # GPT-2 small
        if on_tpu
        else GPT2Config.tiny(dtype=jnp.float32)
    )
    batch_size, seq = (8, 1024) if on_tpu else (4, 128)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (batch_size, seq)), jnp.int32
    )
    batch = {"input_ids": ids, "labels": ids}

    if args.shard:
        n = len(jax.devices())
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(n // 2, 2), ("data", "model")
        )
        model = make_sharded_model(cfg, mesh)
        params = model.init(jax.random.PRNGKey(0), ids)
        params = jax.device_put(params, param_shardings(params, mesh))
        batch = jax.device_put(batch, NamedSharding(mesh, P("data", None)))
    else:
        model = GPT2LMHeadModel(cfg)
        params = model.init(jax.random.PRNGKey(0), ids)

    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(model, opt), donate_argnums=(0, 1))

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
        print(f"step {i}: loss {float(loss):.4f}")
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    toks = args.steps * batch_size * seq
    print(f"{toks / dt:,.0f} tokens/s (incl. compile)")


if __name__ == "__main__":
    main()
