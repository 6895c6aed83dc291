"""Serve a GPT-2 with continuous batching over a paged KV cache.

Works on TPU or CPU. The model is randomly initialized here; pass real
trained params the same way.

    python examples/serve_gpt2.py [--kv fp8_e4m3|int8] [--temperature 0.8]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from flash_attn_tpu.serving.engine import ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv", default=None, choices=[None, "int8", "fp8_e4m3"])
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--requests", type=int, default=6)
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = (
        GPT2Config(dtype=jnp.bfloat16)
        if on_tpu
        else GPT2Config.tiny(dtype=jnp.float32)
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    dummy = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy)

    engine = ServingEngine(
        params,
        cfg,
        max_batch=4,
        num_pages=64,
        page_size=64,
        pages_per_seq=8,
        kv_quantization=args.kv,  # fp8/int8 pages, dequantized in-kernel
        temperature=args.temperature,
        top_k=40 if args.temperature > 0 else None,
    )

    # Submit more requests than max_batch: the engine admits new prompts as
    # slots free up (continuous batching), with batched bucketed prefill.
    prompt_lens = [37, 120, 9, 64, 200, 15][: args.requests]
    for n in prompt_lens:
        prompt = list(rng.integers(0, cfg.vocab_size, size=n))
        engine.submit(prompt, max_new_tokens=24)

    t0 = time.perf_counter()
    finished = engine.run(max_steps=500)
    dt = time.perf_counter() - t0

    total_new = sum(len(r.generated) for r in finished)
    print(f"{len(finished)} requests, {total_new} tokens in {dt:.2f}s "
          f"({total_new / dt:.1f} tok/s, kv={args.kv or cfg.dtype.__name__})")
    for r in finished[:3]:
        print(f"  req {r.seq_id}: prompt[{len(r.prompt)}] -> {r.generated[:8]}...")


if __name__ == "__main__":
    main()
