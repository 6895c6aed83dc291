"""Bisect the fp8-vs-int8 decode-loop gap (device probe).

Runs the SERVING.md decode loop (12-layer GPT-2 small, 128 steps in one
fori_loop dispatch) per KV dtype, then two ablated variants that keep the
loop structure but drop one component:

  full       : append_token + paged_decode_attention   (= SERVING.md row)
  no_attn    : append only (attention replaced by zeros)
  no_append  : attention only (cache never written)

Interleaved A/B in one process. Run ON DEVICE.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.decode import paged_decode_attention
from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from flash_attn_tpu.models.gpt2_decode import decode_step
from flash_attn_tpu.serving.cache import append_token, init_cache

B, S, STEPS = 8, 512, 128


def build(cfg, params, page_table, quant, variant):
    hd = cfg.n_embd // cfg.n_head
    num_pages = B * page_table.shape[1] + 1

    def make_caches():
        return [
            init_cache(cfg.n_head, num_pages, 128, hd,
                       dtype=cfg.dtype, quantization=quant)
            for _ in range(cfg.n_layer)
        ]

    if variant == "full":
        step = functools.partial(decode_step, cfg=cfg)

        @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(4,))
        def run(p, caches, lengths, tokens, n):
            def body(_, carry):
                caches, lengths, tokens = carry
                logits, caches = decode_step(
                    p, cfg, caches, page_table, lengths, tokens)
                tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return caches, lengths + 1, tokens
            return jax.lax.fori_loop(0, n, body, (caches, lengths, tokens))

        return run, make_caches

    # ablated loop: per layer do append and/or attention only
    p0 = params["params"]

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(4,))
    def run(p, caches, lengths, tokens, n):
        pp = p["params"]

        def body(_, carry):
            caches, lengths, tokens = carry
            x = pp["wte"][tokens] + pp["wpe"][jnp.clip(lengths, 0, 2047)]
            x = x.astype(cfg.dtype)
            new_caches = []
            acc = jnp.zeros((B,), jnp.float32)
            for i in range(cfg.n_layer):
                lp = pp[f"h_{i}"]
                w = lp["attn"]["Wqkv"]["kernel"].astype(cfg.dtype)
                qkv = (x @ w).reshape(B, 3, cfg.n_head, hd)
                q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
                cache = caches[i]
                if variant != "no_append":
                    cache = append_token(cache, k, v, page_table, lengths)
                new_caches.append(cache)
                if variant != "no_attn":
                    ctx = paged_decode_attention(
                        q, cache.k_pages, cache.v_pages,
                        jnp.maximum(lengths, 0) + 1, page_table,
                        k_scales=cache.k_scales, v_scales=cache.v_scales,
                    )
                    acc = acc + ctx.reshape(B, -1)[:, 0].astype(jnp.float32)
            tokens = (tokens + 1) % 50257 + (acc * 0).astype(jnp.int32)
            return new_caches, lengths + 1, tokens

        return jax.lax.fori_loop(0, n, body, (caches, lengths, tokens))

    return run, make_caches


def time_variant(run, make_caches, params):
    pages_per_seq = 16
    lengths = jnp.full((B,), S, jnp.int32)
    tokens = jnp.zeros((B,), jnp.int32)
    caches = make_caches()
    caches, lengths, tokens = run(params, caches, lengths, tokens, 2)
    np.asarray(tokens)  # warm
    t0 = time.perf_counter()
    caches, lengths, tokens = run(params, caches, lengths, tokens, STEPS)
    np.asarray(tokens)
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    cfg = GPT2Config(
        vocab_size=50257, n_layer=12, n_head=12, n_embd=768,
        max_position_embeddings=2048, dtype=jnp.bfloat16,
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    page_table = jnp.asarray(
        1 + np.arange(B * 16).reshape(B, 16), jnp.int32)

    jobs = {}
    for quant in ("int8", "fp8_e4m3"):
        for variant in ("full", "no_attn", "no_append"):
            jobs[(quant, variant)] = build(
                cfg, params, page_table, quant, variant)

    # interleaved: 2 rounds over all variants
    times = {k: [] for k in jobs}
    for rnd in range(2):
        for key, (run, mk) in jobs.items():
            ms = time_variant(run, mk, params)
            times[key].append(ms)
            print(f"round{rnd} {key[0]:9s} {key[1]:10s}: {ms:7.2f} ms/step",
                  flush=True)
    print()
    for key, ts in times.items():
        print(f"{key[0]:9s} {key[1]:10s}: median {sorted(ts)[len(ts)//2]:7.2f}"
              f" ms/step", flush=True)


if __name__ == "__main__":
    main()
