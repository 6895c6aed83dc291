"""Speculative decoding on the paged KV cache.

Draft-and-verify: a cheap draft proposes ``k`` tokens, the target GPT-2
scores ALL of them in ONE multi-token dispatch against the paged cache
(the ``kernels/chunk.py`` kernel behind ``flash_attn_with_kvcache`` and
chunked prefill), and the longest prefix agreeing with the target's
greedy choice is accepted. Output is IDENTICAL to plain greedy decoding;
the win is one target dispatch per ~(1 + accepted) tokens instead of one
per token.

The "draft" here is the same tiny model truncated to half depth — a
stand-in for a real small draft model; the verification mechanics are
what the example demonstrates.

Works on TPU or CPU.

    python examples/speculative_decode.py [--k 4] [--new-tokens 24]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import flash_attn_tpu.models.gpt2_decode as gd
from flash_attn_tpu.kernels.chunk import paged_chunk_attention
from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.serving.cache import (
    PageAllocator,
    init_cache,
    write_prompt,
)
from flash_attn_tpu.serving.kvcache import append_chunk


def shallow_greedy(params, cfg, n_layer, ids):
    """Greedy next token from the first ``n_layer`` layers (the draft)."""
    p = params["params"]
    x = p["wte"][jnp.asarray([ids], jnp.int32)] + p["wpe"][None, : len(ids)]
    for i in range(n_layer):
        lp = p[f"h_{i}"]
        h = gd._layer_norm(x, lp["ln_1"], cfg.layer_norm_epsilon)
        q, k, v = gd._qkv(h, lp["attn"], cfg)
        ctx = flash_attention(q, k, v, causal=True)
        x = x + gd._dense(
            ctx.reshape(1, len(ids), cfg.n_embd), lp["attn"]["out_proj"]
        )
        h = gd._layer_norm(x, lp["ln_2"], cfg.layer_norm_epsilon)
        x = x + gd._mlp(h, lp["mlp"])
    x = gd._layer_norm(x, p["ln_f"], cfg.layer_norm_epsilon)
    return int(jnp.argmax(x[0, -1] @ p["wte"].T))


def score_chunk(params, cfg, caches, table, chunk, pos0):
    """Teacher-force ``chunk`` (tokens at positions pos0..pos0+C-1, K/V
    not yet cached) against the cache-resident prefix: per layer, append
    the chunk's K/V and attend with the multi-token paged kernel.

    Returns (greedy next-token per chunk row, the updated caches, the
    cache length that update assumed). The caller keeps the new caches
    only for the ACCEPTED rows — see trim note below."""
    p = params["params"]
    ids = jnp.asarray([chunk], jnp.int32)
    b, C = ids.shape
    pos = pos0 + jnp.arange(C, dtype=jnp.int32)[None]
    x = p["wte"][ids] + p["wpe"][pos]
    before = jnp.asarray([pos0], jnp.int32)
    total = jnp.asarray([pos0 + C], jnp.int32)
    new_caches = []
    for i in range(cfg.n_layer):
        lp = p[f"h_{i}"]
        h = gd._layer_norm(x, lp["ln_1"], cfg.layer_norm_epsilon)
        q, k, v = gd._qkv(h, lp["attn"], cfg)
        cache_i = append_chunk(caches[i], k, v, table, before)
        new_caches.append(cache_i)
        ctx = paged_chunk_attention(
            q, cache_i.k_pages, cache_i.v_pages, total, table,
            cache_i.k_scales, cache_i.v_scales,
        )
        x = x + gd._dense(
            ctx.reshape(b, C, cfg.n_embd), lp["attn"]["out_proj"]
        )
        h = gd._layer_norm(x, lp["ln_2"], cfg.layer_norm_epsilon)
        x = x + gd._mlp(h, lp["mlp"])
    x = gd._layer_norm(x, p["ln_f"], cfg.layer_norm_epsilon)
    logits = x[0] @ p["wte"].T
    greedy = [int(t) for t in np.asarray(jnp.argmax(logits, axis=-1))]
    return greedy, new_caches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4, help="draft tokens/round")
    ap.add_argument("--prompt-len", type=int, default=48)
    ap.add_argument("--new-tokens", type=int, default=24)
    args = ap.parse_args()

    cfg = GPT2Config.tiny(dtype=jnp.float32)
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (args.prompt_len,)).tolist()
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray([prompt], jnp.int32)
    )

    # Paged cache, prompt prefilled.
    page_size = 128
    cap = args.prompt_len + args.new_tokens + args.k + 2
    alloc = PageAllocator(32, page_size, 8, reserved=1)
    caches = [
        init_cache(cfg.n_head, 32, page_size, cfg.n_embd // cfg.n_head,
                   dtype=cfg.dtype)
        for _ in range(cfg.n_layer)
    ]
    pages = alloc.alloc(0, cap)
    logits, ks, vs = gd.prefill(params, cfg, jnp.asarray([prompt], jnp.int32))
    for li in range(cfg.n_layer):
        caches[li] = write_prompt(caches[li], ks[li][0], vs[li][0],
                                  jnp.asarray(pages, jnp.int32))
    table = jnp.asarray([alloc.table_row(0)], jnp.int32)

    ids = list(prompt)
    ids.append(int(jnp.argmax(logits[0])))
    generated = [ids[-1]]
    cached = len(prompt)  # tokens whose K/V is in the pages
    rounds = accepted_total = 0

    while len(generated) < args.new_tokens:
        # Draft rollout (shallow model, dense — a real deployment would
        # give the draft its own cache).
        d_ids = list(ids)
        drafts = []
        for _ in range(args.k):
            t = shallow_greedy(params, cfg, cfg.n_layer // 2, d_ids)
            drafts.append(t)
            d_ids.append(t)

        # Verify [last_uncached_token, d1..dk] in one chunk dispatch:
        # row t predicts the token AFTER chunk[t].
        chunk = ids[cached:] + drafts
        greedy, vcaches = score_chunk(
            params, cfg, caches, table, chunk, cached
        )
        n_acc = 0
        while n_acc < len(drafts) and drafts[n_acc] == greedy[
            len(chunk) - len(drafts) - 1 + n_acc
        ]:
            n_acc += 1
        # Keep the verified caches: rows up to the accepted drafts are
        # now permanent. Rejected draft rows DID write K/V to the pages;
        # that is harmless — `cached` only advances over accepted rows,
        # and the next round's chunk overwrites those slots (same page
        # positions) before they are ever attended.
        caches = vcaches
        cached += len(chunk) - len(drafts) + n_acc
        new = drafts[:n_acc] + [greedy[len(chunk) - len(drafts) - 1 + n_acc]]
        for t in new:
            if len(generated) < args.new_tokens:
                ids.append(t)
                generated.append(t)
        rounds += 1
        accepted_total += n_acc

    print(
        f"prompt {len(prompt)} tokens; generated {len(generated)} in "
        f"{rounds} target dispatches (plain greedy needs "
        f"{len(generated)}); {accepted_total} draft tokens accepted"
    )
    # Exactness: speculative output must equal plain greedy decoding.
    ref_ids = list(prompt)
    for _ in range(len(generated)):
        lg = model.apply(params, jnp.asarray([ref_ids], jnp.int32))
        ref_ids.append(int(jnp.argmax(lg[0, -1])))
    assert ref_ids[len(prompt):] == generated, "speculative != greedy!"
    print("speculative output IDENTICAL to plain greedy decode")


if __name__ == "__main__":
    main()
