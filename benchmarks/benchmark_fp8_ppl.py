"""FP8-KV decode perplexity vs bf16 on a TRAINED GPT-2 (north-star bar).

No pretrained GPT-2 weights are reachable (zero egress), so per the
fallback: train a small GPT-2 to non-trivial loss on a structured
synthetic corpus (order-1 Markov chain with sparse zipfian transitions —
entropy ~1.4 nats, so a trained model produces confident, structured
logits where KV-quantization error is actually visible, unlike random
weights), then measure teacher-forced perplexity through the REAL decode
path (paged cache + dequant-in-kernel, kernels/decode.py) with bf16,
fp8_e4m3 and int8 KV caches.

Bar (BASELINE.json): |ppl_fp8 - ppl_bf16| <= 0.05.

Writes FP8_PPL.md at the repo root. Usage:
  python benchmarks/benchmark_fp8_ppl.py [--train-steps 400]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flash_attn_tpu.models.gpt2 import (
    GPT2Config, GPT2LMHeadModel, make_train_step,
)
from flash_attn_tpu.models.gpt2_decode import decode_step
from flash_attn_tpu.serving.cache import init_cache

VOCAB = 256
SEQ = 256


def make_markov(rng, vocab=VOCAB, branching=4):
    """Sparse zipfian order-1 Markov chain transition table."""
    succ = np.zeros((vocab, branching), np.int32)
    probs = 1.0 / np.arange(1, branching + 1)
    probs = probs / probs.sum()
    for s in range(vocab):
        succ[s] = rng.choice(vocab, size=branching, replace=False)
    return succ, probs


def sample_batch(rng, succ, probs, batch, seq):
    toks = np.zeros((batch, seq), np.int32)
    toks[:, 0] = rng.integers(0, succ.shape[0], batch)
    b = succ.shape[1]
    for t in range(1, seq):
        choice = rng.choice(b, size=batch, p=probs)
        toks[:, t] = succ[toks[:, t - 1], choice]
    return toks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=16)
    args = ap.parse_args()

    cfg = GPT2Config(
        vocab_size=VOCAB, n_layer=4, n_head=8, n_embd=256,
        max_position_embeddings=SEQ, dropout=0.0, dtype=jnp.bfloat16,
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    succ, probs = make_markov(rng)

    ids0 = jnp.asarray(sample_batch(rng, succ, probs, args.batch, SEQ))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids0)
    optimizer = optax.adamw(3e-4)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0, 1))

    t0 = time.perf_counter()
    loss = None
    for i in range(args.train_steps):
        ids = jnp.asarray(sample_batch(rng, succ, probs, args.batch, SEQ))
        params, opt_state, loss = step(
            params, opt_state, {"input_ids": ids, "labels": ids},
            jax.random.PRNGKey(i),
        )
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}")
    print(f"trained {args.train_steps} steps in "
          f"{time.perf_counter() - t0:.0f}s, final loss {float(loss):.4f} "
          f"(uniform would be {np.log(VOCAB):.2f}, chain entropy ~1.36)")

    # ---- teacher-forced decode perplexity through the paged-cache path ----
    eb = args.eval_batch
    eval_ids = jnp.asarray(sample_batch(rng, succ, probs, eb, SEQ))
    hd = cfg.n_embd // cfg.n_head
    page_size, pages_per_seq = 128, SEQ // 128
    num_pages = 1 + eb * pages_per_seq
    table = jnp.asarray(
        [[1 + i * pages_per_seq + j for j in range(pages_per_seq)]
         for i in range(eb)], jnp.int32)

    def eval_nll(quantization, tokens):
        caches = [
            init_cache(cfg.n_head, num_pages, page_size, hd,
                       dtype=jnp.bfloat16, quantization=quantization)
            for _ in range(cfg.n_layer)
        ]

        @jax.jit
        def run(params, tokens, caches):
            def body(carry, tok_nxt):
                caches, lengths = carry
                tok, nxt = tok_nxt
                logits, caches = decode_step(
                    params, cfg, caches, table, lengths, tok)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32))
                nll = -jnp.take_along_axis(logp, nxt[:, None], 1)[:, 0]
                return (caches, lengths + 1), nll

            lengths = jnp.zeros((eb,), jnp.int32)
            (_, _), nlls = jax.lax.scan(
                body, (caches, lengths),
                (tokens[:, :-1].T, tokens[:, 1:].T))
            return jnp.mean(nlls)

        return float(run(params, tokens, caches))

    results = {}
    for q in (None, "fp8_e4m3", "int8"):
        nll = eval_nll(q, eval_ids)
        results[q or "bf16"] = float(np.exp(nll))
        print(f"KV={q or 'bf16':9s} nll={nll:.5f} ppl={results[q or 'bf16']:.4f}")

    d_fp8 = results["fp8_e4m3"] - results["bf16"]
    d_int8 = results["int8"] - results["bf16"]
    ok = abs(d_fp8) <= 0.05
    lines = [
        "# FP8-KV decode perplexity (north-star numerics bar)",
        "",
        "GPT-2 (4L/8H/256e, bf16) TRAINED to non-trivial loss "
        f"({float(loss):.3f} nats; corpus entropy ~1.36, uniform 5.55) on a",
        "structured synthetic corpus (no pretrained weights reachable —",
        "zero egress), then teacher-forced through the REAL paged decode",
        "path (kernels/decode.py dequant-in-kernel) on the v5e chip.",
        "",
        "| KV cache | perplexity | delta vs bf16 |",
        "|---|---|---|",
        f"| bf16 | {results['bf16']:.4f} | — |",
        f"| fp8_e4m3 | {results['fp8_e4m3']:.4f} | {d_fp8:+.4f} |",
        f"| int8 | {results['int8']:.4f} | {d_int8:+.4f} |",
        "",
        f"Bar |ppl_fp8 - ppl_bf16| <= 0.05: **{'PASS' if ok else 'FAIL'}**"
        f" ({abs(d_fp8):.4f})",
        "",
    ]
    out = os.path.join(os.path.dirname(__file__), "..", "FP8_PPL.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines[-3:]))


if __name__ == "__main__":
    main()
