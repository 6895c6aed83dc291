"""Decode-path benchmark: TTFT and tokens/s with quantized KV cache.

North-star metrics (BASELINE.json): decode tokens/s with FP8 KV-cache and
p50 time-to-first-token. GPT-2-small geometry, batch 8, paged KV cache.

All decode steps run in ONE device dispatch (lax.fori_loop) so the ~27 ms
tunnel RTT doesn't masquerade as per-token latency; TTFT is a full
host-visible prefill dispatch, which is what a serving client would see.
Caveat: this remote-tunneled chip adds large fixed per-op overheads inside
device loops (an argmax alone measures ~1.5 ms/iteration), so absolute
tokens/s here underestimates a directly-attached TPU.

Usage: python benchmarks/benchmark_decode.py [--write-md]
  --write-md also records the round artifact SERVING.md (north-star
  metrics table: decode tokens/s per KV dtype, p50/p99 TTFT).
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

from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from flash_attn_tpu.models.gpt2_decode import decode_step, prefill
from flash_attn_tpu.serving.cache import init_cache, write_prompt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--no-llama", action="store_true",
                    help="skip the Llama-GQA serving rows")
    args = ap.parse_args()
    results = {}

    cfg = GPT2Config(
        vocab_size=50257, n_layer=12, n_head=12, n_embd=768,
        max_position_embeddings=2048, dtype=jnp.bfloat16,
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    b, s = args.batch, args.prompt
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    hd = cfg.n_embd // cfg.n_head
    page_size = 128
    pages_per_seq = 16
    num_pages = b * pages_per_seq + 1

    # --- TTFT: host-visible prefill latency (p50 of 9) ---
    # NB: params must be a jit *argument*, not a closure/partial constant —
    # constants are inlined into the HLO (hundreds of MB for GPT-2).
    pf = jax.jit(lambda p, i: prefill(p, cfg, i))
    pf = functools.partial(pf, params)
    logits, ks, vs = pf(ids)
    np.asarray(logits[:1, :1])  # warm/compile
    ts = []
    for i in range(15):
        ids_i = (ids + i) % cfg.vocab_size
        t0 = time.perf_counter()
        logits, ks, vs = pf(ids_i)
        np.asarray(logits[:1, :1])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ttft = ts[len(ts) // 2]
    ttft99 = ts[min(len(ts) - 1, int(len(ts) * 0.99))]
    results["prefill_ttft_p50_ms"] = ttft * 1e3
    results["prefill_ttft_p99_ms"] = ttft99 * 1e3
    print(
        f"TTFT (b={b}, prompt={s}, GPT-2 small): "
        f"p50 {ttft * 1e3:.1f} ms, p99 {ttft99 * 1e3:.1f} ms"
    )

    # --- multi-admission TTFT through the real engine (batched bucketed
    # prefill + page-granular aliased write_prompt). One engine instance:
    # its jitted steps compile once per (rows, bucket) shape; requests
    # with max_new_tokens=1 retire at admission, freeing the slots. ---
    from flash_attn_tpu.serving.engine import ServingEngine

    eng = ServingEngine(
        params, cfg, max_batch=8, num_pages=8 * pages_per_seq + 1,
        page_size=page_size, pages_per_seq=pages_per_seq,
    )
    base_prompt = np.asarray(ids[0, : s - 1])
    for n_admit in (1, 4):
        for _ in range(n_admit):  # warm/compile this batch shape
            eng.submit(list(base_prompt), max_new_tokens=1)
        eng.step()
        # Settle: the FIRST post-warm-up step pays a one-time ~100-180 ms
        # cost (no XLA compile events fire — remote program/allocator
        # first-touch; benchmarks/probe_ttft_tail.py), which a 9-rep p99
        # reports as a fake 2-5x admission tail (round-4 SERVING.md).
        # Steady-state p99 ~= p90 ~= 35-38 ms at both admission counts.
        for j in range(2):
            eng.submit(list((base_prompt + 101 + j) % cfg.vocab_size),
                       max_new_tokens=1)
            eng.step()
        ts = []
        for i in range(9):
            prompts = [
                list((base_prompt + i + j) % cfg.vocab_size)
                for j in range(n_admit)
            ]
            t0 = time.perf_counter()
            for p in prompts:
                eng.submit(p, max_new_tokens=1)
            eng.step()  # admit: batched prefill + page writes + 1st token
            t1 = time.perf_counter()
            ts.append(t1 - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        p99 = ts[min(len(ts) - 1, int(len(ts) * 0.99))]
        results[f"engine_ttft_admit{n_admit}"] = (
            med * 1e3, p99 * 1e3, med / n_admit * 1e3
        )
        print(
            f"engine TTFT, {n_admit} concurrent admission(s) "
            f"(prompt={s - 1}): p50 {med * 1e3:.1f} ms / p99 "
            f"{p99 * 1e3:.1f} ms total, {med / n_admit * 1e3:.1f} "
            "ms/request"
        )

    # --- long-prompt admission: single-shot vs chunked prefill ---
    # Chunked prefill admits in fixed page-aligned chunks through the
    # multi-token paged kernel: dispatch shapes are prompt-length-
    # independent (one compile per batch bucket) and activations are
    # O(batch * chunk). Same-process A/B on one long prompt.
    long_s = min(1920, cfg.max_position_embeddings - 2)
    long_prompt = np.asarray(
        rng.integers(0, cfg.vocab_size, (long_s,)), np.int64
    )
    for label, chunk in (
        ("single_shot", None), ("chunked512", 512), ("chunked256", 256)
    ):
        eng2 = ServingEngine(
            params, cfg, max_batch=2, num_pages=2 * pages_per_seq + 1,
            page_size=page_size, pages_per_seq=pages_per_seq,
            prefill_chunk=chunk,
        )
        eng2.submit(list(long_prompt), max_new_tokens=1)
        eng2.step()  # warm/compile
        ts = []
        for i in range(7):
            p = list((long_prompt + i + 1) % cfg.vocab_size)
            t0 = time.perf_counter()
            eng2.submit(p, max_new_tokens=1)
            eng2.step()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        results[f"longprefill_{label}"] = ts[len(ts) // 2] * 1e3
        print(
            f"long-prompt ({long_s}) admission, {label}: "
            f"p50 {ts[len(ts) // 2] * 1e3:.1f} ms"
        )

    for quant in [None, "int8", "fp8_e4m3"]:
        caches = [
            init_cache(cfg.n_head, num_pages, page_size, hd,
                       dtype=cfg.dtype, quantization=quant)
            for _ in range(cfg.n_layer)
        ]
        page_table = jnp.asarray(
            1 + np.arange(b * pages_per_seq).reshape(b, pages_per_seq),
            jnp.int32,
        )
        logits, ks, vs = pf(ids)
        wp = jax.jit(write_prompt)
        for li in range(cfg.n_layer):
            for bi in range(b):
                caches[li] = wp(caches[li], ks[li][bi], vs[li][bi],
                                page_table[bi])
        lengths = jnp.full((b,), s, jnp.int32)

        # All steps in ONE dispatch (lax.fori_loop): the host loop through
        # the tunnel costs ~27 ms RTT per dispatch, which would swamp
        # per-token latency. decode_step traces once.
        @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(4,))
        def run_steps(p, caches, lengths, tokens, n):
            def body(_, carry):
                caches, lengths, tokens = carry
                logits, caches = decode_step(
                    p, cfg, caches, page_table, lengths, tokens
                )
                tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return caches, lengths + 1, tokens

            return jax.lax.fori_loop(0, n, body, (caches, lengths, tokens))

        tokens = jnp.zeros((b,), jnp.int32)
        # Warm with the SAME static step count: n is a static argnum, so a
        # different n is a different program — warming with n=2 and timing
        # n=steps would fold the 128-iteration loop's XLA+Mosaic compile
        # (~10 s) into the measurement (this inflated round-3's decode
        # rows ~25x and made fp8 look 3.6x slower than int8).
        caches, lengths, tokens = run_steps(
            params, caches, lengths, tokens, args.steps
        )
        np.asarray(tokens)  # warm/compile at the timed shape
        t0 = time.perf_counter()
        caches, lengths, tokens = run_steps(
            params, caches, lengths, tokens, args.steps
        )
        np.asarray(tokens)
        dt = time.perf_counter() - t0
        results[f"decode_{quant or 'bf16'}"] = (
            b * args.steps / dt, dt / args.steps * 1e3
        )
        print(
            f"decode kv={quant or 'bf16'}: "
            f"{b * args.steps / dt:,.0f} tokens/s  "
            f"({dt / args.steps * 1e3:.2f} ms/step @ b={b})"
        )

    if not args.no_llama:
        llama_rows(args, results)

    if args.write_md:
        write_md(cfg, args, results)


def llama_rows(args, results):
    """GQA serving rows (round 5, VERDICT #3): the grouped paged-decode
    path measured on a Llama-family model — n_kv_heads < n_heads,
    head_dim 128 (the MXU-native width GPT-2 small lacks)."""
    from flash_attn_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from flash_attn_tpu.models.llama_decode import decode_step as ldecode
    from flash_attn_tpu.models.llama_decode import prefill as lprefill

    cfg = LlamaConfig(
        vocab_size=32000, n_layer=8, n_head=16, n_kv_head=4, n_embd=2048,
        intermediate_size=5632, max_position_embeddings=2048,
        dtype=jnp.bfloat16,
    )
    results["llama_cfg"] = (
        f"Llama-style {cfg.n_layer}L {cfg.n_head}h/{cfg.n_kv_head}kv "
        f"{cfg.n_embd}d (hd {cfg.head_dim}, GQA group "
        f"{cfg.n_head // cfg.n_kv_head})"
    )
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(1)
    b, s = args.batch, args.prompt
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    page_size = 128
    pages_per_seq = 16
    num_pages = b * pages_per_seq + 1

    pf = jax.jit(lambda p, i: lprefill(p, cfg, i))
    pf = functools.partial(pf, params)
    logits, ks, vs = pf(ids)
    np.asarray(logits[:1, :1])
    ts = []
    for i in range(15):
        ids_i = (ids + i) % cfg.vocab_size
        t0 = time.perf_counter()
        logits, ks, vs = pf(ids_i)
        np.asarray(logits[:1, :1])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    results["llama_ttft_p50_ms"] = ts[len(ts) // 2] * 1e3
    results["llama_ttft_p99_ms"] = (
        ts[min(len(ts) - 1, int(len(ts) * 0.99))] * 1e3
    )
    print(
        f"Llama TTFT (b={b}, prompt={s}): "
        f"p50 {results['llama_ttft_p50_ms']:.1f} ms, "
        f"p99 {results['llama_ttft_p99_ms']:.1f} ms"
    )

    page_table = jnp.asarray(
        1 + np.arange(b * pages_per_seq).reshape(b, pages_per_seq),
        jnp.int32,
    )
    for quant in [None, "int8", "fp8_e4m3"]:
        caches = [
            init_cache(cfg.n_kv_head, num_pages, page_size, cfg.head_dim,
                       dtype=cfg.dtype, quantization=quant)
            for _ in range(cfg.n_layer)
        ]
        logits, ks, vs = pf(ids)
        wp = jax.jit(write_prompt)
        for li in range(cfg.n_layer):
            for bi in range(b):
                caches[li] = wp(caches[li], ks[li][bi], vs[li][bi],
                                page_table[bi])
        lengths = jnp.full((b,), s, jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(4,))
        def run_steps(p, caches, lengths, tokens, n):
            def body(_, carry):
                caches, lengths, tokens = carry
                logits, caches = ldecode(
                    p, cfg, caches, page_table, lengths, tokens
                )
                tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return caches, lengths + 1, tokens

            return jax.lax.fori_loop(0, n, body, (caches, lengths, tokens))

        tokens = jnp.zeros((b,), jnp.int32)
        # Warm with the SAME static step count (see the GPT-2 loop above).
        caches, lengths, tokens = run_steps(
            params, caches, lengths, tokens, args.steps
        )
        np.asarray(tokens)
        t0 = time.perf_counter()
        caches, lengths, tokens = run_steps(
            params, caches, lengths, tokens, args.steps
        )
        np.asarray(tokens)
        dt = time.perf_counter() - t0
        results[f"llama_decode_{quant or 'bf16'}"] = (
            b * args.steps / dt, dt / args.steps * 1e3
        )
        print(
            f"Llama decode kv={quant or 'bf16'}: "
            f"{b * args.steps / dt:,.0f} tokens/s  "
            f"({dt / args.steps * 1e3:.2f} ms/step @ b={b})"
        )


def write_md(cfg, args, r):
    b, s = args.batch, args.prompt
    lines = [
        "# SERVING — measured decode / TTFT metrics (north star, "
        "BASELINE.json)",
        "",
        f"Model: GPT-2 small ({cfg.n_layer}L, {cfg.n_head}h, "
        f"{cfg.n_embd}d), bf16 weights, paged KV cache (page 128). "
        f"Batch {b}, prompt {s}, {args.steps} decode steps per "
        "measurement. Single tunneled v5e chip.",
        "",
        "## Decode throughput (all steps in one dispatch)",
        "",
        "| KV cache | tokens/s | ms/step (batch) |",
        "|---|---|---|",
    ]
    for q in ("bf16", "int8", "fp8_e4m3"):
        tok, ms = r[f"decode_{q}"]
        lines.append(f"| {q} | {tok:,.0f} | {ms:.2f} |")
    if "llama_decode_bf16" in r:
        lines += [
            "",
            f"## GQA decode: {r['llama_cfg']}",
            "",
            "The grouped paged-decode path (kv heads < q heads, head_dim "
            "128 — the modern serving shape; each kv head's pages are "
            "fetched ONCE and dotted against the whole query group).",
            "",
            "| KV cache | tokens/s | ms/step (batch) |",
            "|---|---|---|",
        ]
        for q in ("bf16", "int8", "fp8_e4m3"):
            tok, ms = r[f"llama_decode_{q}"]
            lines.append(f"| {q} | {tok:,.0f} | {ms:.2f} |")
        lines += [
            "",
            f"Llama prefill TTFT (b={args.batch}, prompt={args.prompt}): "
            f"p50 {r['llama_ttft_p50_ms']:.1f} ms, "
            f"p99 {r['llama_ttft_p99_ms']:.1f} ms.",
        ]
    lines += [
        "",
        "FP8-KV quality bar: perplexity delta vs bf16 = 0.0005 on a "
        "trained GPT-2 (FP8_PPL.md; bar <= 0.05).",
        "",
        "v5e has no hardware fp8 datapath: fp8 pages dequantize via an "
        "integer shift-add bit decode in-kernel (kernels/common.py "
        "dequant_cast — Mosaic's own fp8 cast is ~6-10x slower, "
        "benchmarks/probe_fp8cast*.py), which is why fp8 lands between "
        "bf16 (2x the bytes) and int8 (native convert) here. Both "
        "quantized caches halve HBM and double the max-context budget; "
        "int8 is the throughput pick on v5e, fp8 the accuracy-"
        "conservative one.",
        "",
        "## Time to first token",
        "",
        "| Path | p50 | p99 |",
        "|---|---|---|",
        f"| raw prefill dispatch (b={b}, prompt={s}) | "
        f"{r['prefill_ttft_p50_ms']:.1f} ms | "
        f"{r['prefill_ttft_p99_ms']:.1f} ms |",
    ]
    for n in (1, 4):
        med, p99, per = r[f"engine_ttft_admit{n}"]
        lines.append(
            f"| continuous-batching engine, {n} concurrent admission(s) | "
            f"{med:.1f} ms ({per:.1f}/req) | {p99:.1f} ms |"
        )
    if "longprefill_single_shot" in r:
        lines += [
            "",
            "Long-prompt (1920 tok) admission p50, single-shot vs chunked "
            "prefill: "
            f"{r['longprefill_single_shot']:.1f} ms single-shot, "
            f"{r['longprefill_chunked512']:.1f} ms chunk=512 (4 "
            "dispatches), "
            f"{r['longprefill_chunked256']:.1f} ms chunk=256 (8 "
            "dispatches). Chunked prefill trades some latency for "
            "prompt-length-independent compile shapes and O(batch*chunk) "
            "activation memory.",
        ]
    lines += [
        "",
        "Tunnel caveat (measured separately): the remote chip adds ~27 ms "
        "RTT per host-visible dispatch and ~170 us per fori_loop "
        "iteration inside a dispatch (an 8x50257 argmax alone measures "
        "~1.5 ms/iter), so absolute tokens/s and TTFT here understate a "
        "directly-attached TPU; the KV-dtype *ratios* and the engine-vs-"
        "raw deltas are the portable signal.",
    ]
    path = os.path.join(os.path.dirname(__file__), "..", "SERVING.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SERVING.md")


if __name__ == "__main__":
    main()
