"""Llama-family autoregressive decode against the paged KV cache.

Mirrors models/gpt2_decode.py (prefill / chunk_prefill_step /
decode_step — the three phases the serving engine drives) for the
Llama/Mistral architecture: RMSNorm, rotary position embeddings applied
BEFORE the cache write (the cache stores post-rotary keys, so decode
needs no re-rotation of history), grouped-query attention (n_kv_head <
n_head rides the kernels' native GQA group axis), SwiGLU MLP, untied LM
head, and Mistral-style sliding-window serving via ``cfg.window``
(rolling-KV decode: band-dead pages never fetched).

Numerics verified against the training-path forward in
tests/test_llama_decode.py (teacher-forcing equality).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.chunk import paged_chunk_attention
from flash_attn_tpu.kernels.decode import paged_decode_attention
from flash_attn_tpu.models.llama import (
    LlamaConfig,
    apply_llama_rope,
    llama_rope_tables,
)
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.serving.cache import (
    PagedKVCache,
    append_token,
    write_prompt,
)


def _rms(x, p, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y * p["scale"]


def _proj(x, p):
    return x @ p["kernel"]


def _mlp(x, p):
    return _proj(jax.nn.silu(_proj(x, p["gate_proj"])) *
                 _proj(x, p["up_proj"]), p["down_proj"])


def _qkv(x, p, cfg: LlamaConfig, positions):
    """x: (b, t, e); positions: (b, t) -> rotary-applied q/k and v."""
    b, t, _ = x.shape
    hd = cfg.head_dim
    q = _proj(x, p["q_proj"]).reshape(b, t, cfg.n_head, hd)
    k = _proj(x, p["k_proj"]).reshape(b, t, cfg.n_kv_head, hd)
    v = _proj(x, p["v_proj"]).reshape(b, t, cfg.n_kv_head, hd)
    cos, sin = llama_rope_tables(positions, hd, cfg.rope_theta)
    return apply_llama_rope(q, cos, sin), apply_llama_rope(k, cos, sin), v


def prefill(
    params,
    cfg: LlamaConfig,
    input_ids: jax.Array,
    lengths: jax.Array | None = None,
):
    """(b, s) prompts -> (last-token logits (b, vocab), per-layer k/v
    lists [(b, s, n_kv_head, hd)], post-rotary). See gpt2_decode.prefill
    for the ``lengths`` bucketed-batch contract."""
    p = params["params"]
    b, s = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    x = p["wte"][input_ids].astype(cfg.dtype)
    ks, vs = [], []
    for i in range(cfg.n_layer):
        lp = p[f"layers_{i}"]
        h = _rms(x, lp["input_layernorm"], cfg.rms_norm_eps).astype(cfg.dtype)
        q, k, v = _qkv(h, lp["attn"], cfg, positions)
        ks.append(k)
        vs.append(v)
        ctx = flash_attention(
            q, k, v, causal=True,
            window_size=(None if cfg.window is None else (cfg.window, 0)),
        )
        x = x + _proj(
            ctx.reshape(b, s, -1), lp["attn"]["o_proj"]
        ).astype(cfg.dtype)
        h = _rms(x, lp["post_attention_layernorm"],
                 cfg.rms_norm_eps).astype(cfg.dtype)
        x = x + _mlp(h, lp["mlp"]).astype(cfg.dtype)
    x = _rms(x, p["norm"], cfg.rms_norm_eps)
    if lengths is None:
        last = x[:, -1]
    else:
        idx = jnp.clip(lengths - 1, 0, s - 1)
        last = jnp.take_along_axis(
            x, idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
    logits = last @ p["lm_head"].T.astype(jnp.float32)
    return logits, ks, vs


def chunk_prefill_step(
    params,
    cfg: LlamaConfig,
    caches: Sequence[PagedKVCache],
    input_ids: jax.Array,  # (b, C)
    pos0: jax.Array,  # (b,) int32 tokens already in cache
    chunk_lens: jax.Array,  # (b,) int32 valid rows of this chunk
    write_tbl: jax.Array,  # (b, C/page_size) page ids for this span
    page_table: jax.Array,  # (b, pages_max)
):
    """One chunk of chunked prefill (contract: gpt2_decode
    .chunk_prefill_step). Rotary uses the GLOBAL positions pos0+t, so
    chunked and single-shot prefill are numerically identical."""
    p = params["params"]
    b, C = input_ids.shape
    positions = jnp.maximum(pos0, 0)[:, None] + jnp.arange(C, dtype=jnp.int32)
    x = p["wte"][input_ids].astype(cfg.dtype)
    total = jnp.maximum(pos0, 0) + chunk_lens
    new_caches = []
    for i in range(cfg.n_layer):
        lp = p[f"layers_{i}"]
        h = _rms(x, lp["input_layernorm"], cfg.rms_norm_eps).astype(cfg.dtype)
        q, k, v = _qkv(h, lp["attn"], cfg, positions)
        cache = caches[i]
        for r in range(b):
            cache = write_prompt(cache, k[r], v[r], write_tbl[r])
        new_caches.append(cache)
        ctx = paged_chunk_attention(
            q, cache.k_pages, cache.v_pages, total, page_table,
            cache.k_scales, cache.v_scales,
            chunk_lens=chunk_lens, window_left=cfg.window,
        )
        x = x + _proj(
            ctx.reshape(b, C, -1), lp["attn"]["o_proj"]
        ).astype(cfg.dtype)
        h = _rms(x, lp["post_attention_layernorm"],
                 cfg.rms_norm_eps).astype(cfg.dtype)
        x = x + _mlp(h, lp["mlp"]).astype(cfg.dtype)
    x = _rms(x, p["norm"], cfg.rms_norm_eps)
    idx = jnp.clip(chunk_lens - 1, 0, C - 1)
    last = jnp.take_along_axis(
        x, idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = last @ p["lm_head"].T.astype(jnp.float32)
    return logits, new_caches


def decode_step(
    params,
    cfg: LlamaConfig,
    caches: Sequence[PagedKVCache],
    page_table: jax.Array,  # (b, pages_max)
    lengths: jax.Array,  # (b,) tokens already in cache (< 0 = inactive)
    token_ids: jax.Array,  # (b,) the token at position `lengths`
):
    """One decode step for all sequences -> (logits (b, vocab),
    new_caches). Contract: gpt2_decode.decode_step."""
    p = params["params"]
    b = token_ids.shape[0]
    pos = jnp.maximum(lengths, 0)
    x = p["wte"][token_ids].astype(cfg.dtype)[:, None]  # (b, 1, e)
    new_caches = []
    safe_len = jnp.maximum(lengths, 0)
    for i in range(cfg.n_layer):
        lp = p[f"layers_{i}"]
        h = _rms(x, lp["input_layernorm"], cfg.rms_norm_eps).astype(cfg.dtype)
        q, k, v = _qkv(h, lp["attn"], cfg, pos[:, None])  # (b, 1, h, hd)
        cache = append_token(
            caches[i], k[:, 0], v[:, 0], page_table, lengths
        )
        new_caches.append(cache)
        ctx = paged_decode_attention(
            jnp.swapaxes(q, 1, 2)[:, :, 0],  # (b, n_head, hd)
            cache.k_pages,
            cache.v_pages,
            safe_len + 1,
            page_table,
            k_scales=cache.k_scales,
            v_scales=cache.v_scales,
            window_left=cfg.window,
            num_sinks=getattr(cfg, "window_sinks", 0),
        )
        x = x + _proj(
            ctx.reshape(b, 1, -1), lp["attn"]["o_proj"]
        ).astype(cfg.dtype)
        h = _rms(x, lp["post_attention_layernorm"],
                 cfg.rms_norm_eps).astype(cfg.dtype)
        x = x + _mlp(h, lp["mlp"]).astype(cfg.dtype)
    x = _rms(x[:, 0], p["norm"], cfg.rms_norm_eps)
    logits = x @ p["lm_head"].T.astype(jnp.float32)
    return logits, new_caches
