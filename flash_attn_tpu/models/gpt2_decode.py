"""GPT-2 autoregressive decode against the paged (optionally quantized)
KV cache.

Pure-function re-application of the ``GPT2LMHeadModel`` parameter tree
(models/gpt2.py) split into the two serving phases:

  - ``prefill``: run the prompt through the fused flash-attention forward,
    returning per-layer K/V to be written into cache pages and the logits
    of the last prompt token.
  - ``decode_step``: one token per active sequence; each layer computes
    qkv for the new token, appends K/V to its paged cache, and attends via
    kernels/decode.paged_decode_attention.

Numerics are verified against the training-path forward in
tests/test_gpt2_decode.py (teacher forcing equality).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.chunk import paged_chunk_attention
from flash_attn_tpu.kernels.decode import paged_decode_attention
from flash_attn_tpu.models.gpt2 import GPT2Config
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.serving.cache import (
    PagedKVCache,
    append_token,
    write_prompt,
)


def _layer_norm(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _mlp(x, p):
    h = jax.nn.gelu(_dense(x, p["c_fc"]))
    return _dense(h, p["c_proj"])


def _qkv(x, p, cfg: GPT2Config):
    hd = cfg.n_embd // cfg.n_head
    qkv = _dense(x, p["Wqkv"])
    qkv = qkv.reshape(*x.shape[:-1], 3, cfg.n_head, hd)
    return qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]


def prefill(
    params,
    cfg: GPT2Config,
    input_ids: jax.Array,
    lengths: jax.Array | None = None,
):
    """Run a batch of prompts (b, s); returns (logits of each prompt's
    last token (b, vocab), per-layer k/v lists [(b, s, n_head, hd)]).

    ``lengths`` (b,) enables BATCHED prefill of unequal prompts padded to
    a shared bucket length: rows beyond a prompt's length are padding
    (causal attention keeps them from influencing valid rows; their k/v
    rows are garbage and must not be written to the cache beyond
    ceil(length/page_size) pages), and the returned logits are taken at
    position lengths-1 per row instead of -1."""
    p = params["params"]
    b, s = input_ids.shape
    x = p["wte"][input_ids] + p["wpe"][None, :s]
    x = x.astype(cfg.dtype)
    ks, vs = [], []
    for i in range(cfg.n_layer):
        lp = p[f"h_{i}"]
        h = _layer_norm(
            x.astype(jnp.float32), lp["ln_1"], cfg.layer_norm_epsilon
        ).astype(cfg.dtype)
        q, k, v = _qkv(h, lp["attn"], cfg)
        ks.append(k)
        vs.append(v)
        ctx = flash_attention(
            q, k, v, causal=True,
            window_size=(
                None if cfg.window is None else (cfg.window, 0)
            ),
        )
        attn_out = _dense(ctx.reshape(b, s, cfg.n_embd), lp["attn"]["out_proj"])
        x = x + attn_out.astype(cfg.dtype)
        h = _layer_norm(
            x.astype(jnp.float32), lp["ln_2"], cfg.layer_norm_epsilon
        ).astype(cfg.dtype)
        x = x + _mlp(h, lp["mlp"]).astype(cfg.dtype)
    x = _layer_norm(
        x.astype(jnp.float32), p["ln_f"], cfg.layer_norm_epsilon
    )
    if lengths is None:
        last = x[:, -1]
    else:
        idx = jnp.clip(lengths - 1, 0, s - 1)
        last = jnp.take_along_axis(
            x, idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
    logits = last @ p["wte"].T.astype(jnp.float32)
    return logits, ks, vs


def chunk_prefill_step(
    params,
    cfg: GPT2Config,
    caches: Sequence[PagedKVCache],
    input_ids: jax.Array,  # (b, C) this chunk's tokens
    pos0: jax.Array,  # (b,) int32 — tokens already in cache (global offset)
    chunk_lens: jax.Array,  # (b,) int32 — valid rows of this chunk (<= C)
    write_tbl: jax.Array,  # (b, C/page_size) page ids for THIS chunk's span
    page_table: jax.Array,  # (b, pages_max) full table for attention
):
    """One chunk of chunked prefill for all sequences: per layer, write
    the chunk's K/V into its (page-aligned) span with the whole-page
    aliased kernel, then attend the chunk against the cache with the
    multi-token paged kernel (kernels/chunk.py) — earlier chunks are
    read back from pages, so activation memory per dispatch is O(b * C)
    instead of O(b * prompt_len).

    The chunk must be page-aligned: C % page_size == 0 and pos0 a
    page_size multiple for every active row (the engine admits chunks of
    a fixed page-multiple size). Rows with chunk_lens == 0 are padding
    (their write_tbl rows must point at the reserved scratch page).

    Returns (logits (b, vocab) at each row's LAST VALID chunk token,
    new_caches). Rows whose prompt does not end in this chunk get
    garbage logits (caller samples only finishing rows)."""
    p = params["params"]
    b, C = input_ids.shape
    pos = jnp.clip(
        pos0[:, None] + jnp.arange(C, dtype=jnp.int32),
        0,
        cfg.max_position_embeddings - 1,
    )
    x = p["wte"][input_ids] + p["wpe"][pos]
    x = x.astype(cfg.dtype)
    total = jnp.maximum(pos0, 0) + chunk_lens  # cache length AFTER chunk
    new_caches = []
    for i in range(cfg.n_layer):
        lp = p[f"h_{i}"]
        h = _layer_norm(
            x.astype(jnp.float32), lp["ln_1"], cfg.layer_norm_epsilon
        ).astype(cfg.dtype)
        q, k, v = _qkv(h, lp["attn"], cfg)  # (b, C, n_head, hd)
        cache = caches[i]
        for r in range(b):
            cache = write_prompt(cache, k[r], v[r], write_tbl[r])
        new_caches.append(cache)
        ctx = paged_chunk_attention(
            q,
            cache.k_pages,
            cache.v_pages,
            total,
            page_table,
            cache.k_scales,
            cache.v_scales,
            chunk_lens=chunk_lens,
            window_left=cfg.window,
        )
        attn_out = _dense(
            ctx.reshape(b, C, cfg.n_embd), lp["attn"]["out_proj"]
        )
        x = x + attn_out.astype(cfg.dtype)
        h = _layer_norm(
            x.astype(jnp.float32), lp["ln_2"], cfg.layer_norm_epsilon
        ).astype(cfg.dtype)
        x = x + _mlp(h, lp["mlp"]).astype(cfg.dtype)
    x = _layer_norm(
        x.astype(jnp.float32), p["ln_f"], cfg.layer_norm_epsilon
    )
    idx = jnp.clip(chunk_lens - 1, 0, C - 1)
    last = jnp.take_along_axis(
        x, idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = last @ p["wte"].T.astype(jnp.float32)
    return logits, new_caches


def decode_step(
    params,
    cfg: GPT2Config,
    caches: Sequence[PagedKVCache],
    page_table: jax.Array,  # (batch, pages_max) int32
    lengths: jax.Array,  # (batch,) int32 — tokens already in cache
    token_ids: jax.Array,  # (batch,) int32 — the token at position `lengths`
):
    """One decode step for all sequences. Returns (logits (b, vocab),
    new_caches). Sequences are padded slots; a slot with length < 0 is
    inactive (still computed, caller ignores)."""
    p = params["params"]
    b = token_ids.shape[0]
    pos = jnp.clip(lengths, 0, cfg.max_position_embeddings - 1)
    x = p["wte"][token_ids] + p["wpe"][pos]
    x = x.astype(cfg.dtype)[:, None]  # (b, 1, e)
    new_caches = []
    safe_len = jnp.maximum(lengths, 0)
    for i in range(cfg.n_layer):
        lp = p[f"h_{i}"]
        h = _layer_norm(
            x.astype(jnp.float32), lp["ln_1"], cfg.layer_norm_epsilon
        ).astype(cfg.dtype)
        q, k, v = _qkv(h, lp["attn"], cfg)  # (b, 1, n_head, hd)
        # Raw lengths: append_token redirects negative-length (inactive)
        # slots to the reserved scratch page itself, so safety does not
        # depend on the engine zeroing freed page-table rows.
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
        attn_out = _dense(ctx.reshape(b, cfg.n_embd), lp["attn"]["out_proj"])
        x = x + attn_out.astype(cfg.dtype)[:, None]
        h = _layer_norm(
            x.astype(jnp.float32), lp["ln_2"], cfg.layer_norm_epsilon
        ).astype(cfg.dtype)
        x = x + _mlp(h, lp["mlp"]).astype(cfg.dtype)
    x = _layer_norm(
        x[:, 0].astype(jnp.float32), p["ln_f"], cfg.layer_norm_epsilon
    )
    logits = x @ p["wte"].T.astype(jnp.float32)
    return logits, new_caches
