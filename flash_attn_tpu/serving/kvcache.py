"""``flash_attn_with_kvcache`` — fused append + attend for serving.

Parity surface for the CUDA package's ``flash_attn_with_kvcache`` entry
point (upstream flash_attn_interface; the reference snapshot predates it
— included because serving engines migrating from the CUDA package build
speculative decoding and chunked prefill on it): write this step's K/V
into the paged cache, then attend the query chunk against the whole
cache with tail-aligned causality.

TPU-native decomposition:
  - the write is ``serving/cache.py``'s aliased-page kernels (one page
    RMW per sequence per token — never a whole-buffer copy), scanned
    over the chunk rows;
  - the compute is ``kernels/chunk.py``'s multi-token paged kernel (all
    chunk rows, heads, and sequences in one dispatch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.chunk import paged_chunk_attention
from flash_attn_tpu.ops.rotary import apply_rotary_at_positions
from flash_attn_tpu.serving.cache import PagedKVCache, append_span


def append_chunk(
    cache: PagedKVCache,
    new_k: jax.Array,  # (batch, sq, n_kv_heads, d)
    new_v: jax.Array,
    page_table: jax.Array,  # (batch, pages_max)
    lengths: jax.Array,  # (batch,) length BEFORE the append
    new_lens: jax.Array | None = None,  # (batch,) valid rows (<= sq)
) -> PagedKVCache:
    """Append up to ``sq`` tokens per sequence to the paged cache.

    One aliased RMW per TOUCHED page (cache.append_span) — not one per
    token. Row t of sequence b lands at position ``lengths[b] + t`` when
    ``t < new_lens[b]`` (padding/inactive rows write nothing). The pages
    must already be allocated (PageAllocator.extend)."""
    return append_span(cache, new_k, new_v, page_table, lengths, new_lens)


def flash_attn_with_kvcache(
    q: jax.Array,  # (batch, sq, n_q_heads, d)
    cache: PagedKVCache,
    page_table: jax.Array,  # (batch, pages_max)
    cache_seqlens: jax.Array,  # (batch,) valid tokens BEFORE this call
    k: jax.Array | None = None,  # (batch, sq, n_kv_heads, d) to append
    v: jax.Array | None = None,
    *,
    new_lens: jax.Array | None = None,  # (batch,) valid chunk rows <= sq
    softmax_scale: float | None = None,
    window_left: int | None = None,
    alibi_slopes: jax.Array | None = None,
    softcap: float | None = None,
    apply_rotary: bool = False,
    rotary_base: float = 10000.0,
    qk_quant: str | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, PagedKVCache]:
    """Returns ``(out, cache)``: attention of the query chunk against the
    updated cache, and the cache with this step's K/V written.

    Causality is tail-aligned (the upstream ``flash_attn_with_kvcache``
    convention): query row t sits at global position
    ``total_len[b] - chunk[b] + t`` where ``total_len = cache_seqlens +
    chunk`` when k/v are given (appended first), or ``cache_seqlens``
    when they are not (the chunk's K/V must then already be resident —
    e.g. written by a prefill pass). ``new_lens`` marks per-sequence
    valid chunk rows (rest are padding: not written, output zero).

    One call with sq=1 is exactly a decode step; sq>1 covers speculative
    verification and chunked prefill.

    ``apply_rotary=True`` rotates q (and the new k, when given) at their
    global cache positions before the write/attend — the upstream
    in-place-rotary convention, for NeoX-style models whose cache holds
    post-rotary keys.
    """
    batch, sq, _, _ = q.shape
    if new_lens is None:
        new_lens = jnp.full((batch,), sq, jnp.int32)
    new_lens = new_lens.astype(jnp.int32)
    cache_seqlens = cache_seqlens.astype(jnp.int32)

    if (k is None) != (v is None):
        raise ValueError("k and v must be given together")
    if apply_rotary:
        # Chunk row t sits at global position total - chunk + t, which is
        # cache_seqlens + t when appending (padding rows beyond new_lens
        # get garbage positions — they are masked/not written anyway).
        base_pos = (
            cache_seqlens if k is not None else cache_seqlens - new_lens
        )
        pos = base_pos[:, None] + jnp.arange(sq, dtype=jnp.int32)[None]
        pos = jnp.maximum(pos, 0)[:, :, None]  # (b, sq, 1): bcast over h
        q = apply_rotary_at_positions(q, pos, base=rotary_base)
        if k is not None:
            k = apply_rotary_at_positions(k, pos, base=rotary_base)
    if k is not None:
        cache = append_chunk(
            cache, k, v, page_table, cache_seqlens, new_lens
        )
        total = cache_seqlens + new_lens
    else:
        total = cache_seqlens

    out = paged_chunk_attention(
        q,
        cache.k_pages,
        cache.v_pages,
        total,
        page_table,
        cache.k_scales,
        cache.v_scales,
        chunk_lens=new_lens,
        softmax_scale=softmax_scale,
        interpret=interpret,
        window_left=window_left,
        alibi_slopes=alibi_slopes,
        softcap=softcap,
        qk_quant=qk_quant,
    )
    return out, cache
