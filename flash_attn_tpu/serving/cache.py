"""Paged KV cache: functional jit-friendly state + host-side page allocator.

The device state (``PagedKVCache``) is a pytree updated functionally inside
jit (prefill writes whole pages, decode appends one token); the
``PageAllocator`` is plain Python bookkeeping used by the serving engine to
assign physical pages to sequences (continuous batching).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from flash_attn_tpu.serving import quantization as qz


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Per-layer paged cache. payload dtype is bf16 or a quantized type."""

    k_pages: jax.Array  # (n_kv_heads, num_pages, page_size, d)
    v_pages: jax.Array
    k_scales: Optional[jax.Array]  # (n_kv_heads, num_pages, 1, page_size)
    v_scales: Optional[jax.Array]

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


def init_cache(
    n_kv_heads: int,
    num_pages: int,
    page_size: int,
    head_dim: int,
    *,
    dtype=jnp.bfloat16,
    quantization: str | None = None,
) -> PagedKVCache:
    shape = (n_kv_heads, num_pages, page_size, head_dim)
    if quantization is None:
        return PagedKVCache(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            k_scales=None,
            v_scales=None,
        )
    qdtype = qz.QUANT_DTYPE[quantization]
    sshape = (n_kv_heads, num_pages, 1, page_size)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, qdtype),
        v_pages=jnp.zeros(shape, qdtype),
        k_scales=jnp.ones(sshape, jnp.float32),
        v_scales=jnp.ones(sshape, jnp.float32),
    )


def _quant_method(cache: PagedKVCache) -> str | None:
    if not cache.quantized:
        return None
    return {
        jnp.int8.dtype: "int8",
        jnp.float8_e4m3fn.dtype: "fp8_e4m3",
        jnp.float8_e5m2.dtype: "fp8_e5m2",
    }[cache.k_pages.dtype]


def append_token(
    cache: PagedKVCache,
    new_k: jax.Array,  # (batch, n_kv_heads, d)
    new_v: jax.Array,
    page_table: jax.Array,  # (batch, pages_max) int32
    lengths: jax.Array,  # (batch,) int32: current length BEFORE the append
) -> PagedKVCache:
    """Write one token per sequence at its next slot. Jit-friendly."""
    batch = new_k.shape[0]
    ps = cache.page_size
    method = _quant_method(cache)
    page_pos = lengths // ps  # (batch,)
    slot = lengths % ps
    page_ids = jnp.take_along_axis(
        page_table, page_pos[:, None], axis=1
    )[:, 0]  # (batch,)

    def write(pages, scales, x):
        # x: (batch, n_kv_heads, d)
        if method is None:
            payload = x.astype(pages.dtype)
            scale = None
        else:
            qmax = qz.QUANT_MAX[method]
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
            scale = jnp.where(amax == 0.0, 1.0, amax / qmax)  # (batch, h)
            payload = x.astype(jnp.float32) / scale[..., None]
            if method == "int8":
                payload = jnp.clip(jnp.round(payload), -127, 127)
            payload = payload.astype(pages.dtype)
        # scatter: pages[h, page_ids[b], slot[b]] = payload[b, h]
        pages = pages.at[:, page_ids, slot].set(
            jnp.swapaxes(payload, 0, 1)
        )
        if scales is not None:
            scales = scales.at[:, page_ids, 0, slot].set(
                jnp.swapaxes(scale, 0, 1)
            )
        return pages, scales

    k_pages, k_scales = write(cache.k_pages, cache.k_scales, new_k)
    v_pages, v_scales = write(cache.v_pages, cache.v_scales, new_v)
    return PagedKVCache(k_pages, v_pages, k_scales, v_scales)


def write_prompt(
    cache: PagedKVCache,
    k: jax.Array,  # (prompt_len, n_kv_heads, d)
    v: jax.Array,
    page_ids: jax.Array,  # (ceil(prompt_len/page_size),) int32
) -> PagedKVCache:
    """Prefill: write a whole prompt's K/V into its assigned pages."""
    ps = cache.page_size
    n_pages = page_ids.shape[0]
    total = n_pages * ps
    method = _quant_method(cache)

    def write(pages, scales, x):
        pad = total - x.shape[0]
        xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        # (total, h, d) -> (h, n_pages, ps, d)
        xp = jnp.transpose(xp, (1, 0, 2)).reshape(
            x.shape[1], n_pages, ps, x.shape[2]
        )
        if method is None:
            pages = pages.at[:, page_ids].set(xp.astype(pages.dtype))
            return pages, scales
        payload, scale = qz.quantize_pages(xp, method)
        pages = pages.at[:, page_ids].set(payload.astype(pages.dtype))
        scales = scales.at[:, page_ids].set(scale)
        return pages, scales

    k_pages, k_scales = write(cache.k_pages, cache.k_scales, k)
    v_pages, v_scales = write(cache.v_pages, cache.v_scales, v)
    return PagedKVCache(k_pages, v_pages, k_scales, v_scales)


class PageAllocator:
    """Host-side physical-page bookkeeping for continuous batching."""

    def __init__(self, num_pages: int, page_size: int, pages_per_seq: int,
                 reserved: int = 0):
        """``reserved`` low page ids are never handed out (the serving
        engine keeps page 0 as the scratch target of inactive batch
        slots)."""
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        self._free = list(range(num_pages - 1, reserved - 1, -1))
        self._owned: dict[int, list[int]] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def can_admit(self, prompt_len: int) -> bool:
        need = (prompt_len + self.page_size - 1) // self.page_size
        return len(self._free) >= need

    def alloc(self, seq_id: int, prompt_len: int) -> list[int]:
        need = (prompt_len + self.page_size - 1) // self.page_size
        if need > self.pages_per_seq:
            raise ValueError(
                f"prompt of {prompt_len} tokens exceeds pages_per_seq"
            )
        if len(self._free) < need:
            raise RuntimeError("out of KV-cache pages")
        pages = [self._free.pop() for _ in range(need)]
        self._owned[seq_id] = pages
        return pages

    def extend(self, seq_id: int, new_length: int) -> int | None:
        """Ensure capacity for new_length tokens; returns a newly assigned
        page id if one was needed."""
        pages = self._owned[seq_id]
        need = (new_length + self.page_size - 1) // self.page_size
        if need <= len(pages):
            return None
        if need > self.pages_per_seq:
            raise RuntimeError("sequence exceeded pages_per_seq")
        if not self._free:
            raise RuntimeError("out of KV-cache pages")
        page = self._free.pop()
        pages.append(page)
        return page

    def release(self, seq_id: int) -> None:
        self._free.extend(reversed(self._owned.pop(seq_id)))

    def table_row(self, seq_id: int) -> list[int]:
        pages = self._owned[seq_id]
        return pages + [0] * (self.pages_per_seq - len(pages))
