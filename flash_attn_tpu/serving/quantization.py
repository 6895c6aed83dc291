"""KV-cache quantization: per-token int8 / fp8 payloads + fp32 scales.

The north-star serving config (BASELINE.json) runs bf16 weights with an
FP8/INT8 quantized KV cache whose scales are dequantized inside the
attention kernel (kernels/decode.py applies them to scores / P@V, so the
quantized payload feeds the MXU directly).

Scale granularity: one fp32 scale per token per kv head (amax over the
head dim) — finer than per-page, coarse enough to be free bandwidth-wise
(1 float per d=128 payload values). Scales are stored (..., 1, page_size)
so they land in TPU lanes without relayout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

QUANT_MAX = {
    "int8": 127.0,
    "fp8_e4m3": 448.0,
    "fp8_e5m2": 57344.0,
}

QUANT_DTYPE = {
    "int8": jnp.int8,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}


def quantize_tokens(x: jax.Array, method: str):
    """Quantize (..., tokens, d) to (payload (..., tokens, d),
    scales (..., 1, tokens)) with per-token amax scaling."""
    qmax = QUANT_MAX[method]
    qdtype = QUANT_DTYPE[method]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # (..., tokens)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax)
    payload = x.astype(jnp.float32) / scale[..., None]
    if method == "int8":
        payload = jnp.clip(jnp.round(payload), -127, 127)
    payload = payload.astype(qdtype)
    return payload, scale[..., None, :]  # (..., 1, tokens)


def quantize_pages(x: jax.Array, method: str):
    """(n_kv_heads, num_pages, page_size, d) -> (payload, scales
    (n_kv_heads, num_pages, 1, page_size))."""
    qmax = QUANT_MAX[method]
    qdtype = QUANT_DTYPE[method]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # (h, p, ps)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax)
    payload = x.astype(jnp.float32) / scale[..., None]
    if method == "int8":
        payload = jnp.clip(jnp.round(payload), -127, 127)
    return payload.astype(qdtype), scale[:, :, None, :]


def dequantize_pages(payload: jax.Array, scales: jax.Array) -> jax.Array:
    """Inverse of quantize_pages (test utility)."""
    return payload.astype(jnp.float32) * jnp.swapaxes(scales, -1, -2)
