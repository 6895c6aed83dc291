"""Blocksparse attention modules (reference flash_blocksparse_attention.py).

``FlashBlocksparseAttention`` / ``FlashBlocksparseMHA`` with the reference's
structure: a sparsity layout built once at ``max_seq_length`` rounded to 256
(reference :32-36), sliced per call to the actual sequence length
(reference :59-61). Instead of hydra-instantiated DeepSpeed sparsity
configs (reference :27), ``sparsity_config`` is any object exposing
``make_layout(seqlen) -> (seqlen/16, seqlen/256) 0/1 array`` — e.g. the
``LocalGlobalSparsityConfig`` below — or a raw mask array.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.blocksparse import COL_CELL, ROW_CELL
from flash_attn_tpu.models.modules import _seed_from_rng_key
from flash_attn_tpu.ops.blocksparse import blocksparse_attention, build_layout


class LocalGlobalSparsityConfig:
    """Sliding-window + global-token block layout (BigBird/Longformer style,
    standing in for the reference's DeepSpeed sparsity configs)."""

    def __init__(self, window: int = 512, num_global_cols: int = 1,
                 num_global_rows: int = 16):
        self.window = window
        self.num_global_cols = num_global_cols
        self.num_global_rows = num_global_rows

    def make_layout(self, seqlen: int) -> np.ndarray:
        nrow = (seqlen + ROW_CELL - 1) // ROW_CELL
        ncol = (seqlen + COL_CELL - 1) // COL_CELL
        rows = np.arange(nrow)[:, None] * ROW_CELL
        cols = np.arange(ncol)[None, :] * COL_CELL
        local = np.abs(rows - cols) <= self.window
        layout = local.astype(bool)
        layout[:, : self.num_global_cols] = True
        layout[: self.num_global_rows, :] = True
        return layout


@functools.lru_cache(maxsize=64)
def _cached_layout(mask_bytes, shape, sq, sk, block_q, causal):
    mask = np.frombuffer(mask_bytes, dtype=bool).reshape(shape)
    return build_layout(mask, sq=sq, sk=sk, block_q=block_q, causal=causal)


class FlashBlocksparseAttention(nn.Module):
    """Inner blocksparse attention (reference :14-104)."""

    sparsity_config: Any
    softmax_temp: Optional[float] = None
    attention_dropout: float = 0.0
    max_seq_length: int = 2048
    block_q: int = 128

    def _full_mask(self) -> np.ndarray:
        max_s = ((self.max_seq_length + 255) // 256) * 256
        sc = self.sparsity_config
        if hasattr(sc, "make_layout"):
            return np.asarray(sc.make_layout(max_s)).astype(bool)
        return np.asarray(sc).astype(bool)

    @nn.compact
    def __call__(
        self,
        qkv: jax.Array,  # (b, s, 3, h, d)
        key_padding_mask: jax.Array | None = None,
        causal: bool = False,
        deterministic: bool = True,
    ):
        b, s = qkv.shape[:2]
        full = self._full_mask()
        s_rounded = ((s + 255) // 256) * 256
        nrow, ncol = s_rounded // ROW_CELL, s_rounded // COL_CELL
        assert nrow <= full.shape[0] and ncol <= full.shape[1], (
            f"seqlen {s} exceeds max_seq_length {self.max_seq_length}"
        )
        mask = np.ascontiguousarray(full[:nrow, :ncol])
        layout = _cached_layout(
            mask.tobytes(), mask.shape, s, s, self.block_q, causal
        )
        dropout_p = 0.0 if deterministic else self.attention_dropout
        seed = None
        if dropout_p > 0.0:
            seed = _seed_from_rng_key(self.make_rng("dropout"))
        return blocksparse_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], layout,
            causal=causal,
            softmax_scale=self.softmax_temp,
            key_padding_mask=key_padding_mask,
            dropout_p=dropout_p,
            dropout_seed=seed,
            block_q=self.block_q,
        )


class FlashBlocksparseMHA(nn.Module):
    """MHA block with blocksparse inner attention (reference :107-136)."""

    embed_dim: int
    num_heads: int
    sparsity_config: Any
    bias: bool = True
    attention_dropout: float = 0.0
    causal: bool = False
    max_seq_length: int = 2048
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: jax.Array | None = None,
        deterministic: bool = True,
    ):
        b, s, _ = x.shape
        if self.embed_dim % self.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")
        hd = self.embed_dim // self.num_heads
        qkv = nn.Dense(
            3 * self.embed_dim, use_bias=self.bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="Wqkv",
        )(x)
        qkv = qkv.reshape(b, s, 3, self.num_heads, hd)
        ctx = FlashBlocksparseAttention(
            sparsity_config=self.sparsity_config,
            attention_dropout=self.attention_dropout,
            max_seq_length=self.max_seq_length,
            name="inner_attn",
        )(qkv, key_padding_mask=key_padding_mask, causal=self.causal,
          deterministic=deterministic)
        ctx = ctx.reshape(b, s, self.embed_dim)
        return nn.Dense(
            self.embed_dim, use_bias=self.bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="out_proj",
        )(ctx)
