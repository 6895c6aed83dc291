"""Drop-in attention modules (flax.linen).

Parity layer for the reference's ``flash_attn/flash_attention.py``:
``FlashAttention`` (inner attention over packed qkv) and ``FlashMHA``
(fused Wqkv -> optional rotary -> flash attention -> out_proj). The three
input modes of the reference module (flash_attention.py:27-72) map to:

  - padded (B, S, 3, H, D), no mask  -> dense kernel directly (the
    reference synthesizes an arange cu_seqlens; unnecessary here)
  - padded + key_padding_mask (B, S) -> segment-id masking inside the
    kernel — NO unpad/gather/re-pad round trip (TPU-idiomatic replacement
    of the bert_padding path)
  - packed (nnz, 3, H, D) + cu_seqlens -> the varlen interface

Differences by design: dtype is not restricted to fp16 (bf16/f32 are the
TPU dtypes); dropout takes its seed from the flax 'dropout' RNG collection;
head_dim may be any multiple of 8 (the kernel pads internally) though 64
and 128 are the fast paths.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.interface import flash_attn_unpadded_qkvpacked_func
from flash_attn_tpu.ops.packing import make_segment_ids_from_mask
from flash_attn_tpu.ops.rotary import RotaryEmbedding, RotaryEmbedding2D


def _seed_from_rng_key(key: jax.Array) -> jax.Array:
    """Fold a JAX PRNG key into the uint32 dropout seed the kernels take."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    seed = data[0]
    for i in range(1, data.shape[0]):
        seed = seed ^ data[i]
    return seed


class FlashAttention(nn.Module):
    """Inner scaled-dot-product attention over packed qkv
    (reference flash_attention.py:12-72)."""

    softmax_scale: Optional[float] = None
    attention_dropout: float = 0.0
    block_sizes: Optional[BlockSizes] = None
    # Sliding-window (left, right) band; None entries unbounded. See
    # ops.attention.flash_attention. Dense/padded modes only.
    window_size: Optional[tuple] = None
    # ALiBi: True -> standard geometric slopes per head; or an explicit
    # (h,) array. Dense/padded modes only.
    use_alibi: bool = False
    alibi_slopes: Optional[jax.Array] = None
    # Logit soft-capping: scaled scores pass through cap*tanh(s/cap)
    # (Gemma-2 style). See ops.attention.flash_attention.
    softcap: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        qkv: jax.Array,
        key_padding_mask: jax.Array | None = None,
        causal: bool = False,
        cu_seqlens: jax.Array | None = None,
        max_s: int | None = None,
        deterministic: bool = True,
    ):
        dropout_p = 0.0 if deterministic else self.attention_dropout
        seed = None
        if dropout_p > 0.0:
            seed = _seed_from_rng_key(self.make_rng("dropout"))

        slopes = self.alibi_slopes
        if self.use_alibi and slopes is None:
            from flash_attn_tpu.ops.attention import alibi_slopes as mk
            slopes = mk(qkv.shape[-2])

        if cu_seqlens is not None:
            assert qkv.ndim == 4, "packed qkv must be (nnz, 3, h, d)"
            if max_s is None:
                raise ValueError("cu_seqlens requires max_s")
            if self.window_size is not None:
                raise ValueError(
                    "window_size is not supported on the cu_seqlens path; "
                    "use the padded mode (segment-id masking) instead"
                )
            if slopes is not None:
                raise ValueError(
                    "ALiBi is not supported on the cu_seqlens path; "
                    "use the padded mode (segment-id masking) instead"
                )
            return flash_attn_unpadded_qkvpacked_func(
                qkv, cu_seqlens, max_s, dropout_p,
                softmax_scale=self.softmax_scale, causal=causal,
                dropout_seed=seed, block_sizes=self.block_sizes,
            )

        assert qkv.ndim == 5, "padded qkv must be (b, s, 3, h, d)"
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        seg = pos = None
        if key_padding_mask is not None:
            seg, pos = make_segment_ids_from_mask(key_padding_mask)
        return flash_attention(
            q, k, v,
            causal=causal,
            softmax_scale=self.softmax_scale,
            q_segment_ids=seg,
            kv_segment_ids=seg,
            q_positions=pos,
            kv_positions=pos,
            dropout_p=dropout_p,
            dropout_seed=seed,
            block_sizes=self.block_sizes,
            window_size=self.window_size,
            alibi_slopes=slopes,
            softcap=self.softcap,
        )


class FlashMHA(nn.Module):
    """Multi-head attention block (reference flash_attention.py:75-115):
    fused Wqkv -> optional rotary (1d/2d) -> flash attention -> out_proj."""

    embed_dim: int
    num_heads: int
    num_kv_heads: Optional[int] = None  # GQA/MQA (TPU-native extension)
    bias: bool = True
    attention_dropout: float = 0.0
    causal: bool = False
    use_rotary_emb: Optional[str] = None  # None | '1d' | '2d'
    softmax_scale: Optional[float] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    block_sizes: Optional[BlockSizes] = None
    window_size: Optional[tuple] = None  # sliding-window (left, right)
    use_alibi: bool = False  # standard geometric per-head ALiBi slopes
    softcap: Optional[float] = None  # logit soft-capping (Gemma-2 style)

    def setup(self):
        if self.embed_dim % self.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")
        head_dim = self.embed_dim // self.num_heads
        if head_dim % 8 != 0:
            raise ValueError(f"head_dim must be a multiple of 8, got {head_dim}")
        if self.use_rotary_emb not in (None, "1d", "2d"):
            raise ValueError(f"use_rotary_emb: {self.use_rotary_emb}")
        kv_heads = self.num_kv_heads or self.num_heads
        if self.num_heads % kv_heads != 0:
            raise ValueError(
                f"num_heads {self.num_heads} must be a multiple of"
                f" num_kv_heads {kv_heads}"
            )
        self.kv_heads = kv_heads
        self.head_dim = head_dim
        if self.use_rotary_emb == "1d":
            self.rotary_emb = RotaryEmbedding(head_dim)
        elif self.use_rotary_emb == "2d":
            self.rotary_emb = RotaryEmbedding2D(head_dim)
        self.Wqkv = nn.Dense(
            (self.num_heads + 2 * kv_heads) * head_dim,
            use_bias=self.bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="Wqkv",
        )
        self.inner_attn = FlashAttention(
            softmax_scale=self.softmax_scale,
            attention_dropout=self.attention_dropout,
            block_sizes=self.block_sizes,
            window_size=self.window_size,
            use_alibi=self.use_alibi,
            softcap=self.softcap,
        )
        self.out_proj = nn.Dense(
            self.embed_dim, use_bias=self.bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="out_proj",
        )

    def __call__(
        self,
        x: jax.Array,  # (batch, seqlen, embed_dim)
        key_padding_mask: jax.Array | None = None,
        deterministic: bool = True,
    ):
        b, s, _ = x.shape
        hq, hkv, hd = self.num_heads, self.kv_heads, self.head_dim
        qkv = self.Wqkv(x)
        if hkv == hq:
            qkv = qkv.reshape(b, s, 3, hq, hd)
            if self.use_rotary_emb:
                q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                q, k = self.rotary_emb(q, k, seq_dimension=-3)
                qkv = jnp.stack([q, k, v], axis=2)
            context = self.inner_attn(
                qkv,
                key_padding_mask=key_padding_mask,
                causal=self.causal,
                deterministic=deterministic,
            )
            return self.out_proj(context.reshape(b, s, self.embed_dim))

        # GQA/MQA: grouped kv heads flow to the kernel directly.
        q = qkv[..., : hq * hd].reshape(b, s, hq, hd)
        k = qkv[..., hq * hd : (hq + hkv) * hd].reshape(b, s, hkv, hd)
        v = qkv[..., (hq + hkv) * hd :].reshape(b, s, hkv, hd)
        if self.use_rotary_emb:
            q, k = self.rotary_emb(q, k, seq_dimension=-3)
        dropout_p = 0.0 if deterministic else self.attention_dropout
        seed = None
        if dropout_p > 0.0:
            seed = _seed_from_rng_key(self.make_rng("dropout"))
        seg = pos = None
        if key_padding_mask is not None:
            seg, pos = make_segment_ids_from_mask(key_padding_mask)
        slopes = None
        if self.use_alibi:
            from flash_attn_tpu.ops.attention import alibi_slopes as mk
            slopes = mk(hq)
        context = flash_attention(
            q, k, v,
            causal=self.causal,
            softmax_scale=self.softmax_scale,
            q_segment_ids=seg,
            kv_segment_ids=seg,
            q_positions=pos,
            kv_positions=pos,
            dropout_p=dropout_p,
            dropout_seed=seed,
            block_sizes=self.block_sizes,
            window_size=self.window_size,
            alibi_slopes=slopes,
            softcap=self.softcap,
        )
        return self.out_proj(context.reshape(b, s, self.embed_dim))
