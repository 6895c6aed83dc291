"""Vision Transformer on FlashMHA — the reference's 2D-rotary showcase.

The reference names ViT as an integration target (reference README.md:145)
and ships ``RotaryEmbedding2D`` specifically for ViT-style square token
grids (reference flash_attn/rotary.py:103-135: head dim split in half, 1D
rotary applied along each spatial axis). This model exercises that path:
patch embedding -> pre-LN transformer blocks with non-causal FlashMHA and
2D rotary position encoding over the sqrt(S) x sqrt(S) patch grid ->
mean-pool classification head.

Mean pooling (no CLS token) keeps the sequence a perfect square, which the
2D rotary grid requires; set ``use_rotary=False`` for learned positional
embeddings instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from flash_attn_tpu.models.modules import FlashMHA


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    num_classes: int = 1000
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    mlp_ratio: int = 4
    dropout: float = 0.0
    use_rotary: bool = True  # 2D rotary over the patch grid
    dtype: Optional[jnp.dtype] = None

    @property
    def grid(self) -> int:
        assert self.image_size % self.patch_size == 0
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid

    @classmethod
    def tiny(cls, **kw):
        kw.setdefault("image_size", 32)
        kw.setdefault("patch_size", 4)
        kw.setdefault("num_classes", 10)
        kw.setdefault("n_layer", 2)
        kw.setdefault("n_head", 4)
        kw.setdefault("n_embd", 128)
        return cls(**kw)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.cfg
        h = nn.LayerNorm(name="ln1")(x)
        h = FlashMHA(
            embed_dim=c.n_embd,
            num_heads=c.n_head,
            attention_dropout=c.dropout,
            causal=False,
            use_rotary_emb="2d" if c.use_rotary else None,
            dtype=c.dtype,
            name="attn",
        )(h, deterministic=deterministic)
        x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(c.mlp_ratio * c.n_embd, dtype=c.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.n_embd, dtype=c.dtype, name="fc2")(h)
        return x + nn.Dropout(c.dropout)(h, deterministic=deterministic)


class ViTClassifier(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images, deterministic=True):
        """images: (b, H, W, C) -> (b, num_classes) logits."""
        c = self.cfg
        b, hh, ww, _ = images.shape
        assert hh == ww == c.image_size, (images.shape, c.image_size)
        x = nn.Conv(
            c.n_embd,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=c.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(b, c.seq_len, c.n_embd)
        if not c.use_rotary:
            x = x + self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, c.seq_len, c.n_embd),
            ).astype(x.dtype)
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        for i in range(c.n_layer):
            x = ViTBlock(c, name=f"block_{i}")(x, deterministic=deterministic)
        x = nn.LayerNorm(name="ln_final")(x)
        return nn.Dense(c.num_classes, name="head")(x.mean(axis=1))


def make_train_step(model: ViTClassifier, optimizer: optax.GradientTransformation):
    def loss_fn(params, batch, dropout_key):
        logits = model.apply(
            params,
            batch["images"],
            deterministic=False,
            rngs={"dropout": dropout_key},
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, batch["labels"][:, None], axis=-1)
        return -jnp.mean(ll)

    def train_step(params, opt_state, batch, dropout_key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, dropout_key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step
