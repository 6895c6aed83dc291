"""BERT encoder on FlashMHA — the reference's flagship integration.

The reference's headline deployment is BERT (MLPerf 2.0 winning submission,
reference README.md:9; BERT/GPT2/ViT integration README.md:145), where its
varlen path shines: unpad once, run attention on packed tokens, re-pad
(reference flash_attn/bert_padding.py). The TPU-native equivalent keeps
the batch padded and masks inside the kernel via segment ids derived from
the attention mask — no gather/scatter round trip (modules.py FlashMHA
``key_padding_mask`` path) — which is the idiomatic encoding for static
XLA shapes.

Standard post-LayerNorm BERT-base architecture; masked-LM head with tied
decoder weights plus a pooler for classification.
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
class BertConfig:
    vocab_size: int = 30522
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: Optional[jnp.dtype] = None

    @classmethod
    def base(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw):
        kw.setdefault("vocab_size", 1024)
        kw.setdefault("n_layer", 2)
        kw.setdefault("n_head", 4)
        kw.setdefault("n_embd", 128)
        kw.setdefault("intermediate_size", 256)
        kw.setdefault("max_position_embeddings", 256)
        return cls(**kw)


class BertEmbeddings(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic=True):
        c = self.cfg
        s = input_ids.shape[1]
        x = nn.Embed(c.vocab_size, c.n_embd, name="word_embeddings")(input_ids)
        x = x + nn.Embed(
            c.max_position_embeddings, c.n_embd, name="position_embeddings"
        )(jnp.arange(s, dtype=jnp.int32)[None])
        x = x + nn.Embed(
            c.type_vocab_size, c.n_embd, name="token_type_embeddings"
        )(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm")(x)
        return nn.Dropout(c.dropout)(x, deterministic=deterministic)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attention_mask, deterministic=True):
        c = self.cfg
        # Post-LN (original BERT): sublayer -> dropout -> add -> LN.
        a = FlashMHA(
            embed_dim=c.n_embd,
            num_heads=c.n_head,
            attention_dropout=c.dropout,
            causal=False,
            dtype=c.dtype,
            name="attention",
        )(x, key_padding_mask=attention_mask, deterministic=deterministic)
        a = nn.Dropout(c.dropout)(a, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_ln")(x + a)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.n_embd, dtype=c.dtype, name="output")(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln")(x + h)


class BertModel(nn.Module):
    """Encoder stack; returns (sequence_output, pooled_output)."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids,  # (b, s) int32
        attention_mask=None,  # (b, s) 1 = real token, 0 = padding
        token_type_ids=None,
        deterministic=True,
    ):
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if attention_mask is not None:
            attention_mask = attention_mask.astype(bool)
        x = BertEmbeddings(c, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic
        )
        for i in range(c.n_layer):
            x = BertLayer(c, name=f"layer_{i}")(
                x, attention_mask, deterministic=deterministic
            )
        pooled = nn.tanh(nn.Dense(c.n_embd, name="pooler")(x[:, 0]))
        return x, pooled


class BertForMaskedLM(nn.Module):
    """MLM transform + decoder head over the encoder."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        deterministic=True,
    ):
        c = self.cfg
        x, _ = BertModel(c, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic
        )
        x = nn.Dense(c.n_embd, name="transform")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="transform_ln")(x)
        return nn.Dense(c.vocab_size, name="decoder")(x)


def mlm_loss(logits, labels, label_mask):
    """Cross entropy over positions where label_mask is 1."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = label_mask.astype(jnp.float32)
    return -(ll * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_train_step(model: BertForMaskedLM, optimizer: optax.GradientTransformation):
    """MLM train step: batch = input_ids, attention_mask, labels, label_mask."""

    def loss_fn(params, batch, dropout_key):
        logits = model.apply(
            params,
            batch["input_ids"],
            attention_mask=batch.get("attention_mask"),
            deterministic=False,
            rngs={"dropout": dropout_key},
        )
        return mlm_loss(logits, batch["labels"], batch["label_mask"])

    def train_step(params, opt_state, batch, dropout_key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, dropout_key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step
