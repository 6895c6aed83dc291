"""Llama-family causal LM (Llama 1/2/3, Mistral, TinyLlama geometry).

Modern-architecture flagship alongside GPT-2: RMSNorm, rotary position
embeddings (HF half-split convention), grouped-query attention, SwiGLU
MLP, untied LM head, and optional Mistral-style sliding-window attention
(``window``) riding the flash kernel's banded grid. The reference's
module layer exposes GPT-2/BERT/ViT training models (reference
README.md:145); this extends the same layer to the architecture family
that dominates current serving deployments — it is the end-to-end
exerciser for the GQA + rotary + window paths of the kernels.

HF interop: ``load_hf_llama`` / ``convert_hf_llama_state_dict`` map a
``transformers.LlamaForCausalLM`` (or Mistral) state dict onto this
module's parameter tree; tests/test_llama.py checks logits equality
against transformers on a randomly-initialized tiny config (no download).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from flash_attn_tpu.models.gpt2 import chunked_lm_loss
from flash_attn_tpu.ops.attention import flash_attention


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    n_layer: int = 32
    n_head: int = 32
    n_kv_head: int = 32  # < n_head => GQA (Llama-2-70B / Llama-3 / Mistral)
    n_embd: int = 4096
    intermediate_size: int = 11008
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    window: Optional[int] = None  # Mistral-style sliding-window attention
    window_sinks: int = 0  # StreamingLLM sinks for rolling-window serving
    dtype: object = jnp.bfloat16
    param_dtype: object = jnp.float32
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def n_kv_heads(self) -> int:  # engine-facing alias (GPT2Config parity)
        return self.n_kv_head

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=512, n_layer=2, n_head=4, n_kv_head=2, n_embd=128,
            intermediate_size=352, max_position_embeddings=256,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


# --- rotary, HF half-split convention (differs from ops/rotary.py's
# interleaved-pair NeoX layout; Llama checkpoints bake in this one) ---


def llama_rope_tables(positions, dim, base, dtype=jnp.float32):
    """cos/sin of shape positions.shape + (dim,), half-split layout."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half_split(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_llama_rope(x, cos, sin):
    """x: (..., s, h, d); cos/sin: (s, d) or (b, s, d)."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]  # (b, s, 1, d)
    sin = sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half_split(xf) * sin
    return out.astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps
        )
        return (y * w).astype(self.dtype)


class LlamaAttention(nn.Module):
    config: LlamaConfig
    attn_impl: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, positions, deterministic=True):
        cfg = self.config
        b, s, _ = x.shape
        hd = cfg.head_dim
        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name,
        )
        q = dense(cfg.n_head * hd, "q_proj")(x).reshape(b, s, cfg.n_head, hd)
        k = dense(cfg.n_kv_head * hd, "k_proj")(x).reshape(
            b, s, cfg.n_kv_head, hd)
        v = dense(cfg.n_kv_head * hd, "v_proj")(x).reshape(
            b, s, cfg.n_kv_head, hd)
        cos, sin = llama_rope_tables(positions, hd, cfg.rope_theta)
        q = apply_llama_rope(q, cos, sin)
        k = apply_llama_rope(k, cos, sin)
        if self.attn_impl is not None:
            ctx = self.attn_impl(q, k, v)
        else:
            ctx = flash_attention(
                q, k, v, causal=True,
                window_size=(
                    None if cfg.window is None else (cfg.window, 0)
                ),
            )
        return dense(cfg.n_embd, "o_proj")(ctx.reshape(b, s, -1))


class LlamaMlp(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name,
        )
        # SwiGLU: silu(gate) * up -> down
        g = dense(cfg.intermediate_size, "gate_proj")(x)
        u = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.n_embd, "down_proj")(jax.nn.silu(g) * u)


class LlamaBlock(nn.Module):
    config: LlamaConfig
    attn_impl: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, positions, deterministic=True):
        cfg = self.config
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_layernorm")(x)
        x = x + LlamaAttention(cfg, attn_impl=self.attn_impl, name="attn")(
            h, positions, deterministic
        )
        h = RMSNorm(
            cfg.rms_norm_eps, cfg.dtype, name="post_attention_layernorm"
        )(x)
        return x + LlamaMlp(cfg, name="mlp")(h)


class LlamaForCausalLM(nn.Module):
    config: LlamaConfig
    attn_impl: Optional[Callable] = None

    @nn.compact
    def __call__(self, input_ids, deterministic=True, positions=None,
                 return_hidden=False):
        cfg = self.config
        b, s = input_ids.shape
        wte = self.param(
            "wte", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.n_embd), cfg.param_dtype,
        )
        lm_head = self.param(
            "lm_head", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.n_embd), cfg.param_dtype,
        )
        if positions is None:
            positions = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None], (b, s)
            )
        x = wte[input_ids].astype(cfg.dtype)
        block_cls = LlamaBlock
        if cfg.remat:
            block_cls = nn.remat(LlamaBlock, static_argnums=(3,))
        for i in range(cfg.n_layer):
            x = block_cls(cfg, attn_impl=self.attn_impl, name=f"layers_{i}")(
                x, positions, deterministic
            )
        x = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="norm")(x)
        if return_hidden:
            return x, lm_head  # chunked_lm_loss streams x @ lm_head.T
        logits = jax.lax.dot_general(
            x.astype(cfg.dtype), lm_head.astype(cfg.dtype),
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return logits


def make_train_step(model: LlamaForCausalLM,
                    optimizer: optax.GradientTransformation,
                    lm_loss_chunk: Optional[int] = None):
    """train_step(params, opt_state, batch, key) -> (params, opt_state,
    loss); see models/gpt2.py make_train_step (same contract)."""
    from flash_attn_tpu.models.gpt2 import cross_entropy_loss

    def loss_fn(params, batch):
        if lm_loss_chunk is not None:
            x, head = model.apply(
                params, batch["input_ids"], return_hidden=True
            )
            return chunked_lm_loss(
                x, head, batch["labels"], chunk=lm_loss_chunk,
                dtype=model.config.dtype,
            )
        logits = model.apply(params, batch["input_ids"])
        return cross_entropy_loss(logits, batch["labels"])

    def train_step(params, opt_state, batch, dropout_key=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


# --------------------------------------------------------------------------
# HF interop (transformers LlamaForCausalLM / MistralForCausalLM)
# --------------------------------------------------------------------------


def llama_config_from_hf(hf_cfg, **overrides) -> LlamaConfig:
    kw = dict(
        vocab_size=hf_cfg.vocab_size,
        n_layer=hf_cfg.num_hidden_layers,
        n_head=hf_cfg.num_attention_heads,
        n_kv_head=getattr(
            hf_cfg, "num_key_value_heads", hf_cfg.num_attention_heads
        ),
        n_embd=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        rms_norm_eps=hf_cfg.rms_norm_eps,
        window=getattr(hf_cfg, "sliding_window", None),
    )
    kw.update(overrides)
    return LlamaConfig(**kw)


def convert_hf_llama_state_dict(sd, cfg: LlamaConfig, dtype=jnp.float32):
    """transformers state_dict (torch or numpy values) -> flax params."""

    def a(name):
        x = sd[name]
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    p = {
        "wte": a("model.embed_tokens.weight"),
        "norm": {"scale": a("model.norm.weight")},
        "lm_head": (
            a("lm_head.weight") if "lm_head.weight" in sd
            else a("model.embed_tokens.weight")  # tied (e.g. TinyLlama 1.1B)
        ),
    }
    for i in range(cfg.n_layer):
        hf = f"model.layers.{i}."
        p[f"layers_{i}"] = {
            "input_layernorm": {"scale": a(hf + "input_layernorm.weight")},
            "post_attention_layernorm": {
                "scale": a(hf + "post_attention_layernorm.weight")
            },
            "attn": {
                "q_proj": {"kernel": a(hf + "self_attn.q_proj.weight").T},
                "k_proj": {"kernel": a(hf + "self_attn.k_proj.weight").T},
                "v_proj": {"kernel": a(hf + "self_attn.v_proj.weight").T},
                "o_proj": {"kernel": a(hf + "self_attn.o_proj.weight").T},
            },
            "mlp": {
                "gate_proj": {"kernel": a(hf + "mlp.gate_proj.weight").T},
                "up_proj": {"kernel": a(hf + "mlp.up_proj.weight").T},
                "down_proj": {"kernel": a(hf + "mlp.down_proj.weight").T},
            },
        }
    return {"params": p}


def load_hf_llama(name_or_model, dtype=jnp.float32):
    """transformers checkpoint/model -> (LlamaConfig, params)."""
    if isinstance(name_or_model, str):
        from transformers import AutoModelForCausalLM

        hf = AutoModelForCausalLM.from_pretrained(name_or_model)
    else:
        hf = name_or_model
    cfg = llama_config_from_hf(hf.config)
    params = convert_hf_llama_state_dict(hf.state_dict(), cfg, dtype)
    return cfg, params
