"""HuggingFace GPT-2 checkpoint interop.

Converts a ``transformers`` GPT-2 checkpoint (torch ``GPT2LMHeadModel``
state dict, or the model itself) into this framework's parameter pytree so
pretrained weights run through the flash-attention training model
(`models/gpt2.py`), the paged decode path (`models/gpt2_decode.py`), and
the serving engine unchanged.

Layout facts the mapping relies on (verified by tests/test_hf_convert.py
logit equivalence):
  - HF ``Conv1D`` stores weights as (in_features, out_features) — the same
    orientation as a flax ``Dense`` kernel, so no transposes anywhere.
  - HF ``c_attn`` packs its output dim as [q | k | v], each head-major
    (h, d) — exactly the (3, h, d) reshape our FlashMHA applies to Wqkv.
  - The LM head is weight-tied to ``wte`` in both.
  - HF GELU is the tanh approximation ("gelu_new"); flax ``nn.gelu``
    defaults to the same.
  - LayerNorm epsilon is 1e-5 (``GPT2Config.layer_norm_epsilon``).

The reference has no checkpoint story (its models live outside the repo,
README.md:145); this is part of the end-to-end model-family surface.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt2 import GPT2Config


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor, no torch import needed
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def gpt2_config_from_hf(hf_config, **overrides) -> GPT2Config:
    """Build a ``GPT2Config`` from a ``transformers.GPT2Config``."""
    kw = dict(
        vocab_size=hf_config.vocab_size,
        max_position_embeddings=hf_config.n_positions,
        n_layer=hf_config.n_layer,
        n_head=hf_config.n_head,
        n_embd=hf_config.n_embd,
        layer_norm_epsilon=hf_config.layer_norm_epsilon,
    )
    kw.update(overrides)
    return GPT2Config(**kw)


def convert_hf_gpt2_state_dict(
    state_dict: Mapping[str, Any], cfg: GPT2Config
) -> dict:
    """torch ``GPT2LMHeadModel.state_dict()`` -> flax params pytree.

    Accepts torch tensors or numpy arrays; keys may carry the
    ``transformer.`` prefix or not. Returns ``{"params": {...}}`` ready for
    ``GPT2LMHeadModel(cfg).apply``.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        sd[k] = v
    missing = [k for k in ("wte.weight", "wpe.weight") if k not in sd]
    if missing:
        raise ValueError(f"state dict missing {missing}; is this a GPT-2?")

    pd = lambda a: jnp.asarray(_np(a), cfg.param_dtype)

    def ln(prefix):
        return {"scale": pd(sd[f"{prefix}.weight"]),
                "bias": pd(sd[f"{prefix}.bias"])}

    def dense(prefix):
        return {"kernel": pd(sd[f"{prefix}.weight"]),
                "bias": pd(sd[f"{prefix}.bias"])}

    params = {
        "wte": pd(sd["wte.weight"][: cfg.vocab_size]),
        "wpe": pd(sd["wpe.weight"][: cfg.max_position_embeddings]),
        "ln_f": ln("ln_f"),
    }
    for i in range(cfg.n_layer):
        h = f"h.{i}"
        if f"{h}.ln_1.weight" not in sd:
            raise ValueError(
                f"state dict has no layer {i}; cfg.n_layer={cfg.n_layer}"
            )
        params[f"h_{i}"] = {
            "ln_1": ln(f"{h}.ln_1"),
            "ln_2": ln(f"{h}.ln_2"),
            "attn": {
                "Wqkv": dense(f"{h}.attn.c_attn"),
                "out_proj": dense(f"{h}.attn.c_proj"),
            },
            "mlp": {
                "c_fc": dense(f"{h}.mlp.c_fc"),
                "c_proj": dense(f"{h}.mlp.c_proj"),
            },
        }
    return {"params": params}


def load_hf_gpt2(model_or_state_dict, cfg: GPT2Config | None = None):
    """One-call interop: a ``transformers`` GPT-2 model (or its state
    dict + explicit cfg) -> (cfg, params) for this framework.

    >>> hf = transformers.GPT2LMHeadModel.from_pretrained("gpt2")
    >>> cfg, params = load_hf_gpt2(hf)
    >>> logits = GPT2LMHeadModel(cfg).apply(params, input_ids)
    """
    if hasattr(model_or_state_dict, "state_dict"):
        model = model_or_state_dict
        if cfg is None:
            cfg = gpt2_config_from_hf(model.config)
        return cfg, convert_hf_gpt2_state_dict(model.state_dict(), cfg)
    if cfg is None:
        raise ValueError("a raw state dict needs an explicit GPT2Config")
    return cfg, convert_hf_gpt2_state_dict(model_or_state_dict, cfg)
