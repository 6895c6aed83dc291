"""Llama-family model: forward/loss/train, GQA + rotary + window, and
logits equality against transformers' LlamaForCausalLM (random-init tiny
config — no network)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flash_attn_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    convert_hf_llama_state_dict,
    llama_config_from_hf,
    make_train_step,
)
from flash_attn_tpu.models.gpt2 import cross_entropy_loss


def _tiny():
    return LlamaConfig.tiny()


def test_forward_and_loss():
    cfg = _tiny()
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 128)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 128, cfg.vocab_size)
    loss = cross_entropy_loss(logits, ids)
    assert abs(float(loss) - np.log(cfg.vocab_size)) < 0.5


def test_train_step_reduces_loss():
    cfg = _tiny()
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 128)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids}
    params = model.init(jax.random.PRNGKey(0), ids)
    opt = optax.adamw(2e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(model, opt))
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses


def test_chunked_loss_matches_full():
    cfg = _tiny()
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 96)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids.at[:, 30:40].set(-100)}
    params = model.init(jax.random.PRNGKey(0), ids)
    opt = optax.adamw(1e-3)
    s_full = make_train_step(model, opt)
    s_chunk = make_train_step(model, opt, lm_loss_chunk=40)
    st = opt.init(params)
    _, _, l0 = s_full(params, st, batch)
    _, _, l1 = s_chunk(params, st, batch)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)


def test_window_matches_dense_within_band():
    """With window >= seqlen the windowed model equals the dense one."""
    import dataclasses

    cfg = _tiny()
    cfg_w = dataclasses.replace(cfg, window=cfg.max_position_embeddings)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 128)), jnp.int32)
    m0, m1 = LlamaForCausalLM(cfg), LlamaForCausalLM(cfg_w)
    params = m0.init(jax.random.PRNGKey(0), ids)
    np.testing.assert_allclose(
        np.asarray(m0.apply(params, ids)), np.asarray(m1.apply(params, ids)),
        atol=1e-5, rtol=1e-5,
    )


def test_remat_matches_no_remat():
    import dataclasses

    cfg = _tiny()
    cfg_r = dataclasses.replace(cfg, remat=True)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 128)), jnp.int32)
    base, rem = LlamaForCausalLM(cfg), LlamaForCausalLM(cfg_r)
    params = base.init(jax.random.PRNGKey(0), ids)
    np.testing.assert_allclose(
        np.asarray(rem.apply(params, ids)),
        np.asarray(base.apply(params, ids)),
        atol=1e-5, rtol=1e-5,
    )


def test_hf_llama_equivalence():
    """Random-init transformers LlamaForCausalLM (GQA config) vs this
    module after weight conversion: logits must agree to fp32 tolerance.
    Covers the rotary convention, RMSNorm, SwiGLU, GQA head mapping, and
    the untied LM head in one shot."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=352,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = llama_config_from_hf(hf_cfg, dtype=jnp.float32,
                               param_dtype=jnp.float32)
    params = convert_hf_llama_state_dict(hf.state_dict(), cfg)
    model = LlamaForCausalLM(cfg)

    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, (2, 64))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
