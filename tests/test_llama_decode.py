"""Llama decode path: teacher-forcing equality (GQA + rotary + RMSNorm +
SwiGLU against the paged cache) and the model-agnostic serving engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models import llama_decode
from flash_attn_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from flash_attn_tpu.models.llama_decode import decode_step, prefill
from flash_attn_tpu.serving.cache import init_cache, write_prompt
from flash_attn_tpu.serving.engine import ServingEngine


def _setup(dtype=jnp.float32, **kw):
    cfg = LlamaConfig.tiny(dtype=dtype, **kw)
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    return cfg, model, params


def test_prefill_matches_forward():
    cfg, model, params = _setup()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 48)), jnp.int32)
    logits_full = model.apply(params, ids)
    logits_pre, ks, vs = prefill(params, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, -1]),
        atol=2e-4, rtol=1e-4,
    )
    assert len(ks) == cfg.n_layer
    assert ks[0].shape == (2, 48, cfg.n_kv_head, cfg.head_dim)


@pytest.mark.parametrize("quantization", [None, "int8"])
def test_decode_matches_forward_teacher_forcing(quantization):
    """prefill + N decode steps reproduce the full forward's logits —
    the cached post-rotary GQA keys must line up with training-path
    rotary exactly."""
    cfg, model, params = _setup()
    rng = np.random.default_rng(2)
    prompt_len, n_decode = 40, 8
    total = prompt_len + n_decode
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, total)), jnp.int32)
    logits_full = model.apply(params, ids)

    page_size, pages = 128, 4
    caches = [
        init_cache(cfg.n_kv_head, pages, page_size, cfg.head_dim,
                   dtype=jnp.float32, quantization=quantization)
        for _ in range(cfg.n_layer)
    ]
    logits_pre, ks, vs = prefill(params, cfg, ids[:, :prompt_len])
    page_ids = jnp.asarray([1], jnp.int32)
    for li in range(cfg.n_layer):
        caches[li] = write_prompt(caches[li], ks[li][0], vs[li][0], page_ids)
    table = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    tol = 2e-3 if quantization is None else 0.15
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, prompt_len - 1]),
        atol=2e-3, rtol=1e-3,
    )
    lengths = jnp.asarray([prompt_len], jnp.int32)
    for t in range(n_decode):
        logits, caches = decode_step(
            params, cfg, caches, table, lengths, ids[:, prompt_len + t]
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_full[:, prompt_len + t]),
            atol=tol, rtol=tol, err_msg=f"decode step {t}",
        )
        lengths = lengths + 1


def test_windowed_decode_matches_forward():
    """Mistral-style sliding window: windowed decode against the paged
    cache must match the windowed training forward (band masks agree
    between the fused kernel and rolling-KV decode)."""
    cfg, model, params = _setup(window=32)
    rng = np.random.default_rng(3)
    prompt_len, n_decode = 48, 6
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (1, prompt_len + n_decode)),
        jnp.int32,
    )
    logits_full = model.apply(params, ids)
    caches = [
        init_cache(cfg.n_kv_head, 4, 128, cfg.head_dim, dtype=jnp.float32)
        for _ in range(cfg.n_layer)
    ]
    _, ks, vs = prefill(params, cfg, ids[:, :prompt_len])
    for li in range(cfg.n_layer):
        caches[li] = write_prompt(
            caches[li], ks[li][0], vs[li][0], jnp.asarray([1], jnp.int32)
        )
    table = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    lengths = jnp.asarray([prompt_len], jnp.int32)
    for t in range(n_decode):
        logits, caches = decode_step(
            params, cfg, caches, table, lengths, ids[:, prompt_len + t]
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_full[:, prompt_len + t]),
            atol=2e-3, rtol=2e-3, err_msg=f"windowed decode step {t}",
        )
        lengths = lengths + 1


def test_engine_with_llama_adapter():
    """The model-agnostic ServingEngine drives the Llama family end to
    end (submit -> prefill -> decode -> finish) via model_fns."""
    cfg, model, params = _setup()
    eng = ServingEngine(
        params, cfg, max_batch=2, num_pages=9, page_size=128,
        pages_per_seq=2, model_fns=llama_decode,
    )
    rng = np.random.default_rng(4)
    prompt = [int(t) for t in rng.integers(0, cfg.vocab_size, 20)]
    eng.submit(prompt, max_new_tokens=4)
    done = eng.run()
    assert len(done) == 1
    out = done[0].generated
    assert len(out) == 4

    # greedy engine output == greedy teacher-forced argmax of the model
    seq = list(prompt)
    for _ in range(4):
        logits = model.apply(
            params, jnp.asarray([seq], jnp.int32)
        )[0, -1]
        nxt = int(jnp.argmax(logits))
        seq.append(nxt)
    assert out == seq[len(prompt):], (out, seq[len(prompt):])


def test_engine_llama_chunked_prefill():
    """Chunked prefill through the Llama adapter: global rotary offsets
    make chunked == single-shot admission."""
    cfg, model, params = _setup()
    rng = np.random.default_rng(5)
    prompt = [int(t) for t in rng.integers(0, cfg.vocab_size, 200)]

    outs = []
    for chunk in (None, 128):
        eng = ServingEngine(
            params, cfg, max_batch=2, num_pages=9, page_size=128,
            pages_per_seq=3, model_fns=llama_decode, prefill_chunk=chunk,
        )
        eng.submit(list(prompt), max_new_tokens=3)
        done = eng.run()
        outs.append(done[0].generated)
    assert outs[0] == outs[1], outs
