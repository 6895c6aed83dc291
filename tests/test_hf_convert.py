"""HF GPT-2 checkpoint conversion: converted weights must reproduce the
torch transformers model's logits through our flash-attention GPT-2.

Uses a randomly initialized ``transformers`` model (no network); the
mapping is exercised end to end — embeddings, packed Wqkv ordering,
Conv1D orientation, GELU variant, LN epsilon, tied LM head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attn_tpu.models.convert import (
    convert_hf_gpt2_state_dict,
    gpt2_config_from_hf,
    load_hf_gpt2,
)
from flash_attn_tpu.models.gpt2 import GPT2LMHeadModel


def _hf_tiny():
    hf_cfg = transformers.GPT2Config(
        vocab_size=512,
        n_positions=128,
        n_embd=128,
        n_layer=2,
        n_head=4,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    return model


def test_logits_match_transformers():
    hf = _hf_tiny()
    cfg, params = load_hf_gpt2(hf)
    cfg = gpt2_config_from_hf(hf.config, dtype=jnp.float32)
    params = convert_hf_gpt2_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 64))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()

    ours = GPT2LMHeadModel(cfg).apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_load_hf_gpt2_defaults():
    hf = _hf_tiny()
    cfg, params = load_hf_gpt2(hf)
    assert cfg.vocab_size == 512 and cfg.n_layer == 2
    assert cfg.layer_norm_epsilon == hf.config.layer_norm_epsilon
    assert params["params"]["wte"].shape == (512, 128)
    assert params["params"]["h_1"]["attn"]["Wqkv"]["kernel"].shape == (
        128,
        384,
    )


def test_state_dict_requires_cfg():
    hf = _hf_tiny()
    with pytest.raises(ValueError, match="explicit GPT2Config"):
        load_hf_gpt2(hf.state_dict())


def test_converted_params_run_the_decode_engine():
    """Converted HF weights drive the serving engine, and its greedy
    generations match the HF model's own greedy decode."""
    from flash_attn_tpu.serving.engine import ServingEngine

    hf = _hf_tiny()
    cfg, params = load_hf_gpt2(hf)
    cfg = gpt2_config_from_hf(hf.config, dtype=jnp.float32)
    params = convert_hf_gpt2_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(1)
    prompt = [int(t) for t in rng.integers(0, cfg.vocab_size, 12)]
    n_new = 5

    engine = ServingEngine(
        params, cfg, max_batch=2, num_pages=16, page_size=32,
        pages_per_seq=4,
    )
    engine.submit(prompt, max_new_tokens=n_new)
    [req] = engine.run(max_steps=50)

    ids = torch.tensor([prompt])
    with torch.no_grad():
        hf_out = hf.generate(
            ids, max_new_tokens=n_new, do_sample=False,
            pad_token_id=0,
        )[0, len(prompt):].tolist()
    assert req.generated == hf_out, (req.generated, hf_out)
