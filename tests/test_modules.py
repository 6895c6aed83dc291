"""Module-layer tests: FlashMHA / FlashAttention (flax)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.modules import FlashAttention, FlashMHA
from flash_attn_tpu.reference import attention_ref


def test_mha_forward_matches_oracle():
    """FlashMHA output == Wqkv -> oracle attention -> out_proj."""
    rng = np.random.default_rng(0)
    b, s, e, h = 2, 96, 128, 4
    x = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    mha = FlashMHA(embed_dim=e, num_heads=h, causal=True)
    params = mha.init(jax.random.PRNGKey(0), x)
    out = mha.apply(params, x)
    assert out.shape == (b, s, e)

    # re-derive with the oracle
    kernel = params["params"]["Wqkv"]["kernel"]
    bias = params["params"]["Wqkv"]["bias"]
    qkv = (x @ kernel + bias).reshape(b, s, 3, h, e // h)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    ctx = attention_ref(q, k, v, causal=True)
    ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, s, e)
    expected = ctx @ params["params"]["out_proj"]["kernel"] + params["params"]["out_proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-4)


def test_mha_key_padding_mask_zeroes_pad_and_matches_per_row():
    rng = np.random.default_rng(1)
    b, s, e, h = 2, 64, 64, 2
    lengths = [40, 64]
    mask = np.zeros((b, s), bool)
    for i, li in enumerate(lengths):
        mask[i, :li] = True
    x = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    mha = FlashMHA(embed_dim=e, num_heads=h, causal=False)
    params = mha.init(jax.random.PRNGKey(0), x)
    out = mha.apply(params, x, key_padding_mask=jnp.asarray(mask))
    out_full = mha.apply(params, x[:1, : lengths[0]])
    # row 0 truncated to its true length must equal running it standalone
    np.testing.assert_allclose(
        np.asarray(out[0, : lengths[0]]), np.asarray(out_full[0]), atol=1e-4
    )


@pytest.mark.parametrize("use_rotary", ["1d", "2d"])
def test_mha_rotary_modes(use_rotary):
    rng = np.random.default_rng(2)
    b, e, h = 2, 64, 2
    s = 49 if use_rotary == "2d" else 50
    x = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    mha = FlashMHA(embed_dim=e, num_heads=h, causal=True, use_rotary_emb=use_rotary)
    params = mha.init(jax.random.PRNGKey(0), x)
    out = mha.apply(params, x)
    assert out.shape == (b, s, e)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_mha_dropout_rng_collection():
    rng = np.random.default_rng(3)
    b, s, e, h = 2, 64, 64, 2
    x = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    mha = FlashMHA(embed_dim=e, num_heads=h, attention_dropout=0.3)
    params = mha.init(jax.random.PRNGKey(0), x)
    o1 = mha.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = mha.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    o3 = mha.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    det = mha.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))
    assert not np.array_equal(np.asarray(o1), np.asarray(det))


def test_inner_attention_packed_mode():
    rng = np.random.default_rng(4)
    total, h, d = 120, 2, 32
    cu = jnp.asarray([0, 50, 120], jnp.int32)
    qkv = jnp.asarray(rng.standard_normal((total, 3, h, d)), jnp.float32)
    attn = FlashAttention()
    out = attn.apply({}, qkv, cu_seqlens=cu, max_s=70, causal=True)
    assert out.shape == (total, h, d)
    assert bool(jnp.all(jnp.isfinite(out)))
