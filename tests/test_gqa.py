"""Grouped-query / multi-query attention (TPU-native extension: kv blocks
are read via head-index mapping, never broadcast; dk/dv group-summed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.attention import flash_attention


def _inputs(b=2, sq=256, sk=256, hq=8, hkv=2, d=64, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, hkv, d)), dtype)
    return q, k, v


def _broadcast_kv(x, group):
    return jnp.repeat(x, group, axis=2)


@pytest.mark.parametrize("hq,hkv", [(8, 2), (8, 1), (4, 4)])
@pytest.mark.parametrize("causal", [False, True])
def test_gqa_fwd_matches_broadcast(hq, hkv, causal):
    q, k, v = _inputs(hq=hq, hkv=hkv)
    group = hq // hkv
    out = flash_attention(q, k, v, causal=causal)
    ref = flash_attention(
        q, _broadcast_kv(k, group), _broadcast_kv(v, group), causal=causal
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_gqa_grads_match_broadcast(causal):
    hq, hkv = 8, 2
    group = hq // hkv
    q, k, v = _inputs(hq=hq, hkv=hkv, sq=128, sk=128)
    g = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (q.shape[0], q.shape[1], hq, q.shape[3])
        ),
        q.dtype,
    )

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) * g)

    def loss_b(q, k, v):
        return jnp.sum(
            flash_attention(
                q, _broadcast_kv(k, group), _broadcast_kv(v, group),
                causal=causal,
            )
            * g
        )

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_b, dv_b = jax.grad(loss_b, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_b), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_b), atol=2e-5)


def test_gqa_varlen_segments():
    q, k, v = _inputs(hq=8, hkv=2, sq=192, sk=192)
    seg = jnp.asarray(
        np.repeat([0, 1, 2], 64)[None].repeat(2, axis=0), jnp.int32
    )
    out = flash_attention(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True
    )
    ref = flash_attention(
        q, _broadcast_kv(k, 4), _broadcast_kv(v, 4),
        q_segment_ids=seg, kv_segment_ids=seg, causal=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_flashmha_gqa_module():
    import flax.linen as nn  # noqa: F401
    from flash_attn_tpu.models.modules import FlashMHA

    m = FlashMHA(embed_dim=256, num_heads=8, num_kv_heads=2, causal=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 128, 256)), jnp.float32
    )
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    # fewer kv projections than MHA
    wqkv = params["params"]["Wqkv"]["kernel"]
    assert wqkv.shape == (256, (8 + 2 * 2) * 32)


def test_gqa_dropout_segments_combined():
    """GQA x dropout x segment-id varlen in one call (the reference's
    combined-feature coverage): must equal the broadcast-KV call with the
    same seed (dropout keys on query-head coordinates, so the masks
    coincide), forward and gradients."""
    b, s, hq, hkv, d = 2, 256, 4, 2, 64
    q, k, v = _inputs(b=b, sq=s, sk=s, hq=hq, hkv=hkv, d=d, seed=7)
    group = hq // hkv
    rng = np.random.default_rng(8)
    # two segments per row + trailing padding
    seg = jnp.asarray(
        np.concatenate([
            np.zeros((b, 100), np.int32),
            np.ones((b, 120), np.int32),
            np.full((b, 36), -1, np.int32),
        ], axis=1)
    )
    kw = dict(
        causal=True, q_segment_ids=seg, kv_segment_ids=seg,
        dropout_p=0.17, dropout_seed=31,
    )
    g = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, **kw) * g)

    def loss_ref(q, k, v):
        return jnp.sum(
            flash_attention(
                q, _broadcast_kv(k, group), _broadcast_kv(v, group), **kw
            ) * g
        )

    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v, **kw)),
        np.asarray(
            flash_attention(
                q, _broadcast_kv(k, group), _broadcast_kv(v, group), **kw
            )
        ),
        atol=1e-5,
    )
    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    # loss_ref differentiates w.r.t. the PRE-broadcast k/v: jnp.repeat's
    # transpose already group-sums, so shapes match dk/dv directly.
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=2e-5)
