"""Logit soft-capping (cap * tanh(s / cap)): fwd + grads vs the oracle.

The CUDA flash_attn package added ``softcap`` in v2.6 for Gemma-2-style
models. Semantics reproduced here: the scaled scores pass through
``softcap * tanh(s / softcap)`` BEFORE any additive bias (ALiBi) and
masking; the backward applies the tanh chain rule in-kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attention
from flash_attn_tpu.ops.attention import alibi_slopes
from flash_attn_tpu.reference import attention_ref
from flash_attn_tpu.utils.testing import random_qkv


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(256, 256), (128, 384)])
def test_softcap_fwd_matches_oracle(causal, sq, sk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 64
    cap = 30.0
    # Amplify q so scores actually reach the nonlinear part of the tanh
    # (at unit-variance inputs the capped and uncapped paths agree to
    # float tolerance and the test would pass vacuously).
    q, k, v = random_qkv(rng, b, sq, sk, h, d, jnp.float32)
    q = q * 8.0
    out = flash_attention(q, k, v, causal=causal, softcap=cap)
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=causal, softcap=cap
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4
    )
    # Sanity: capping at these magnitudes must change the output.
    plain = flash_attention(q, k, v, causal=causal)
    assert float(jnp.max(jnp.abs(out - plain))) > 1e-3


def test_softcap_grads_match_oracle():
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 256, 2, 64
    cap = 20.0
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    q = q * 6.0
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, softcap=cap) * g
        )

    def ref_loss(q, k, v):
        out = attention_ref(
            _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True, softcap=cap
        )
        return jnp.sum(_to_bhsd(out) * g)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=5e-5)


def test_softcap_alibi_combo():
    """Capping applies BEFORE the ALiBi bias (CUDA flash_attn order)."""
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 256, 2, 64
    cap = 15.0
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    q = q * 6.0
    slopes = alibi_slopes(h)
    out = flash_attention(
        q, k, v, causal=True, softcap=cap, alibi_slopes=slopes
    )
    i = jnp.arange(s, dtype=jnp.float32)[:, None]
    j = jnp.arange(s, dtype=jnp.float32)[None, :]
    bias = jnp.broadcast_to(slopes[None], (b, h))[:, :, None, None] * (
        (j - i)[None, None]
    )
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True, softcap=cap,
        bias=bias,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4
    )


def test_softcap_window_combo():
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 384, 2, 64
    cap, win = 25.0, 100
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    q = q * 8.0
    out = flash_attention(
        q, k, v, causal=True, window_size=(win, 0), softcap=cap
    )
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True, softcap=cap,
        mask=(j >= i - win),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4
    )


def test_softcap_segments():
    """Soft-capping with varlen (segment-id) packing."""
    rng = np.random.default_rng(4)
    b, s, h, d = 1, 256, 2, 64
    cap, l1 = 18.0, 112
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    q = q * 6.0
    seg = jnp.asarray([[0] * l1 + [1] * (s - l1)], jnp.int32)
    pos = jnp.asarray([list(range(l1)) + list(range(s - l1))], jnp.int32)
    out = flash_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
        q_positions=pos, kv_positions=pos, softcap=cap,
    )
    for lo, hi in [(0, l1), (l1, s)]:
        ref = attention_ref(
            _to_bhsd(q[:, lo:hi]), _to_bhsd(k[:, lo:hi]),
            _to_bhsd(v[:, lo:hi]), causal=True, softcap=cap,
        )
        np.testing.assert_allclose(
            np.asarray(out[:, lo:hi]), np.asarray(_to_bhsd(ref)),
            atol=2e-5, rtol=1e-4, err_msg=f"segment [{lo}:{hi})",
        )


def test_softcap_return_lse_differentiable():
    """The lse-returning variant stays differentiable with softcap."""
    rng = np.random.default_rng(5)
    b, s, h, d = 1, 128, 2, 64
    cap = 10.0
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    q = q * 6.0

    def loss(q):
        out, lse = flash_attention(
            q, k, v, causal=True, softcap=cap, return_lse=True
        )
        return jnp.sum(out) + 0.1 * jnp.sum(lse)

    def ref_loss(q):
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", _to_bhsd(q), _to_bhsd(k)
        ) * (d ** -0.5)
        scores = cap * jnp.tanh(scores / cap)
        i = jnp.arange(s)[:, None]
        j = jnp.arange(s)[None, :]
        scores = jnp.where(i >= j, scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, _to_bhsd(v))
        lse = jax.nn.logsumexp(scores, axis=-1)
        return jnp.sum(out) + 0.1 * jnp.sum(lse)

    dq = jax.grad(loss)(q)
    rq = jax.grad(ref_loss)(q)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=5e-5)


def test_flash_mha_softcap_runs():
    from flash_attn_tpu.models.modules import FlashMHA

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 128, 64)) * 4.0, jnp.float32)
    m = FlashMHA(embed_dim=64, num_heads=2, causal=True, softcap=5.0)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    m0 = FlashMHA(embed_dim=64, num_heads=2, causal=True)
    y0 = m0.apply(p, x)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y - y0))) > 1e-4  # capping has effect


def test_softcap_validation():
    rng = np.random.default_rng(6)
    q, k, v = random_qkv(rng, 1, 128, 128, 2, 64, jnp.float32)
    with pytest.raises(ValueError, match="softcap"):
        flash_attention(q, k, v, softcap=0.0)
    with pytest.raises(ValueError, match="softcap"):
        flash_attention(q, k, v, softcap=-1.0)


def test_paged_decode_softcap():
    """Decode path: capped scores against the capped dense oracle."""
    from flash_attn_tpu.kernels.decode import paged_decode_attention

    rng = np.random.default_rng(7)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    group, cap = 2, 8.0
    lengths = [100, 512, 1, 300]
    batch, n_q = len(lengths), n_kv * group
    q = jnp.asarray(
        rng.standard_normal((batch, n_q, d)) * 4.0, jnp.float32
    )
    # Random paged cache + the dense per-sequence K/V it represents
    # (mirrors tests/test_decode.py's _build_paged).
    k_pages = jnp.asarray(
        rng.standard_normal((n_kv, num_pages, page_size, d)), jnp.float32
    )
    v_pages = jnp.asarray(
        rng.standard_normal((n_kv, num_pages, page_size, d)), jnp.float32
    )
    table = np.zeros((batch, pages_per_seq), np.int32)
    used = iter(rng.permutation(num_pages))
    dense_k, dense_v = [], []
    for b, ln in enumerate(lengths):
        n = (ln + page_size - 1) // page_size
        ids = [next(used) for _ in range(n)]
        table[b, :n] = ids
        dense_k.append(
            jnp.concatenate([k_pages[:, i] for i in ids], axis=1)[:, :ln]
        )
        dense_v.append(
            jnp.concatenate([v_pages[:, i] for i in ids], axis=1)[:, :ln]
        )
    out = paged_decode_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32),
        jnp.asarray(table), softcap=cap,
    )
    for b, ln in enumerate(lengths):
        for hq in range(n_q):
            hk = hq // group
            ref = attention_ref(
                q[b, hq][None, None, None],
                dense_k[b][hk][None, None, :ln],
                dense_v[b][hk][None, None, :ln],
                softcap=cap,
            )
            np.testing.assert_allclose(
                np.asarray(out[b, hq]), np.asarray(ref[0, 0, 0]),
                atol=2e-5, rtol=1e-4, err_msg=f"b={b} hq={hq}",
            )
