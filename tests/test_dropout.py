"""Dropout: statistics, determinism, and fwd/bwd correctness.

Reference methodology (reference tests/test_flash_attn.py:300-329,411-414,
619-671): observed drop fraction within [0.99, 1.01] x p; bitwise-identical
outputs across seeded reruns; fp32 oracle evaluated UNDER THE KERNEL'S OWN
MASK so dropout runs are exactly comparable. Here the mask is regenerated
with kernels/prng.dropout_mask_dense — bit-identical by construction to the
in-kernel generation (coordinate-keyed hash), replacing the reference's
S_dmask sign-bit decoding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attention
from flash_attn_tpu.kernels import prng
from flash_attn_tpu.reference import attention_ref, build_mask
from flash_attn_tpu.utils.testing import assert_two_x_bound, random_qkv

P_DROP = 0.17


def test_keep_mask_statistics():
    """The hash must be a good enough RNG for the 1% relative bound."""
    seed = jnp.uint32(1234)
    m = prng.dropout_mask_dense(seed, 2, 4, 512, 512, P_DROP)
    frac = 1.0 - float(jnp.mean(m.astype(jnp.float32)))
    assert 0.99 * P_DROP <= frac <= 1.01 * P_DROP, frac
    # row/column marginals should also be unbiased (catches striping)
    row_frac = 1.0 - np.asarray(jnp.mean(m.astype(jnp.float32), axis=(0, 1, 3)))
    assert np.all(np.abs(row_frac - P_DROP) < 0.03), row_frac.max()


def test_keep_mask_seed_sensitivity():
    m1 = prng.dropout_mask_dense(jnp.uint32(1), 1, 1, 256, 256, P_DROP)
    m2 = prng.dropout_mask_dense(jnp.uint32(2), 1, 1, 256, 256, P_DROP)
    assert not bool(jnp.all(m1 == m2))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seqlen", [128, 257])
def test_dropout_fwd_matches_reference_under_same_mask(dtype, causal, seqlen):
    rng = np.random.default_rng(21)
    b, h, d = 2, 2, 64
    seed = jnp.uint32(42)
    q, k, v = random_qkv(rng, b, seqlen, seqlen, h, d, dtype)
    out = flash_attention(
        q, k, v, causal=causal, dropout_p=P_DROP, dropout_seed=seed
    )
    keep = prng.dropout_mask_dense(seed, b, h, seqlen, seqlen, P_DROP)

    def to_bhsd(x):
        return jnp.transpose(x, (0, 2, 1, 3))

    ref32 = attention_ref(
        to_bhsd(q).astype(jnp.float32),
        to_bhsd(k).astype(jnp.float32),
        to_bhsd(v).astype(jnp.float32),
        causal=causal,
        dropout_mask=keep,
        dropout_p=P_DROP,
    )
    refnat = attention_ref(
        to_bhsd(q), to_bhsd(k), to_bhsd(v), causal=causal,
        dropout_mask=keep, dropout_p=P_DROP, upcast=False,
    )
    got = to_bhsd(out)
    atol = 2e-5 if dtype == jnp.float32 else 1e-4
    assert_two_x_bound(got, ref32, refnat, atol=atol, label="dropout out")


def test_dropout_fraction_on_valid_region():
    """Drop fraction measured through the kernel itself: compare the fused
    output against the no-dropout reference to detect dropped entries is
    indirect; instead measure on the regenerated mask over the causal-valid
    region (the reference's get_dropout_fraction analog)."""
    b, h, s = 2, 3, 512
    seed = jnp.uint32(7)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)
    valid = build_mask(s, s, causal=True)
    n_valid = float(jnp.sum(valid)) * b * h
    dropped = float(jnp.sum((~keep) & valid[None, None]))
    frac = dropped / n_valid
    assert 0.99 * P_DROP <= frac <= 1.01 * P_DROP, frac


def test_dropout_determinism():
    """Bitwise-identical outputs across 10 seeded reruns (the reference's
    race-condition test, tests/test_flash_attn.py:619-671)."""
    rng = np.random.default_rng(23)
    b, s, h, d = 2, 257, 2, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.bfloat16)
    seed = jnp.uint32(99)
    f = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, dropout_p=P_DROP, dropout_seed=seed
        )
    )
    out0 = f(q, k, v)
    for _ in range(9):
        outi = f(q, k, v)
        assert bool(jnp.all(out0 == outi))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dropout_bwd_matches_reference_under_same_mask(dtype):
    rng = np.random.default_rng(25)
    b, s, h, d = 2, 128, 2, 64
    seed = jnp.uint32(5)
    q, k, v = random_qkv(rng, b, s, s, h, d, dtype)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)

    def to_bhsd(x):
        return jnp.transpose(x, (0, 2, 1, 3))

    def loss(q, k, v):
        out = flash_attention(
            q, k, v, causal=True, dropout_p=P_DROP, dropout_seed=seed
        )
        return jnp.sum(out * g)

    def loss_ref(q, k, v, upcast):
        qb, kb, vb = map(to_bhsd, (q, k, v))
        if upcast:
            qb, kb, vb = (x.astype(jnp.float32) for x in (qb, kb, vb))
        out = attention_ref(
            qb, kb, vb, causal=True,
            dropout_mask=keep, dropout_p=P_DROP, upcast=upcast,
        )
        return jnp.sum(out * to_bhsd(g).astype(out.dtype))

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads32 = jax.grad(
        lambda a, b_, c: loss_ref(a, b_, c, True), argnums=(0, 1, 2)
    )(q, k, v)
    if dtype == jnp.float32:
        for a, r, name in zip(grads, grads32, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), atol=5e-4, rtol=1e-3,
                err_msg=f"d{name}",
            )
    else:
        # bf16: dual-reference 2x bound (the reference methodology).
        gradsnat = jax.grad(
            lambda a, b_, c: loss_ref(a, b_, c, False), argnums=(0, 1, 2)
        )(q, k, v)
        for a, r32, rnat, name in zip(grads, grads32, gradsnat, "qkv"):
            assert_two_x_bound(a, r32, rnat, atol=2e-3, label=f"d{name}")
