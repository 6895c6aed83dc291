"""Dropout composed with the masked-path features (round-5, VERDICT #4).

The reference runs dropout p=0.17 across its ENTIRE dtype x causal x
head-dim x seqlen matrix (reference tests/test_flash_attn.py:332-341), so
every masked code path is exercised under dropout. Here the diagonal /
band specializations and the bias paths (ALiBi, softcap) apply dropout
through their own chain code — these tests pin each pairing against the
fp32 oracle evaluated UNDER THE KERNEL'S OWN regenerated keep-mask
(kernels/prng.dropout_mask_dense is bit-identical to the in-kernel
coordinate-hash generation), plus band-restricted drop-fraction
statistics for the windowed path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attention
from flash_attn_tpu.kernels import prng
from flash_attn_tpu.ops.attention import alibi_slopes
from flash_attn_tpu.reference import attention_ref, build_mask
from flash_attn_tpu.utils.testing import assert_two_x_bound, random_qkv

P_DROP = 0.17


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _alibi_bias(slopes_bh, sq, sk, causal):
    i = jnp.arange(sq, dtype=jnp.float32)[:, None]
    j = jnp.arange(sk, dtype=jnp.float32)[None, :]
    dist = (j - i) if causal else -jnp.abs(i - j)
    return slopes_bh[:, :, None, None] * dist[None, None]


def _check_vs_oracle(q, k, v, out, keep, *, mask=None, bias=None,
                     causal=False, softcap=None, atol=1e-4):
    """Dual-reference 2x bound of ``out`` against the oracle under the
    kernel's own dropout mask (fp32 ground truth + native-dtype baseline)."""
    qb, kb, vb = map(_to_bhsd, (q, k, v))
    kw = dict(causal=causal, mask=mask, bias=bias, softcap=softcap,
              dropout_mask=keep, dropout_p=P_DROP)
    ref32 = attention_ref(
        qb.astype(jnp.float32), kb.astype(jnp.float32),
        vb.astype(jnp.float32), **kw)
    refnat = attention_ref(qb, kb, vb, upcast=False, **kw)
    assert_two_x_bound(_to_bhsd(out), ref32, refnat, atol=atol,
                       label="dropout-compose out")


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "causal,window",
    [(True, (65, None)), (True, (64, 0)), (False, (48, 32))],
)
def test_dropout_x_window(dtype, causal, window):
    """Sliding-window masking (incl. the band specializations) x dropout."""
    rng = np.random.default_rng(31)
    b, s, h, d = 2, 320, 2, 64
    seed = jnp.uint32(11)
    q, k, v = random_qkv(rng, b, s, s, h, d, dtype)
    out = flash_attention(
        q, k, v, causal=causal, window_size=window,
        dropout_p=P_DROP, dropout_seed=seed)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)
    mask = build_mask(s, s, causal=causal,
                      window_left=window[0], window_right=window[1])
    _check_vs_oracle(q, k, v, out, keep, mask=mask,
                     atol=1e-4 if dtype == jnp.float32 else 2e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_dropout_x_alibi(causal):
    rng = np.random.default_rng(32)
    b, s, h, d = 2, 256, 4, 64
    seed = jnp.uint32(12)
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    slopes = alibi_slopes(h)
    out = flash_attention(
        q, k, v, causal=causal, alibi_slopes=slopes,
        dropout_p=P_DROP, dropout_seed=seed)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)
    bias = _alibi_bias(jnp.broadcast_to(slopes[None], (b, h)), s, s, causal)
    _check_vs_oracle(q, k, v, out, keep, bias=bias, causal=causal)


@pytest.mark.parametrize("causal", [False, True])
def test_dropout_x_softcap(causal):
    rng = np.random.default_rng(33)
    b, s, h, d = 2, 256, 2, 64
    seed = jnp.uint32(13)
    cap = 30.0
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    out = flash_attention(
        q, k, v, causal=causal, softcap=cap,
        dropout_p=P_DROP, dropout_seed=seed)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)
    _check_vs_oracle(q, k, v, out, keep, causal=causal, softcap=cap)


def test_dropout_x_gqa_vs_broadcast_oracle():
    """GQA under dropout against the oracle with explicitly broadcast KV
    (the keep mask hashes on Q-head indices, so grouping must not change
    which entries drop)."""
    rng = np.random.default_rng(34)
    b, s, h, h_kv, d = 2, 256, 4, 2, 64
    seed = jnp.uint32(14)
    q, _, _ = random_qkv(rng, b, s, s, h, d, jnp.float32)
    _, k, v = random_qkv(rng, b, s, s, h_kv, d, jnp.float32)
    out = flash_attention(
        q, k, v, causal=True, dropout_p=P_DROP, dropout_seed=seed)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)
    rep = h // h_kv
    k_b = jnp.repeat(k, rep, axis=2)
    v_b = jnp.repeat(v, rep, axis=2)
    _check_vs_oracle(q, k_b, v_b, out, keep, causal=True)


def test_dropout_x_varlen_segments():
    """Packed varlen (two segments per row, local positions) x dropout:
    the segment masked path applies dropout on GLOBAL (padded) coords."""
    rng = np.random.default_rng(35)
    b, s, h, d = 2, 256, 2, 64
    split = 96
    seed = jnp.uint32(15)
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    seg = jnp.where(jnp.arange(s) < split, 0, 1)[None].repeat(b, 0)
    pos = jnp.where(
        jnp.arange(s) < split, jnp.arange(s), jnp.arange(s) - split
    )[None].repeat(b, 0)
    out = flash_attention(
        q, k, v, causal=True,
        q_segment_ids=seg, kv_segment_ids=seg,
        q_positions=pos, kv_positions=pos,
        dropout_p=P_DROP, dropout_seed=seed)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)
    mask = build_mask(
        s, s, causal=True, q_positions=pos, kv_positions=pos,
        q_segment_ids=seg, kv_segment_ids=seg)[:, None]  # (b, 1, s, s)
    _check_vs_oracle(q, k, v, out, keep, mask=mask)


def test_dropout_fraction_restricted_to_window_band():
    """Drop-fraction statistics measured ONLY over the visible band of a
    windowed call (the reference get_dropout_fraction restricts to the
    attended region, tests/test_flash_attn.py:227-249)."""
    b, h, s = 2, 3, 512
    left = 127
    seed = jnp.uint32(16)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)
    band = build_mask(s, s, causal=True, window_left=left)
    n_band = float(jnp.sum(band)) * b * h
    dropped = float(jnp.sum((~keep) & band[None, None]))
    frac = dropped / n_band
    assert 0.98 * P_DROP <= frac <= 1.02 * P_DROP, frac


def test_dropout_x_window_grads_match_oracle():
    """Backward composition: the band masked path's dS chain under
    dropout (fp32, tight tolerance)."""
    rng = np.random.default_rng(36)
    b, s, h, d = 1, 256, 2, 64
    seed = jnp.uint32(17)
    window = (65, None)
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    keep = prng.dropout_mask_dense(seed, b, h, s, s, P_DROP)
    mask = build_mask(s, s, causal=True, window_left=window[0])

    def loss(q, k, v):
        out = flash_attention(
            q, k, v, causal=True, window_size=window,
            dropout_p=P_DROP, dropout_seed=seed)
        return jnp.sum(out * g)

    def loss_ref(q, k, v):
        out = attention_ref(
            *(x.astype(jnp.float32) for x in map(_to_bhsd, (q, k, v))),
            mask=mask, dropout_mask=keep, dropout_p=P_DROP)
        return jnp.sum(out * _to_bhsd(g))

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(grads, grads_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=7e-4, rtol=2e-3,
            err_msg=f"d{name}")
