"""Varlen (cu_seqlens) API parity tests.

Mirrors the reference's qkvpacked / kvpacked / unpadded test methodology
(reference tests/test_flash_attn.py:342-607): random per-sequence lengths,
packed layout, per-sequence comparison against the dual-reference bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.interface import (
    flash_attn_unpadded_func,
    flash_attn_unpadded_kvpacked_func,
    flash_attn_unpadded_qkvpacked_func,
)
from flash_attn_tpu.ops.packing import (
    cu_seqlens_to_segments,
    make_segment_ids_from_mask,
    pad_input,
    unpad_input,
)
from flash_attn_tpu.reference import attention_ref
from flash_attn_tpu.utils.testing import assert_two_x_bound


def _random_lengths(rng, batch, max_seqlen):
    # Like the reference's generate_random_padding_mask: lengths in
    # [max/3, max].
    return rng.integers(max(1, max_seqlen // 3), max_seqlen + 1, size=batch)


def _cu(lengths):
    return jnp.asarray(
        np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    )


def _per_seq_check(out_packed, q, k, v, cu_q, cu_k, lengths_q, lengths_k,
                   causal, dtype, label):
    """Compare each packed sequence against the oracle independently."""
    for i, (lq, lk) in enumerate(zip(lengths_q, lengths_k)):
        sl_q = slice(int(cu_q[i]), int(cu_q[i] + lq))
        sl_k = slice(int(cu_k[i]), int(cu_k[i] + lk))
        qi = jnp.transpose(q[sl_q], (1, 0, 2))[None]  # (1, h, lq, d)
        ki = jnp.transpose(k[sl_k], (1, 0, 2))[None]
        vi = jnp.transpose(v[sl_k], (1, 0, 2))[None]
        ref32 = attention_ref(
            qi.astype(jnp.float32),
            ki.astype(jnp.float32),
            vi.astype(jnp.float32),
            causal=causal,
        )
        refnat = attention_ref(qi, ki, vi, causal=causal, upcast=False)
        got = jnp.transpose(out_packed[sl_q], (1, 0, 2))[None]
        atol = 2e-5 if dtype == jnp.float32 else 1e-4
        assert_two_x_bound(got, ref32, refnat, atol=atol, label=f"{label}[{i}]")


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("causal", [False, True])
def test_qkvpacked(dtype, causal):
    rng = np.random.default_rng(7)
    batch, max_s, h, d = 4, 200, 3, 64
    lengths = _random_lengths(rng, batch, max_s)
    total = int(lengths.sum())
    cu = _cu(lengths)
    qkv = jnp.asarray(rng.standard_normal((total, 3, h, d)), dtype)
    out = flash_attn_unpadded_qkvpacked_func(qkv, cu, max_s, 0.0, causal=causal)
    assert out.shape == (total, h, d)
    _per_seq_check(
        out, qkv[:, 0], qkv[:, 1], qkv[:, 2], cu, cu, lengths, lengths,
        causal, dtype, "qkvpacked",
    )


@pytest.mark.parametrize("causal", [False, True])
def test_kvpacked_cross(causal):
    """Independent q/k lengths (cross-attention shapes)."""
    rng = np.random.default_rng(8)
    batch, max_sq, max_sk, h, d = 3, 130, 260, 2, 64
    lq = _random_lengths(rng, batch, max_sq)
    lk = _random_lengths(rng, batch, max_sk)
    cu_q, cu_k = _cu(lq), _cu(lk)
    tq, tk = int(lq.sum()), int(lk.sum())
    q = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((tk, 2, h, d)), jnp.bfloat16)
    out = flash_attn_unpadded_kvpacked_func(
        q, kv, cu_q, cu_k, max_sq, max_sk, 0.0, causal=causal
    )
    _per_seq_check(
        out, q, kv[:, 0], kv[:, 1], cu_q, cu_k, lq, lk, causal,
        jnp.bfloat16, "kvpacked",
    )


def test_unpadded_grads():
    rng = np.random.default_rng(9)
    batch, max_s, h, d = 3, 150, 2, 32
    lengths = _random_lengths(rng, batch, max_s)
    total = int(lengths.sum())
    cu = _cu(lengths)
    q = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)

    def loss(q, k, v):
        out = flash_attn_unpadded_func(
            q, k, v, cu, cu, max_s, max_s, 0.0, causal=True
        )
        return jnp.sum(out * g)

    def loss_ref(q, k, v):
        tot = 0.0
        for i, li in enumerate(lengths):
            sl = slice(int(cu[i]), int(cu[i] + li))
            qi = jnp.transpose(q[sl], (1, 0, 2))[None]
            ki = jnp.transpose(k[sl], (1, 0, 2))[None]
            vi = jnp.transpose(v[sl], (1, 0, 2))[None]
            o = attention_ref(qi, ki, vi, causal=True)
            tot += jnp.sum(o[0] * jnp.transpose(g[sl], (1, 0, 2)))
        return tot

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(grads, grads_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=3e-4, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_cu_seqlens_to_segments():
    cu = jnp.asarray([0, 3, 3, 7], jnp.int32)
    seg, pos = cu_seqlens_to_segments(cu, 9)
    np.testing.assert_array_equal(
        np.asarray(seg), [0, 0, 0, 2, 2, 2, 2, -1, -1]
    )
    np.testing.assert_array_equal(np.asarray(pos), [0, 1, 2, 0, 1, 2, 3, 0, 0])


def test_unpad_pad_roundtrip():
    rng = np.random.default_rng(3)
    b, s, hd = 3, 17, 8
    lengths = np.array([5, 17, 1])
    mask = np.zeros((b, s), bool)
    for i, li in enumerate(lengths):
        mask[i, :li] = True
    x = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    packed, indices, cu, max_s = unpad_input(x, jnp.asarray(mask))
    assert packed.shape[0] == lengths.sum()
    assert max_s == 17
    np.testing.assert_array_equal(
        np.asarray(cu), np.concatenate([[0], np.cumsum(lengths)])
    )
    back = pad_input(packed, indices, b, s)
    np.testing.assert_array_equal(
        np.asarray(back), np.asarray(x * jnp.asarray(mask)[..., None])
    )
    # static-size variant is jittable
    packed2, *_ = unpad_input(x, jnp.asarray(mask), total=b * s)
    np.testing.assert_allclose(
        np.asarray(packed2[: int(lengths.sum())]), np.asarray(packed)
    )


def test_segment_ids_from_mask_matches_unpad_path():
    """Dense padded + key_padding_mask path == packed path."""
    from flash_attn_tpu import flash_attention

    rng = np.random.default_rng(11)
    b, s, h, d = 3, 99, 2, 64
    lengths = _random_lengths(rng, b, s)
    mask = np.zeros((b, s), bool)
    for i, li in enumerate(lengths):
        mask[i, :li] = True
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    seg, pos = make_segment_ids_from_mask(jnp.asarray(mask))
    out = flash_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
        q_positions=pos, kv_positions=pos,
    )
    for i, li in enumerate(lengths):
        li = int(li)
        qi = jnp.transpose(q[i, :li], (1, 0, 2))[None]
        ki = jnp.transpose(k[i, :li], (1, 0, 2))[None]
        vi = jnp.transpose(v[i, :li], (1, 0, 2))[None]
        ref = attention_ref(qi, ki, vi, causal=True)
        got = jnp.transpose(out[i, :li], (1, 0, 2))[None]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4
        )
        # padding rows are exactly zero
        np.testing.assert_array_equal(np.asarray(out[i, li:]), 0.0)


def test_unpadded_window_alibi_softcap_kwargs():
    """Later-upstream kwargs on the varlen entry points: window band,
    ALiBi distances, and softcap all act on per-sequence LOCAL
    positions of the packed super-sequence."""
    from flash_attn_tpu.ops.attention import alibi_slopes

    rng = np.random.default_rng(11)
    batch, max_s, h, d = 3, 180, 2, 64
    win = 50
    lengths = _random_lengths(rng, batch, max_s)
    total = int(lengths.sum())
    cu = _cu(lengths)
    q = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((total, h, d)), jnp.float32)
    slopes = alibi_slopes(h)
    out = flash_attn_unpadded_func(
        q, k, v, cu, cu, max_s, max_s, 0.0, causal=True,
        window_size=(win, 0), alibi_slopes=slopes, softcap=30.0,
    )
    for i, ln in enumerate(lengths):
        sl = slice(int(cu[i]), int(cu[i] + ln))
        qi = jnp.transpose(q[sl], (1, 0, 2))[None]
        ki = jnp.transpose(k[sl], (1, 0, 2))[None]
        vi = jnp.transpose(v[sl], (1, 0, 2))[None]
        ii = jnp.arange(int(ln))[:, None]
        jj = jnp.arange(int(ln))[None, :]
        bias = slopes[None, :, None, None] * (jj - ii).astype(jnp.float32)
        ref = attention_ref(
            qi, ki, vi, causal=True, mask=(jj >= ii - win)[None, None],
            bias=bias, softcap=30.0,
        )
        got = jnp.transpose(out[sl], (1, 0, 2))[None]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4,
            err_msg=f"seq {i}",
        )
