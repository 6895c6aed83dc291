"""int8 QK^T inference path (qk_quant="int8"): SageAttention-style
per-token symmetric quantization with k mean-centering, full-precision
softmax + PV. Accuracy oracle: the fp32 dense reference; the bar is a
small multiple of the bf16 kernel's own error (int8 scores quantize to
~0.8% of range; PV stays exact)."""

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


def _check(out, ref, tol=0.06):
    """Absolute bound on unit-variance attention outputs: int8 QK with
    fp32 softmax/PV lands ~1e-2; 6e-2 catches regressions without being
    flaky across seeds."""
    err = float(jnp.max(jnp.abs(out - _to_bhsd(ref))))
    assert err < tol, err


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(256, 256), (128, 384)])
def test_int8_fwd_close_to_oracle(causal, sq, sk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 64
    q, k, v = random_qkv(rng, b, sq, sk, h, d, jnp.float32)
    out = flash_attention(q, k, v, causal=causal, qk_quant="int8")
    ref = attention_ref(_to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=causal)
    _check(out, ref)


def test_int8_mean_centering_handles_k_offset():
    """A large common offset on k (e.g. un-normalized keys) would wreck
    a naive symmetric int8 quantizer — mean-centering absorbs it exactly
    (softmax is invariant to per-row score shifts)."""
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 256, 2, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    k_off = k + 10.0
    out = flash_attention(q, k_off, v, causal=True, qk_quant="int8")
    ref = attention_ref(_to_bhsd(q), _to_bhsd(k_off), _to_bhsd(v),
                        causal=True)
    _check(out, ref)


def test_int8_window_gqa():
    rng = np.random.default_rng(2)
    b, s, h, h_kv, d = 1, 384, 4, 2, 64
    win = 100
    q, _, _ = random_qkv(rng, b, s, s, h, d, jnp.float32)
    _, k, v = random_qkv(rng, b, s, s, h_kv, d, jnp.float32)
    out = flash_attention(
        q, k, v, causal=True, window_size=(win, 0), qk_quant="int8"
    )
    group = h // h_kv
    kk = jnp.repeat(k, group, axis=2)
    vv = jnp.repeat(v, group, axis=2)
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(kk), _to_bhsd(vv), causal=True,
        mask=(j >= i - win),
    )
    _check(out, ref)


def test_int8_alibi():
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 256, 2, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    slopes = alibi_slopes(h)
    out = flash_attention(
        q, k, v, causal=True, alibi_slopes=slopes, qk_quant="int8"
    )
    i = jnp.arange(s, dtype=jnp.float32)[:, None]
    j = jnp.arange(s, dtype=jnp.float32)[None, :]
    bias = jnp.broadcast_to(slopes[None], (b, h))[:, :, None, None] * (
        (j - i)[None, None]
    )
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True, bias=bias
    )
    _check(out, ref)


def test_int8_segments():
    rng = np.random.default_rng(4)
    b, s, h, d = 1, 256, 2, 64
    l1 = 112
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    seg = jnp.asarray([[0] * l1 + [1] * (s - l1)], jnp.int32)
    out = flash_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
        qk_quant="int8",
    )
    for lo, hi in [(0, l1), (l1, s)]:
        ref = attention_ref(
            _to_bhsd(q[:, lo:hi]), _to_bhsd(k[:, lo:hi]),
            _to_bhsd(v[:, lo:hi]), causal=True,
        )
        err = float(jnp.max(jnp.abs(out[:, lo:hi] - _to_bhsd(ref))))
        assert err < 0.06, (lo, hi, err)


def test_int8_bf16_io():
    rng = np.random.default_rng(5)
    b, s, h, d = 1, 256, 2, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True, qk_quant="int8")
    assert out.dtype == jnp.bfloat16
    ref = attention_ref(_to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True)
    _check(out.astype(jnp.float32), ref.astype(jnp.float32), tol=0.08)


def test_int8_validation_and_grad():
    rng = np.random.default_rng(6)
    q, k, v = random_qkv(rng, 1, 128, 128, 2, 64, jnp.float32)
    with pytest.raises(ValueError, match="qk_quant"):
        flash_attention(q, k, v, qk_quant="int4")
    with pytest.raises(ValueError, match="inference-only"):
        flash_attention(q, k, v, qk_quant="int8", dropout_p=0.1,
                        dropout_seed=0)
    with pytest.raises(ValueError, match="softcap"):
        flash_attention(q, k, v, qk_quant="int8", softcap=10.0)
    with pytest.raises(ValueError, match="return_lse"):
        flash_attention(q, k, v, qk_quant="int8", return_lse=True)
    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(
            lambda q: jnp.sum(
                flash_attention(q, k, v, causal=True, qk_quant="int8")
            )
        )(q)
