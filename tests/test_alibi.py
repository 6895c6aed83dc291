"""ALiBi linear position bias: fwd + grads vs the biased oracle.

The CUDA flash_attn package added ``alibi_slopes`` in v2.4; semantics
reproduced here: bias = -slope * (i - j) for causal (bottom-right aligned
when sq != sk), -slope * |i - j| otherwise; slopes per (head) or
(batch, head); no gradient flows to the slopes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attention
from flash_attn_tpu.ops.attention import alibi_slopes
from flash_attn_tpu.reference import attention_ref
from flash_attn_tpu.utils.testing import random_qkv


def _bias(slopes_bh, sq, sk, causal):
    """(b, h, sq, sk) ALiBi bias from (b, h) slopes (oracle-side).
    Top-left / global-index distances — the same convention as this
    library's causal mask."""
    i = jnp.arange(sq, dtype=jnp.float32)[:, None]
    j = jnp.arange(sk, dtype=jnp.float32)[None, :]
    dist = (j - i) if causal else -jnp.abs(i - j)
    return slopes_bh[:, :, None, None] * dist[None, None]


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(256, 256), (128, 384)])
def test_alibi_fwd_matches_oracle(causal, sq, sk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 64
    q, k, v = random_qkv(rng, b, sq, sk, h, d, jnp.float32)
    slopes = alibi_slopes(h)
    slopes_bh = jnp.broadcast_to(slopes[None], (b, h))
    out = flash_attention(q, k, v, causal=causal, alibi_slopes=slopes)
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v),
        causal=causal,
        bias=_bias(slopes_bh, sq, sk, causal),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4
    )


def test_alibi_per_batch_slopes():
    rng = np.random.default_rng(1)
    b, sq, h, d = 3, 256, 2, 64
    q, k, v = random_qkv(rng, b, sq, sq, h, d, jnp.float32)
    slopes_bh = jnp.asarray(rng.uniform(0.001, 0.5, (b, h)), jnp.float32)
    out = flash_attention(q, k, v, causal=True, alibi_slopes=slopes_bh)
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True,
        bias=_bias(slopes_bh, sq, sq, True),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4
    )


def test_alibi_grads_match_oracle():
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 256, 2, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    slopes = alibi_slopes(h)
    slopes_bh = jnp.broadcast_to(slopes[None], (b, h))

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, alibi_slopes=slopes) * g
        )

    def ref_loss(q, k, v):
        out = attention_ref(
            _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True,
            bias=_bias(slopes_bh, s, s, True),
        )
        return jnp.sum(_to_bhsd(out) * g)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=3e-5)


def test_alibi_segments_uses_positions():
    """With segment ids, the bias compares caller-supplied positions —
    two packed sequences must each see their own local ALiBi geometry."""
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 256, 2, 64
    l1 = 112  # segment 0 = [0, 112), segment 1 = [112, 256)
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    seg = jnp.asarray(
        [[0] * l1 + [1] * (s - l1)], jnp.int32
    )
    pos = jnp.asarray(
        [list(range(l1)) + list(range(s - l1))], jnp.int32
    )
    slopes = alibi_slopes(h)
    slopes_bh = jnp.broadcast_to(slopes[None], (1, h))
    out = flash_attention(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
        q_positions=pos, kv_positions=pos, alibi_slopes=slopes,
    )
    # Oracle: each segment separately with its own local positions.
    for lo, hi in [(0, l1), (l1, s)]:
        ref = attention_ref(
            _to_bhsd(q[:, lo:hi]), _to_bhsd(k[:, lo:hi]),
            _to_bhsd(v[:, lo:hi]), causal=True,
            bias=_bias(slopes_bh, hi - lo, hi - lo, True),
        )
        np.testing.assert_allclose(
            np.asarray(out[:, lo:hi]), np.asarray(_to_bhsd(ref)),
            atol=2e-5, rtol=1e-4, err_msg=f"segment [{lo}:{hi})",
        )


def test_alibi_gqa():
    rng = np.random.default_rng(4)
    b, s, h, h_kv, d = 1, 256, 4, 2, 64
    q, _, _ = random_qkv(rng, b, s, s, h, d, jnp.float32)
    _, k, v = random_qkv(rng, b, s, s, h_kv, d, jnp.float32)
    slopes = alibi_slopes(h)
    out = flash_attention(q, k, v, causal=True, alibi_slopes=slopes)
    group = h // h_kv
    slopes_bh = jnp.broadcast_to(slopes[None], (b, h))
    kk = jnp.repeat(k, group, axis=2)
    vv = jnp.repeat(v, group, axis=2)
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(kk), _to_bhsd(vv), causal=True,
        bias=_bias(slopes_bh, s, s, True),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4
    )


def test_alibi_slopes_schedule():
    # Power of two: geometric 2^(-8/n) schedule.
    s8 = np.asarray(alibi_slopes(8))
    np.testing.assert_allclose(s8, [2.0 ** (-(i + 1)) for i in range(8)],
                               rtol=1e-6)
    # Non-power-of-two: closest pow2 schedule + every other of doubled.
    s6 = np.asarray(alibi_slopes(6))
    assert s6.shape == (6,)
    np.testing.assert_allclose(s6[:4], np.asarray(alibi_slopes(4)),
                               rtol=1e-6)
    assert np.all(s6 > 0)


def test_alibi_window_combo():
    """ALiBi composes with sliding-window masking."""
    rng = np.random.default_rng(5)
    b, s, h, d = 1, 384, 2, 64
    win = 100
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    slopes = alibi_slopes(h)
    slopes_bh = jnp.broadcast_to(slopes[None], (b, h))
    out = flash_attention(
        q, k, v, causal=True, window_size=(win, 0), alibi_slopes=slopes
    )
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True,
        mask=(j >= i - win),
        bias=_bias(slopes_bh, s, s, True),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4
    )


def test_ring_alibi_matches_dense():
    """ALiBi over the zigzag ring: the bias compares global positions, so
    the merged result must equal single-device ALiBi attention."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from flash_attn_tpu.parallel.ring import (
        inverse_permutation, ring_flash_attention, zigzag_permutation,
    )

    rng = np.random.default_rng(7)
    b, s, h, d = 1, 512, 2, 64
    n_dev = 4
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    slopes = alibi_slopes(h)
    ref = flash_attention(q, k, v, causal=True, alibi_slopes=slopes)

    devices = np.asarray(jax.devices()[:n_dev])
    mesh = Mesh(devices, axis_names=("sp",))

    def ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, axis_name="sp", causal=True, zigzag=True,
            alibi_slopes=slopes,
        )
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "sp", None, None),) * 3,
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )
    perm = zigzag_permutation(s, n_dev)
    inv = inverse_permutation(perm)
    out = jax.jit(f)(q[:, perm], k[:, perm], v[:, perm])[:, inv]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_head_tp_alibi_matches_dense():
    """Head-TP sharded ALiBi: slopes shard along the model axis with the
    heads, so each shard biases its heads with the right slopes."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from flash_attn_tpu.parallel.sharding import (
        make_sharded_flash_attention,
    )

    rng = np.random.default_rng(8)
    b, s, h, d = 2, 256, 8, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    slopes = alibi_slopes(h)
    ref = flash_attention(q, k, v, causal=True, alibi_slopes=slopes)

    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    f = make_sharded_flash_attention(
        mesh, causal=True, alibi_slopes=slopes
    )
    spec = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = jax.jit(f)(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_flash_mha_alibi_runs():
    from flash_attn_tpu.models.modules import FlashMHA

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 128, 64)), jnp.float32)
    mha = FlashMHA(embed_dim=64, num_heads=4, causal=True, use_alibi=True)
    params = mha.init(jax.random.PRNGKey(0), x)
    out = mha.apply(params, x)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
    # ALiBi must actually change the output vs the plain module.
    plain = FlashMHA(embed_dim=64, num_heads=4, causal=True)
    out2 = plain.apply(params, x)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
