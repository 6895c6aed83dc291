"""Multi-device tests on the 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from flash_attn_tpu import flash_attention
from flash_attn_tpu.parallel.ring import ring_flash_attention
from flash_attn_tpu.parallel.sharding import make_sharded_flash_attention
from flash_attn_tpu.utils.testing import random_qkv


@pytest.fixture(scope="module")
def mesh():
    devices = np.asarray(jax.devices()).reshape(2, 4)
    return Mesh(devices, axis_names=("data", "model"))


def test_head_tp_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    b, s, h, d = 4, 256, 8, 64  # batch 4 over data=2, heads 8 over model=4
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    ref = flash_attention(q, k, v, causal=True)
    f = make_sharded_flash_attention(mesh, causal=True)
    spec = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = jax.jit(f)(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_head_tp_window_matches_single_device(mesh):
    """Sliding window under head-TP: every shard holds the full sequence,
    so the band must match the single-device windowed kernel exactly."""
    rng = np.random.default_rng(7)
    b, s, h, d = 4, 512, 8, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    ref = flash_attention(q, k, v, causal=True, window_size=(128, 0))
    f = make_sharded_flash_attention(
        mesh, causal=True, window_size=(128, 0)
    )
    spec = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = jax.jit(f)(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_head_tp_dropout_shard_seed_offsets(mesh):
    """Each (data, model) shard must run with seed + shard offsets — exact
    reproduction of every shard from single-device calls."""
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 256, 8, 64
    seed = 7
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    f = make_sharded_flash_attention(mesh, dropout_p=0.5)
    spec = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = np.asarray(
        jax.jit(lambda a, b_, c: f(a, b_, c, dropout_seed=seed))(qs, ks, vs)
    )
    h_loc, b_loc = h // 4, b // 2
    for di in range(2):
        for sh in range(4):
            shard_seed = jnp.uint32(
                (seed + sh * 0x9E3779B1 + di * 0x85EBCA77) % 2**32
            )
            sl_b = slice(di * b_loc, (di + 1) * b_loc)
            sl_h = slice(sh * h_loc, (sh + 1) * h_loc)
            expected = flash_attention(
                q[sl_b, :, sl_h], k[sl_b, :, sl_h], v[sl_b, :, sl_h],
                dropout_p=0.5, dropout_seed=shard_seed,
            )
            np.testing.assert_allclose(
                out[sl_b, :, sl_h], np.asarray(expected), atol=1e-5,
                err_msg=f"shard (data={di}, model={sh})",
            )
            # and a *different* shard's seed must NOT reproduce it
            if sh == 0 and di == 0:
                wrong = flash_attention(
                    q[sl_b, :, sl_h], k[sl_b, :, sl_h], v[sl_b, :, sl_h],
                    dropout_p=0.5,
                    dropout_seed=jnp.uint32((seed + 0x9E3779B1) % 2**32),
                )
                assert not np.allclose(out[sl_b, :, sl_h], np.asarray(wrong))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(mesh, causal):
    rng = np.random.default_rng(2)
    b, s, h, d = 2, 512, 2, 64  # seq 512 over model axis: 128/device
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    ref = flash_attention(q, k, v, causal=causal)

    def ring(q, k, v):
        out, _ = ring_flash_attention(q, k, v, axis_name="model", causal=causal)
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "model", None, None),) * 3,
        out_specs=P(None, "model", None, None),
        check_vma=False,
    )
    out = jax.jit(f)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_grads_match_dense(mesh, causal):
    """Ring backward: rotated per-shard backwards with the global lse must
    reproduce the single-device flash attention gradients."""
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 512, 2, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    def ref_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) * g)

    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    def ring(q, k, v):
        out, _ = ring_flash_attention(q, k, v, axis_name="model", causal=causal)
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "model", None, None),) * 3,
        out_specs=P(None, "model", None, None),
        check_vma=False,
    )

    # Differentiate through the shard_map from outside (the user-realistic
    # pattern; an in-shard psum loss would n-fold the cotangents under
    # check_vma=False).
    def loss(q, k, v):
        return jnp.sum(f(q, k, v) * g)

    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=3e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_zigzag_matches_dense(mesh, causal):
    """Zigzag layout: permuted inputs through the balanced ring must equal
    the dense reference after inverse permutation."""
    from flash_attn_tpu.parallel.ring import (
        inverse_permutation, zigzag_permutation,
    )

    rng = np.random.default_rng(4)
    b, s, h, d = 2, 512, 2, 64
    n_dev = 4
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    ref = flash_attention(q, k, v, causal=causal)

    perm = zigzag_permutation(s, n_dev)
    inv = inverse_permutation(perm)
    qz, kz, vz = (x[:, perm] for x in (q, k, v))

    def ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, axis_name="model", causal=causal, zigzag=True
        )
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "model", None, None),) * 3,
        out_specs=P(None, "model", None, None),
        check_vma=False,
    )
    out = jax.jit(f)(qz, kz, vz)[:, inv]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_ring_zigzag_grads_match_dense(mesh):
    from flash_attn_tpu.parallel.ring import (
        inverse_permutation, zigzag_permutation,
    )

    rng = np.random.default_rng(5)
    b, s, h, d = 1, 512, 2, 64
    n_dev = 4
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    def ref_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) * g)

    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    perm = zigzag_permutation(s, n_dev)
    inv = inverse_permutation(perm)

    def ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, axis_name="model", causal=True, zigzag=True
        )
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "model", None, None),) * 3,
        out_specs=P(None, "model", None, None),
        check_vma=False,
    )

    def loss(q, k, v):
        return jnp.sum(f(q[:, perm], k[:, perm], v[:, perm])[:, inv] * g)

    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=3e-5)


@pytest.mark.parametrize("zigzag", [False, True])
def test_ring_window_matches_dense(mesh, zigzag):
    """Sliding window over the ring: global-position band masking must
    match the single-device windowed kernel, in both shard layouts
    (shard pairs fully outside the band merge as lse=-inf partials)."""
    from flash_attn_tpu.parallel.ring import (
        inverse_permutation, zigzag_permutation,
    )

    rng = np.random.default_rng(8)
    b, s, h, d = 2, 512, 2, 64
    n_dev = 4
    win = (96, 0)
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    ref = flash_attention(q, k, v, causal=True, window_size=win)

    def ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, axis_name="model", causal=True, zigzag=zigzag,
            window_size=win,
        )
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "model", None, None),) * 3,
        out_specs=P(None, "model", None, None),
        check_vma=False,
    )
    if zigzag:
        perm = zigzag_permutation(s, n_dev)
        inv = inverse_permutation(perm)
        out = jax.jit(f)(q[:, perm], k[:, perm], v[:, perm])[:, inv]
    else:
        out = jax.jit(f)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_ring_window_grads_match_dense(mesh):
    rng = np.random.default_rng(9)
    b, s, h, d = 1, 512, 2, 64
    win = (128, 0)
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    def ref_loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, window_size=win) * g
        )

    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    def ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, axis_name="model", causal=True, window_size=win
        )
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "model", None, None),) * 3,
        out_specs=P(None, "model", None, None),
        check_vma=False,
    )

    def loss(q, k, v):
        return jnp.sum(f(q, k, v) * g)

    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=3e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=3e-5)


def test_ring_dropout_matches_manual_merge(mesh):
    """Ring dropout: the sharded result must equal a single-device
    emulation that runs each (q-shard, kv-shard) pair with the same pair
    seed and merges with the lse rule — validates the seed plumbing and
    fwd mask reproducibility end to end."""
    from flash_attn_tpu.parallel.ring import _merge_partials, _pair_seed

    rng = np.random.default_rng(6)
    b, s, h, d = 1, 512, 2, 64
    n_dev = 4
    s_loc = s // n_dev
    p_drop, seed0 = 0.2, 1234
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)

    def ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, axis_name="model", causal=True,
            dropout_p=p_drop, dropout_seed=seed0,
        )
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "model", None, None),) * 3,
        out_specs=P(None, "model", None, None),
        check_vma=False,
    )
    out = np.asarray(jax.jit(f)(q, k, v))
    out2 = np.asarray(jax.jit(f)(q, k, v))
    np.testing.assert_array_equal(out, out2)  # deterministic

    # Manual emulation on one device.
    seed = jnp.uint32(seed0)
    for i in range(n_dev):
        qi = q[:, i * s_loc:(i + 1) * s_loc]
        qpos = jnp.broadcast_to(
            jnp.arange(s_loc, dtype=jnp.int32)[None] + i * s_loc, (b, s_loc))
        o_acc = jnp.zeros((b, s_loc, h, d), jnp.float32)
        lse_acc = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)
        zseg = jnp.zeros((b, s_loc), jnp.int32)
        for j in range(n_dev):
            kj = k[:, j * s_loc:(j + 1) * s_loc]
            vj = v[:, j * s_loc:(j + 1) * s_loc]
            kvpos = jnp.broadcast_to(
                jnp.arange(s_loc, dtype=jnp.int32)[None] + j * s_loc,
                (b, s_loc))
            o_j, lse_j = flash_attention(
                qi, kj, vj, causal=True,
                q_segment_ids=zseg, kv_segment_ids=zseg,
                q_positions=qpos, kv_positions=kvpos,
                dropout_p=p_drop,
                dropout_seed=_pair_seed(
                    seed, jnp.uint32(i), jnp.uint32(j)),
                return_lse=True,
            )
            o_acc, lse_acc = _merge_partials(o_acc, lse_acc, o_j, lse_j)
        np.testing.assert_allclose(
            out[:, i * s_loc:(i + 1) * s_loc],
            np.asarray(o_acc.astype(jnp.float32)),
            atol=2e-5,
        )
