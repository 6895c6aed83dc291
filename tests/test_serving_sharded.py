"""Head-TP sharded serving attention (serving/sharding.py): sharded
results must equal the single-device kernels exactly (no collectives
are involved — heads partition cleanly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.kernels.chunk import paged_chunk_attention
from flash_attn_tpu.kernels.decode import paged_decode_attention
from flash_attn_tpu.ops.attention import alibi_slopes
from flash_attn_tpu.serving.sharding import (
    make_sharded_chunk_attention,
    make_sharded_paged_decode,
)


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("model",))


def _paged(rng, n_kv, num_pages, page_size, d, batch, lengths, pps):
    k_pages = jnp.asarray(
        rng.standard_normal((n_kv, num_pages, page_size, d)), jnp.float32
    )
    v_pages = jnp.asarray(
        rng.standard_normal((n_kv, num_pages, page_size, d)), jnp.float32
    )
    table = np.zeros((batch, pps), np.int32)
    used = iter(rng.permutation(num_pages))
    for b, ln in enumerate(lengths):
        n = (ln + page_size - 1) // page_size
        table[b, :n] = [next(used) for _ in range(n)]
    return k_pages, v_pages, jnp.asarray(table)


def _put(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


@pytest.mark.parametrize("group", [1, 2])
def test_sharded_decode_matches_single(group):
    rng = np.random.default_rng(0)
    n_kv, d, ps, num_pages, pps = 4, 64, 128, 32, 4
    lengths = [100, 400, 1]
    batch, n_q = len(lengths), n_kv * group
    q = jnp.asarray(rng.standard_normal((batch, n_q, d)), jnp.float32)
    kp, vp, table = _paged(rng, n_kv, num_pages, ps, d, batch, lengths, pps)
    ln = jnp.asarray(lengths, jnp.int32)
    slopes = alibi_slopes(n_q)

    ref = paged_decode_attention(
        q, kp, vp, ln, table, alibi_slopes=slopes, softcap=25.0
    )
    mesh = _mesh(4)
    f = make_sharded_paged_decode(mesh, softcap=25.0)
    page_spec = P("model", None, None, None)
    out = jax.jit(
        lambda *a: f(*a, alibi_slopes=slopes)
    )(
        _put(mesh, q, P(None, "model", None)),
        _put(mesh, kp, page_spec),
        _put(mesh, vp, page_spec),
        ln, table,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6
    )


def test_sharded_chunk_matches_single():
    rng = np.random.default_rng(1)
    n_kv, d, ps, num_pages, pps = 4, 64, 128, 32, 4
    sq = 8
    lengths = [200, 350]
    batch = len(lengths)
    q = jnp.asarray(
        rng.standard_normal((batch, sq, n_kv, d)), jnp.float32
    )
    kp, vp, table = _paged(rng, n_kv, num_pages, ps, d, batch, lengths, pps)
    ln = jnp.asarray(lengths, jnp.int32)
    cl = jnp.asarray([sq, 5], jnp.int32)

    ref = paged_chunk_attention(
        q, kp, vp, ln, table, chunk_lens=cl, window_left=120
    )
    mesh = _mesh(4)
    f = make_sharded_chunk_attention(mesh, window_left=120)
    page_spec = P("model", None, None, None)
    out = jax.jit(
        lambda *a: f(*a, chunk_lens=cl)
    )(
        _put(mesh, q, P(None, None, "model", None)),
        _put(mesh, kp, page_spec),
        _put(mesh, vp, page_spec),
        ln, table,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6
    )


def test_sharded_decode_rejects_uneven_heads():
    rng = np.random.default_rng(2)
    n_kv, d, ps = 2, 64, 128  # 2 kv heads over tp=4: invalid
    q = jnp.asarray(rng.standard_normal((1, 2, d)), jnp.float32)
    kp = jnp.zeros((n_kv, 4, ps, d), jnp.float32)
    mesh = _mesh(4)
    f = make_sharded_paged_decode(mesh)
    with pytest.raises(ValueError, match="kv heads"):
        f(q, kp, kp, jnp.asarray([1], jnp.int32),
          jnp.zeros((1, 2), jnp.int32))
