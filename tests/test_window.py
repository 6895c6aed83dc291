"""Sliding-window (local) attention: fwd/bwd correctness.

``window_size=(left, right)`` bounds the visible band per query: key j is
visible from query i iff i - left <= j <= i + right (None / -1 entries are
unbounded). The reference snapshot has no windowed kernel — this is a
capability extension (the CUDA flash_attn package added the same API in
v2.3); semantics follow that convention. Methodology: the dual-reference
2x error bound (reference tests/test_flash_attn.py:405-414) with the
window mask injected into the oracle via ``build_mask``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attention
from flash_attn_tpu.reference import (
    attention_lse_ref,
    attention_ref,
    build_mask,
)
from flash_attn_tpu.utils.testing import (
    assert_two_x_bound,
    max_err,
    random_qkv,
)


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _window_mask(sq, sk, causal, left, right):
    return build_mask(
        sq, sk, causal=causal, window_left=left, window_right=right
    )


def _refs(q, k, v, *, causal, left, right):
    qb, kb, vb = map(_to_bhsd, (q, k, v))
    mask = _window_mask(q.shape[1], k.shape[1], causal, left, right)
    ref32 = attention_ref(
        qb.astype(jnp.float32),
        kb.astype(jnp.float32),
        vb.astype(jnp.float32),
        mask=mask,
    )
    refnat = attention_ref(qb, kb, vb, mask=mask, upcast=False)
    return (
        jnp.transpose(ref32, (0, 2, 1, 3)),
        jnp.transpose(refnat, (0, 2, 1, 3)),
    )


WINDOWS = [
    (64, 0),  # causal-style local band
    (128, None),  # bounded history, unbounded future
    (None, 64),  # unbounded history, bounded future
    (64, 64),  # symmetric local band
]


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("left,right", WINDOWS)
@pytest.mark.parametrize("seqlen", [257, 512, 1025])
def test_fwd_window(causal, left, right, seqlen):
    if causal and right is not None and right > 0 and left is None:
        pytest.skip("causal subsumes the right bound")
    rng = np.random.default_rng(seed=hash((causal, left, right, seqlen)) % 2**32)
    b, h, d = (2, 2, 64) if seqlen < 1024 else (1, 1, 64)
    q, k, v = random_qkv(rng, b, seqlen, seqlen, h, d, jnp.bfloat16)
    out, lse = flash_attention(
        q, k, v, causal=causal, window_size=(left, right), return_lse=True
    )
    ref32, refnat = _refs(q, k, v, causal=causal, left=left, right=right)
    assert_two_x_bound(out, ref32, refnat, atol=1e-4, label="out")
    lse_ref = attention_lse_ref(
        _to_bhsd(q).astype(jnp.float32),
        _to_bhsd(k).astype(jnp.float32),
        _to_bhsd(v).astype(jnp.float32),
        mask=_window_mask(seqlen, seqlen, causal, left, right),
    )
    assert max_err(lse, lse_ref) < 5e-2


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("left,right", [(96, 0), (64, 64)])
@pytest.mark.parametrize("seqlen", [257, 512])
def test_bwd_window(causal, left, right, seqlen):
    rng = np.random.default_rng(seed=seqlen + (left or 0))
    b, h, d = 2, 2, 64
    dtype = jnp.bfloat16
    q, k, v = random_qkv(rng, b, seqlen, seqlen, h, d, dtype)
    g = jnp.asarray(rng.standard_normal((b, seqlen, h, d)), dtype=dtype)
    mask = _window_mask(seqlen, seqlen, causal, left, right)

    def loss_kernel(q, k, v):
        out = flash_attention(
            q, k, v, causal=causal, window_size=(left, right)
        )
        return jnp.sum(out * g)

    def loss_ref(q, k, v, upcast):
        qb, kb, vb = map(_to_bhsd, (q, k, v))
        out = attention_ref(qb, kb, vb, mask=mask, upcast=upcast)
        return jnp.sum(jnp.transpose(out, (0, 2, 1, 3)) * g)

    grads = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    q32, k32, v32 = (x.astype(jnp.float32) for x in (q, k, v))
    g32 = jax.grad(
        lambda *a: loss_ref(*a, upcast=True), argnums=(0, 1, 2)
    )(q32, k32, v32)
    gnat = jax.grad(
        lambda *a: loss_ref(*a, upcast=False), argnums=(0, 1, 2)
    )(q, k, v)
    for name, gk, gr, gn in zip("qkv", grads, g32, gnat):
        assert_two_x_bound(gk, gr, gn, atol=1e-3, label=f"d{name}")


def test_window_covering_everything_matches_unwindowed():
    rng = np.random.default_rng(0)
    q, k, v = random_qkv(rng, 2, 384, 384, 2, 64, jnp.bfloat16)
    full = flash_attention(q, k, v, causal=True)
    wide = flash_attention(q, k, v, causal=True, window_size=(384, 0))
    np.testing.assert_allclose(
        np.asarray(wide, np.float32), np.asarray(full, np.float32),
        atol=2e-2, rtol=0,
    )
    # -1 / None entries mean "unbounded" and must be exactly the
    # unwindowed kernel (same trace, no mask components added).
    neg1 = flash_attention(q, k, v, causal=True, window_size=(-1, -1))
    np.testing.assert_array_equal(np.asarray(neg1), np.asarray(full))


def test_window_zero_attends_self_only():
    # (0, 0): each query sees exactly its own key -> softmax weight 1 on
    # itself, output == v.
    rng = np.random.default_rng(1)
    q, k, v = random_qkv(rng, 1, 256, 256, 2, 64, jnp.float32)
    out = flash_attention(q, k, v, window_size=(0, 0))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(v), atol=1e-5, rtol=0
    )


def test_window_cross_attention():
    rng = np.random.default_rng(2)
    b, h, d = 2, 2, 64
    sq, sk = 128, 512
    q, k, v = random_qkv(rng, b, sq, sk, h, d, jnp.bfloat16)
    out = flash_attention(q, k, v, window_size=(64, 32))
    ref32, refnat = _refs(q, k, v, causal=False, left=64, right=32)
    assert_two_x_bound(out, ref32, refnat, atol=1e-4, label="out")


def test_window_gqa():
    rng = np.random.default_rng(3)
    b, s, d = 2, 384, 64
    q = jnp.asarray(rng.standard_normal((b, s, 8, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, 2, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, 2, d)), jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True, window_size=(128, 0))
    kx = jnp.repeat(k, 4, axis=2)
    vx = jnp.repeat(v, 4, axis=2)
    ref32, refnat = _refs(q, kx, vx, causal=True, left=128, right=None)
    assert_two_x_bound(out, ref32, refnat, atol=1e-4, label="out")
    # Gradients flow through the grouped heads.
    g = jnp.asarray(rng.standard_normal(q.shape), jnp.bfloat16)
    dq, dk, dv = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, causal=True, window_size=(128, 0)) * g
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    assert dk.shape == k.shape and dv.shape == v.shape
    assert bool(jnp.all(jnp.isfinite(dq.astype(jnp.float32))))


def test_window_varlen_segments():
    # Two packed sequences; the window applies to positions *within* each
    # segment (local positions), matching the varlen semantics of the
    # CUDA flash_attn window feature.
    rng = np.random.default_rng(4)
    b, s, h, d = 1, 384, 2, 64
    lens = [200, 184]
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.bfloat16)
    seg = jnp.asarray(
        np.concatenate([np.full(n, i) for i, n in enumerate(lens)])[None],
        jnp.int32,
    )
    pos = jnp.asarray(
        np.concatenate([np.arange(n) for n in lens])[None], jnp.int32
    )
    left = 64
    out = flash_attention(
        q, k, v,
        causal=True,
        q_segment_ids=seg, kv_segment_ids=seg,
        q_positions=pos, kv_positions=pos,
        window_size=(left, 0),
    )
    mask = build_mask(
        s, s, causal=True,
        q_positions=pos, kv_positions=pos,
        q_segment_ids=seg, kv_segment_ids=seg,
        window_left=left, window_right=None,
    )
    qb, kb, vb = map(_to_bhsd, (q, k, v))
    ref32 = attention_ref(
        qb.astype(jnp.float32), kb.astype(jnp.float32),
        vb.astype(jnp.float32), mask=mask[:, None],
    )
    refnat = attention_ref(qb, kb, vb, mask=mask[:, None], upcast=False)
    assert_two_x_bound(
        out,
        jnp.transpose(ref32, (0, 2, 1, 3)),
        jnp.transpose(refnat, (0, 2, 1, 3)),
        atol=1e-4,
        label="out",
    )


def test_window_dropout_deterministic():
    rng = np.random.default_rng(5)
    q, k, v = random_qkv(rng, 1, 256, 256, 2, 64, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal(q.shape), jnp.bfloat16)

    def loss(q, k, v):
        out = flash_attention(
            q, k, v, causal=True, window_size=(96, 0),
            dropout_p=0.2, dropout_seed=7,
        )
        return jnp.sum(out * g)

    v1, grads1 = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    v2, grads2 = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert float(v1) == float(v2)
    for a, b2 in zip(grads1, grads2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
        assert bool(jnp.all(jnp.isfinite(a.astype(jnp.float32))))


@pytest.mark.parametrize("left", [0, 64, 128, 200, 500])
def test_window_banded_grid_small_blocks(left):
    # Force 128-wide tiles at S=1024 (8x8 block grid) so the banded
    # linearized grid runs multi-block bands: wb = ceil(left/128) in
    # {0, 1, 1, 2, 4} live blocks left of the diagonal.
    from flash_attn_tpu.kernels.block_sizes import BlockSizes

    bs = BlockSizes(
        block_q=128, block_k=128, block_q_dkv=128, block_k_dkv=128,
        block_q_dq=128, block_k_dq=128,
    )
    rng = np.random.default_rng(seed=left)
    s = 1024
    q, k, v = random_qkv(rng, 1, s, s, 2, 64, jnp.bfloat16)
    out, lse = flash_attention(
        q, k, v, causal=True, window_size=(left, 0), block_sizes=bs,
        return_lse=True,
    )
    ref32, refnat = _refs(q, k, v, causal=True, left=left, right=None)
    assert_two_x_bound(out, ref32, refnat, atol=1e-4, label="out")
    lse_ref = attention_lse_ref(
        _to_bhsd(q).astype(jnp.float32),
        _to_bhsd(k).astype(jnp.float32),
        _to_bhsd(v).astype(jnp.float32),
        mask=_window_mask(s, s, True, left, None),
    )
    assert max_err(lse, lse_ref) < 5e-2

    # Gradients (rectangular bwd grid with band skipping) on one config.
    if left == 200:
        g = jnp.asarray(rng.standard_normal(q.shape), jnp.bfloat16)
        mask = _window_mask(s, s, True, left, None)

        def loss_kernel(q, k, v):
            out = flash_attention(
                q, k, v, causal=True, window_size=(left, 0),
                block_sizes=bs,
            )
            return jnp.sum(out * g)

        def loss_ref(q, k, v, upcast):
            qb, kb, vb = map(_to_bhsd, (q, k, v))
            o = attention_ref(qb, kb, vb, mask=mask, upcast=upcast)
            return jnp.sum(jnp.transpose(o, (0, 2, 1, 3)) * g)

        grads = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        q32, k32, v32 = (x.astype(jnp.float32) for x in (q, k, v))
        g32 = jax.grad(
            lambda *a: loss_ref(*a, upcast=True), argnums=(0, 1, 2)
        )(q32, k32, v32)
        gnat = jax.grad(
            lambda *a: loss_ref(*a, upcast=False), argnums=(0, 1, 2)
        )(q, k, v)
        for name, gk, gr, gn in zip("qkv", grads, g32, gnat):
            assert_two_x_bound(gk, gr, gn, atol=1e-3, label=f"d{name}")


def test_window_banded_non_multiple_seqlen():
    # Banded grid + bounds padding: S=1000 pads to 1024 with 128-tiles;
    # the last row's diagonal carries causal+bounds masking together.
    from flash_attn_tpu.kernels.block_sizes import BlockSizes

    bs = BlockSizes(
        block_q=128, block_k=128, block_q_dkv=128, block_k_dkv=128,
        block_q_dq=128, block_k_dq=128,
    )
    rng = np.random.default_rng(10)
    s = 1000
    q, k, v = random_qkv(rng, 1, s, s, 2, 64, jnp.bfloat16)
    out = flash_attention(
        q, k, v, causal=True, window_size=(300, 0), block_sizes=bs
    )
    ref32, refnat = _refs(q, k, v, causal=True, left=300, right=None)
    assert_two_x_bound(out, ref32, refnat, atol=1e-4, label="out")


def test_window_module():
    from flash_attn_tpu.models.modules import FlashMHA

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 256, 128)), jnp.float32)
    mha = FlashMHA(
        embed_dim=128, num_heads=2, causal=True, window_size=(64, 0)
    )
    params = mha.init(jax.random.key(0), x)
    out = mha.apply(params, x)
    assert out.shape == x.shape
    # Same params without the window must differ (the band is active).
    mha_full = FlashMHA(embed_dim=128, num_heads=2, causal=True)
    out_full = mha_full.apply(params, x)
    assert float(jnp.max(jnp.abs(out - out_full))) > 1e-3


def test_window_validation():
    rng = np.random.default_rng(6)
    q, k, v = random_qkv(rng, 1, 128, 128, 1, 64, jnp.bfloat16)
    with pytest.raises(ValueError, match="window_size"):
        flash_attention(q, k, v, window_size=(-2, 0))
    with pytest.raises(ValueError, match="window_size"):
        flash_attention(q, k, v, window_size=3)
