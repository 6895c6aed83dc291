"""Blocksparse attention vs the expanded-mask oracle.

Methodology from the reference's blocksparse fixtures
(tests/test_flash_attn.py:176-215): random (s/16, s/256) cell masks at
~0.3 sparsity, expanded by repetition to the element mask, dual-reference
bound, dropout under the kernel's own regenerated mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels import prng
from flash_attn_tpu.ops.blocksparse import (
    blocksparse_attention,
    build_layout,
    expand_blockmask,
    flash_blocksparse_attn_func,
)
from flash_attn_tpu.reference import attention_ref
from flash_attn_tpu.utils.testing import assert_two_x_bound, random_qkv


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _rand_mask(rng, sq, sk, sparsity=0.35):
    nrow, ncol = (sq + 15) // 16, (sk + 255) // 256
    m = rng.random((nrow, ncol)) < sparsity
    return m


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seqlen", [256, 512, 600])
def test_blocksparse_fwd(dtype, causal, seqlen):
    rng = np.random.default_rng(seqlen + causal)
    b, h, d = 2, 2, 64
    q, k, v = random_qkv(rng, b, seqlen, seqlen, h, d, dtype)
    bm = _rand_mask(rng, seqlen, seqlen)
    out = blocksparse_attention(q, k, v, bm, causal=causal)
    emask = expand_blockmask(bm, seqlen, seqlen)
    ref32 = attention_ref(
        _to_bhsd(q).astype(jnp.float32),
        _to_bhsd(k).astype(jnp.float32),
        _to_bhsd(v).astype(jnp.float32),
        causal=causal, mask=emask,
    )
    refnat = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=causal, mask=emask,
        upcast=False,
    )
    atol = 2e-5 if dtype == jnp.float32 else 1e-4
    assert_two_x_bound(_to_bhsd(out), ref32, refnat, atol=atol, label="bs out")


def test_blocksparse_bwd():
    rng = np.random.default_rng(5)
    b, s, h, d = 2, 512, 2, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    bm = _rand_mask(rng, s, s)
    emask = expand_blockmask(bm, s, s)

    def loss(q, k, v):
        return jnp.sum(blocksparse_attention(q, k, v, bm, causal=True) * g)

    def loss_ref(q, k, v):
        out = attention_ref(
            _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), causal=True, mask=emask
        )
        return jnp.sum(out * _to_bhsd(g))

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(grads, grads_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_blocksparse_dropout_and_padding():
    rng = np.random.default_rng(6)
    b, s, h, d = 2, 512, 2, 64
    p = 0.17
    seed = jnp.uint32(3)
    lengths = [300, 512]
    kpm = np.zeros((b, s), bool)
    for i, li in enumerate(lengths):
        kpm[i, :li] = True
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    bm = _rand_mask(rng, s, s)
    out = blocksparse_attention(
        q, k, v, bm, causal=False, key_padding_mask=jnp.asarray(kpm),
        dropout_p=p, dropout_seed=seed,
    )
    emask = expand_blockmask(bm, s, s)
    # compose padding into the oracle mask
    pad = jnp.asarray(kpm)[:, None, None, :] & jnp.asarray(kpm)[:, None, :, None]
    keep = prng.dropout_mask_dense(seed, b, h, s, s, p)
    ref = attention_ref(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v),
        mask=emask[None, None] & pad, dropout_mask=keep, dropout_p=p,
    )
    got = _to_bhsd(out)
    # padded q rows are zero in the kernel; zero them in the ref too
    ref = ref * jnp.asarray(kpm)[:, None, :, None]
    got = got * jnp.asarray(kpm)[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4
    )


def test_blocksparse_zero_row_blocks():
    """A q block with no active kv cells must yield exactly zero output."""
    rng = np.random.default_rng(7)
    b, s, h, d = 1, 384, 1, 32
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    bm = np.zeros((s // 16 + 1, 2), bool)
    bm[: 128 // 16, :] = True  # only first 128 q rows attend anywhere
    out, lse = blocksparse_attention(q, k, v, bm, return_lse=True)
    np.testing.assert_array_equal(np.asarray(out[:, 128:]), 0.0)
    assert bool(jnp.all(jnp.isneginf(lse[:, :, 128:])))


def test_packed_interface_roundtrip():
    rng = np.random.default_rng(8)
    h, d, max_s = 2, 32, 256
    lengths = [200, 256, 100]
    total = sum(lengths)
    cu = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    qkv = jnp.asarray(rng.standard_normal((total, 3, h, d)), jnp.float32)
    bm = _rand_mask(rng, max_s, max_s, sparsity=0.5)
    out = flash_blocksparse_attn_func(qkv, cu, bm, 0.0, max_s, causal=True)
    assert out.shape == (total, h, d)
    # per-sequence check vs oracle in local coordinates
    emask_full = expand_blockmask(bm, max_s, max_s)
    for i, li in enumerate(lengths):
        sl = slice(int(cu[i]), int(cu[i] + li))
        qi = _to_bhsd(qkv[sl, 0][None])
        ki = _to_bhsd(qkv[sl, 1][None])
        vi = _to_bhsd(qkv[sl, 2][None])
        ref = attention_ref(qi, ki, vi, causal=True, mask=emask_full[:li, :li])
        got = _to_bhsd(out[sl][None])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4,
            err_msg=f"seq {i}",
        )


def test_blocksparse_mha_module():
    from flash_attn_tpu.models.blocksparse_modules import (
        FlashBlocksparseMHA,
        LocalGlobalSparsityConfig,
    )

    rng = np.random.default_rng(9)
    b, s, e, h = 2, 300, 64, 2
    x = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    mha = FlashBlocksparseMHA(
        embed_dim=e, num_heads=h,
        sparsity_config=LocalGlobalSparsityConfig(window=256),
        causal=True, max_seq_length=512,
    )
    params = mha.init(jax.random.PRNGKey(0), x)
    out = mha.apply(params, x)
    assert out.shape == (b, s, e)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_mask_bank_vs_rowmask_fallback(monkeypatch):
    """The precomputed elementwise mask bank and the in-kernel rowmask
    build are two implementations of the same mask; force the fallback
    (bank cap = 0) and assert identical fwd outputs and grads. Intervals
    are disabled so the bank actually engages (any mask with <= 2 active
    runs per row would otherwise take the interval path)."""
    import flash_attn_tpu.kernels.blocksparse as BS

    monkeypatch.setattr(BS, "ENABLE_INTERVAL_MASKS", False)
    rng = np.random.default_rng(11)
    b, h, d, s = 1, 2, 64, 512
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    bm = _rand_mask(rng, s, s)

    def run():
        layout = build_layout(bm, sq=s, sk=s, block_q=256, block_k=256,
                              causal=True)
        def loss(q, k, v):
            return jnp.sum(
                blocksparse_attention(q, k, v, bm, causal=True,
                                      block_q=256, block_k=256) * g)
        out = blocksparse_attention(q, k, v, bm, causal=True,
                                    block_q=256, block_k=256)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return layout, out, grads

    layout_bank, out_bank, g_bank = run()
    assert layout_bank.mask_bank is not None
    monkeypatch.setattr(BS, "MASK_BANK_MAX_BYTES", 0)
    layout_fb, out_fb, g_fb = run()
    assert layout_fb.mask_bank is None
    np.testing.assert_array_equal(np.asarray(out_bank), np.asarray(out_fb))
    for a, e in zip(g_bank, g_fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))


def test_interval_mask_vs_rowmask():
    """The per-row interval mask source (<= 2 contiguous runs per row:
    window+global / banded / causal masks) must match the in-kernel
    rowmask build exactly — fwd outputs AND grads — including rows where
    causal clips inside a run and rows with two runs (global + band)."""
    import flash_attn_tpu.kernels.blocksparse as BS

    rng = np.random.default_rng(13)
    b, h, d, s = 1, 2, 64, 1024
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    # window+global banded mask: 2 runs/row, band edges cross 256-tiles
    nrc, ncc = s // 16, s // 256
    bm = np.zeros((nrc, ncc), bool)
    for rc in range(nrc):
        c_of_r = (rc * 16) // 256
        bm[rc, max(0, c_of_r - 1): c_of_r + 1] = True  # band
        bm[rc, 0] = True  # global column block
    for causal in (False, True):
        def run():
            layout = build_layout(bm, sq=s, sk=s, block_q=256,
                                  block_k=256, causal=causal)
            out = blocksparse_attention(q, k, v, bm, causal=causal,
                                        block_q=256, block_k=256)
            grads = jax.grad(lambda *a: jnp.sum(
                blocksparse_attention(*a, bm, causal=causal, block_q=256,
                                      block_k=256) * g),
                argnums=(0, 1, 2))(q, k, v)
            return layout, out, grads

        saved_cap = BS.MASK_BANK_MAX_BYTES
        try:
            # Bank takes priority when it fits — zero the cap so the
            # interval path actually runs.
            BS.MASK_BANK_MAX_BYTES = 0
            lay_iv, out_iv, g_iv = run()
            assert lay_iv.row_intervals is not None
            assert lay_iv.mask_bank is None
            BS.ENABLE_INTERVAL_MASKS = False
            lay_rm, out_rm, g_rm = run()
        finally:
            BS.ENABLE_INTERVAL_MASKS = True
            BS.MASK_BANK_MAX_BYTES = saved_cap
        assert lay_rm.row_intervals is None
        np.testing.assert_array_equal(np.asarray(out_iv), np.asarray(out_rm))
        for a, e in zip(g_iv, g_rm):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(e))
