"""Blocksparse band routing (round 5, VERDICT #5): band-shaped blockmasks
dispatch to the dense window kernel with an EXACT cell-quantized mask.

The contract: for any blockmask that detect_band accepts, the routed path
computes the same function as the generic blocksparse kernel —
expand(blockmask) & causal & bounds — including LSE, gradients, and
dropout (same coordinate-hash PRNG in both kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flash_attn_tpu.ops.blocksparse as bs_ops
from flash_attn_tpu.kernels.blocksparse import (
    COL_CELL,
    ROW_CELL,
    build_layout,
    detect_band,
)
from flash_attn_tpu.ops.blocksparse import (
    blocksparse_attention,
    expand_blockmask,
)
from flash_attn_tpu.reference import attention_ref, build_mask
from flash_attn_tpu.utils.testing import random_qkv


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _cellify(emask):
    """Cell mask from an element mask: cell active iff ANY element is."""
    sq, sk = emask.shape
    nr = -(-sq // ROW_CELL)
    nc = -(-sk // COL_CELL)
    p = np.zeros((nr * ROW_CELL, nc * COL_CELL), bool)
    p[:sq, :sk] = np.asarray(emask)
    return p.reshape(nr, ROW_CELL, nc, COL_CELL).any(axis=(1, 3))


def _band_cells(sq, sk, *, causal, left=None, right=None, sinks=0):
    em = np.asarray(
        build_mask(sq, sk, causal=causal, window_left=left,
                   window_right=right)
    )
    if sinks:
        em = em | (np.arange(sk)[None, :] < sinks)
        if causal:
            em &= np.arange(sq)[:, None] >= np.arange(sk)[None, :]
    return _cellify(em)


# ---------------------------------------------------------------- detector

@pytest.mark.parametrize(
    "causal,left,right,sinks",
    [
        (True, 700, None, 0),
        (True, 1024, None, 512),
        (False, 300, 500, 0),
        (False, None, 900, 0),
        (True, None, None, 0),  # pure causal -> dense route
    ],
)
def test_detect_band_accepts_and_reconstructs(causal, left, right, sinks):
    sq = sk = 4096
    bm = _band_cells(sq, sk, causal=causal, left=left, right=right,
                     sinks=sinks)
    route = detect_band(bm, sq=sq, sk=sk, causal=causal)
    assert route is not None, (causal, left, right, sinks)
    wl, wr, g = route
    # The detected parameters must reproduce the cell mask exactly when
    # pushed through the kernel's quantization identities.
    nr, nc = bm.shape
    r = np.arange(nr)[:, None] * ROW_CELL
    b_ = r + ROW_CELL - 1
    cc = np.arange(nc)[None, :]
    lo = np.zeros_like(r) if wl is None else np.maximum(
        (r - wl) // COL_CELL, 0)
    hi = np.full_like(r, nc - 1) if wr is None else np.minimum(
        (b_ + wr) // COL_CELL, nc - 1)
    if causal:
        hi = np.minimum(hi, b_ // COL_CELL)
    pred = (cc >= lo) & (cc <= hi)
    pred |= cc < g // COL_CELL
    if causal:
        pred &= cc * COL_CELL <= b_
    bm_eff = bm.copy()
    if causal:
        bm_eff &= (np.arange(nr)[:, None] + 1) * ROW_CELL - 1 >= (
            cc * COL_CELL)
    assert np.array_equal(pred, bm_eff)


def test_detect_band_rejects_non_bands():
    sq = sk = 2048
    rng = np.random.default_rng(0)
    rand = rng.random((sq // ROW_CELL, sk // COL_CELL)) < 0.5
    assert detect_band(rand, sq=sq, sk=sk, causal=False) is None
    band = _band_cells(sq, sk, causal=True, left=700)
    hole = band.copy()
    hole[60, int(np.flatnonzero(hole[60])[0])] = False  # punch a hole
    assert detect_band(hole, sq=sq, sk=sk, causal=True) is None
    # 3 runs in a row
    tri = _band_cells(sq, sk, causal=False, left=200, right=200)
    tri[:, 0] = True
    tri[:, 4] = True
    assert detect_band(tri, sq=sq, sk=sk, causal=False) is None


def test_detect_band_roundtrip_fuzz():
    """For ANY (L, R, g, causal) the cellified band must be detected with
    parameters that reconstruct it exactly (the verifier makes a wrong
    route impossible; this checks the solver does not MISS)."""
    rng = np.random.default_rng(7)
    sq = sk = 2048
    for _ in range(40):
        causal = bool(rng.integers(0, 2))
        left = int(rng.integers(0, sk)) if rng.random() < 0.8 else None
        right = (
            None if causal or rng.random() < 0.3
            else int(rng.integers(0, sk // 2))
        )
        sinks = int(rng.integers(0, 4)) * COL_CELL \
            if rng.random() < 0.4 else 0
        if left is None and right is None and not causal:
            continue  # empty config: full mask, covered elsewhere
        bm = _band_cells(sq, sk, causal=causal, left=left, right=right,
                         sinks=sinks)
        if not bm.any():
            continue
        route = detect_band(bm, sq=sq, sk=sk, causal=causal)
        assert route is not None, (causal, left, right, sinks)
        wl, wr, g = route
        # Reconstruct with the detected parameters and compare.
        nr, nc2 = bm.shape
        r = np.arange(nr)[:, None] * ROW_CELL
        b_ = r + ROW_CELL - 1
        cc = np.arange(nc2)[None, :]
        lo = np.zeros_like(r) if wl is None else np.maximum(
            (r - wl) // COL_CELL, 0)
        hi = np.full_like(r, nc2 - 1) if wr is None else np.minimum(
            (b_ + wr) // COL_CELL, nc2 - 1)
        if causal:
            hi = np.minimum(hi, b_ // COL_CELL)
        pred = (cc >= lo) & (cc <= hi)
        pred |= cc < g // COL_CELL
        if causal:
            pred &= cc * COL_CELL <= b_
        bm_eff = bm.copy()
        if causal:
            bm_eff &= (np.arange(nr)[:, None] + 1) * ROW_CELL - 1 >= (
                cc * COL_CELL)
        assert np.array_equal(pred, bm_eff), (causal, left, right, sinks,
                                              route)


def test_build_layout_stores_band_route():
    sq = sk = 2048
    bm = _band_cells(sq, sk, causal=True, left=900)
    lay = build_layout(bm, sq=sq, sk=sk, causal=True)
    assert lay.band_route is not None
    rng = np.random.default_rng(1)
    rand = rng.random(bm.shape) < 0.4
    lay2 = build_layout(rand, sq=sq, sk=sk, causal=False)
    assert lay2.band_route is None


# ------------------------------------------------------------- numerics

def _oracle(q, k, v, bm, causal, sq):
    emask = expand_blockmask(bm, sq, sq)
    if causal:
        emask = emask & np.asarray(build_mask(sq, sq, causal=True))
    ref = attention_ref(
        *(x.astype(jnp.float32) for x in map(_to_bhsd, (q, k, v))),
        mask=jnp.asarray(emask),
    )
    return _to_bhsd(ref)


@pytest.mark.parametrize(
    "causal,left,right,sinks",
    [(True, 700, None, 0), (True, 1000, None, 512), (False, 300, 500, 0)],
)
def test_routed_matches_oracle_and_generic(causal, left, right, sinks,
                                           monkeypatch):
    import flash_attn_tpu.kernels.blocksparse as kbs

    # Bank-less layout: the measured dispatch policy routes causal
    # left-bands exactly when the mask bank is unavailable (long-S
    # regime); forcing it off here engages the routed path at test size.
    monkeypatch.setattr(kbs, "MASK_BANK_MAX_BYTES", 0)
    sq = 1536
    rng = np.random.default_rng(2)
    b, h, d = 1, 2, 64
    q, k, v = random_qkv(rng, b, sq, sq, h, d, jnp.float32)
    bm = _band_cells(sq, sq, causal=causal, left=left, right=right,
                     sinks=sinks)
    lay = build_layout(bm, sq=sq, sk=sq, causal=causal)
    assert lay.band_route is not None
    if causal and sinks == 0:
        assert bs_ops.band_route_plan(lay, causal) is not None

    out = blocksparse_attention(q, k, v, lay, causal=causal)
    ref = _oracle(q, k, v, bm, causal, sq)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    # And against the generic blocksparse kernel path (route disabled).
    old = bs_ops.ENABLE_BAND_ROUTE
    bs_ops.ENABLE_BAND_ROUTE = False
    try:
        out_generic = blocksparse_attention(q, k, v, lay, causal=causal)
    finally:
        bs_ops.ENABLE_BAND_ROUTE = old
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_generic), atol=2e-5, rtol=1e-4)


def test_routed_lse_and_grads_match_generic(monkeypatch):
    import flash_attn_tpu.kernels.blocksparse as kbs

    monkeypatch.setattr(kbs, "MASK_BANK_MAX_BYTES", 0)
    sq = 1280
    rng = np.random.default_rng(3)
    b, h, d = 1, 2, 64
    q, k, v = random_qkv(rng, b, sq, sq, h, d, jnp.float32)
    g_cot = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    bm = _band_cells(sq, sq, causal=True, left=640)
    lay = build_layout(bm, sq=sq, sk=sq, causal=True)
    assert bs_ops.band_route_plan(lay, True) is not None

    def run_lse(q, k, v):
        return blocksparse_attention(q, k, v, lay, causal=True,
                                     return_lse=True)

    def loss(q, k, v):
        # Grads through the plain call: the generic return_lse path has
        # no custom vjp (fwd-only, like the reference's softmax_lse).
        return jnp.sum(
            blocksparse_attention(q, k, v, lay, causal=True) * g_cot)

    out, lse = run_lse(q, k, v)
    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    old = bs_ops.ENABLE_BAND_ROUTE
    bs_ops.ENABLE_BAND_ROUTE = False
    try:
        out_g, lse_g = run_lse(q, k, v)
        grads_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        bs_ops.ENABLE_BAND_ROUTE = old

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_g),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_g),
                               atol=2e-5, rtol=1e-5)
    for a, b_, name in zip(grads, grads_g, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=2e-3,
            err_msg=f"d{name}")


def test_routed_dropout_matches_generic(monkeypatch):
    """Both kernels hash dropout on the same global (bh, i, j) coords, so
    the routed path must agree under the same seed."""
    import flash_attn_tpu.kernels.blocksparse as kbs

    monkeypatch.setattr(kbs, "MASK_BANK_MAX_BYTES", 0)
    sq = 1024
    rng = np.random.default_rng(4)
    b, h, d = 1, 2, 64
    q, k, v = random_qkv(rng, b, sq, sq, h, d, jnp.float32)
    bm = _band_cells(sq, sq, causal=True, left=520)
    lay = build_layout(bm, sq=sq, sk=sq, causal=True)
    assert bs_ops.band_route_plan(lay, True) is not None
    kw = dict(causal=True, dropout_p=0.17, dropout_seed=jnp.uint32(9))

    out = blocksparse_attention(q, k, v, lay, **kw)
    old = bs_ops.ENABLE_BAND_ROUTE
    bs_ops.ENABLE_BAND_ROUTE = False
    try:
        out_g = blocksparse_attention(q, k, v, lay, **kw)
    finally:
        bs_ops.ENABLE_BAND_ROUTE = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_g),
                               atol=5e-5, rtol=1e-4)


def test_window_cell_noncausal_direct_vs_oracle():
    """The non-causal cell-quantized window + sinks KERNEL path, called
    directly (the blocksparse dispatch policy keeps non-causal bands on
    the generic kernel, so this path's coverage lives here)."""
    from flash_attn_tpu import flash_attention

    s = 1024
    rng = np.random.default_rng(6)
    b, h, d = 1, 2, 64
    L, R, g = 200, 500, 300
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    out = flash_attention(
        q, k, v, window_size=(L, R), num_sinks=g,
        window_cell=(ROW_CELL, COL_CELL))
    i = np.arange(s)[:, None]
    j = np.arange(s)[None, :]
    rc, cc = i // ROW_CELL, j // COL_CELL
    lo = (rc * ROW_CELL - L) // COL_CELL
    hi = (rc * ROW_CELL + ROW_CELL - 1 + R) // COL_CELL
    em = ((cc >= lo) & (cc <= hi)) | (j < g)
    ref = attention_ref(
        *(x.astype(jnp.float32) for x in map(_to_bhsd, (q, k, v))),
        mask=jnp.asarray(em))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4)


def test_key_padding_stays_on_generic_path():
    """key_padding_mask composes via segments, which the window route
    cannot express — must fall back to the generic kernel."""
    sq = 1024
    rng = np.random.default_rng(5)
    b, h, d = 2, 2, 64
    q, k, v = random_qkv(rng, b, sq, sq, h, d, jnp.float32)
    bm = _band_cells(sq, sq, causal=True, left=520)
    lay = build_layout(bm, sq=sq, sk=sq, causal=True)
    kpm = jnp.asarray(
        np.arange(sq)[None, :] < np.asarray([sq, 700])[:, None])
    out = blocksparse_attention(
        q, k, v, lay, causal=True, key_padding_mask=kpm)
    emask = np.asarray(expand_blockmask(bm, sq, sq)) & np.asarray(
        build_mask(sq, sq, causal=True))
    emask = emask[None] & np.asarray(kpm)[:, None, :] & np.asarray(
        kpm)[:, :, None]
    ref = attention_ref(
        *(x.astype(jnp.float32) for x in map(_to_bhsd, (q, k, v))),
        mask=jnp.asarray(emask)[:, None],
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_to_bhsd(ref)), atol=2e-5, rtol=1e-4)
