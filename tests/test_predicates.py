"""Property test: block_mask_predicates is conservative w.r.t. the
actual element mask under every window configuration (incl. the round-5
cell-quantized band + sink columns).

Invariants for every (iq, ik) block:
  - needs_mask == False  =>  every element in the block is visible
    (the mask-free fast path is only taken when masking cannot matter);
  - should_run == False  =>  no element in the block is visible
    (skipped blocks must be completely dead).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.common import (
    block_mask_predicates,
    window_band_mask,
)

BQ = BK = 256


def _element_mask(sq, sk, *, causal, wl, wr, cell, sinks):
    rows = np.arange(sq)[:, None]
    cols = np.arange(sk)[None, :]
    mask = np.ones((sq, sk), bool)
    if causal:
        mask &= rows >= cols
    band = window_band_mask(
        jnp.asarray(rows), jnp.asarray(cols), window_left=wl,
        window_right=wr, window_cell=cell, num_sinks=sinks)
    if band is not None:
        mask &= np.asarray(band)
    return mask


@pytest.mark.parametrize(
    "causal,wl,wr,cell,sinks",
    [
        (True, 300, None, None, 0),
        (True, 300, None, None, 64),
        (True, 300, None, (16, 256), 0),
        (True, 700, None, (16, 256), 512),
        (False, 200, 500, None, 0),
        (False, 200, 500, (16, 256), 300),
        (False, None, 400, (16, 256), 0),
        (True, 0, None, (16, 256), 256),
    ],
)
def test_predicates_conservative(causal, wl, wr, cell, sinks):
    sq = sk = 1024
    nq, nk = sq // BQ, sk // BK
    em = _element_mask(sq, sk, causal=causal, wl=wl, wr=wr, cell=cell,
                      sinks=sinks)
    for iq, ik in itertools.product(range(nq), range(nk)):
        needs_mask, should_run, have_mask, have_skip = jax.tree.map(
            lambda x: x,
            block_mask_predicates(
                jnp.int32(iq), jnp.int32(ik), block_q=BQ, block_k=BK,
                num_k_blocks=nk, causal=causal, bounds_possible=False,
                window_left=wl, window_right=wr, window_cell=cell,
                num_sinks=sinks,
            ),
        )
        blk = em[iq * BQ:(iq + 1) * BQ, ik * BK:(ik + 1) * BK]
        if have_mask and not bool(needs_mask):
            assert blk.all(), (iq, ik, "fast path but masked elements")
        if have_skip and not bool(should_run):
            assert not blk.any(), (iq, ik, "skipped but visible elements")


def test_window_band_mask_quantization_identities():
    """The quantized band equals the per-cell floor formulas exactly."""
    sq = sk = 2048
    cq, ck = 16, 256
    L, R = 700, 333
    rows = jnp.asarray(np.arange(sq)[:, None] + np.zeros((1, sk), int))
    cols = jnp.asarray(np.arange(sk)[None, :] + np.zeros((sq, 1), int))
    band = np.asarray(window_band_mask(
        rows, cols, window_left=L, window_right=R, window_cell=(cq, ck)))
    i = np.arange(sq)[:, None]
    j = np.arange(sk)[None, :]
    rc = i // cq
    cc = j // ck
    lo = (rc * cq - L) // ck  # floor division, may be negative
    hi = (rc * cq + cq - 1 + R) // ck
    expect = (cc >= lo) & (cc <= hi)
    np.testing.assert_array_equal(band, expect)
