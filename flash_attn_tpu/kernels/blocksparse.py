"""Blocksparse flash attention (forward + backward).

Capability parity with the reference's blocksparse surface
(flash_attn/flash_blocksparse_attn_interface.py): a 0/1 block mask at
16-row x 256-column granularity over the attention matrix gates which
score blocks are computed, with causal masking, dropout, and key-padding
composed on top.

TPU-native redesign (SURVEY.md section 7): instead of the reference's
sorted-column index format with first/last flag bits
(convert_blockmask, flash_blocksparse_attn_interface.py:8-40), the layout
compiles to per-q-block lists of active kv-block indices consumed through
``PrefetchScalarGridSpec`` — the kernel's BlockSpec index_map reads the
next active block id from SMEM, so *skipped blocks are never DMA'd from
HBM at all* (true bandwidth sparsity, not just compute predication). Tail
grid slots repeat the previous block index (Pallas elides the re-fetch)
and are predicated off by the per-row active counts.

Kernel tiling: block_k = 256 (exactly one mask column-cell per kv tile);
the 16-row mask granularity inside a q tile is applied via a per-row
"rowmask" bitmap refined elementwise.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels import prng
from flash_attn_tpu.kernels.common import DEFAULT_MASK_VALUE, NUM_LANES

ROW_CELL = 16  # mask granularity along q (reference blockmask rows)
COL_CELL = 256  # mask granularity along k (reference blockmask cols)
BLOCK_K = COL_CELL  # kv tile == one mask column cell


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BlockSparseLayout:
    """Compiled sparsity layout (static per (blockmask, shapes, causal))."""

    sq_pad: int
    sk_pad: int
    block_q: int
    kv_indices: jax.Array  # (nq, max_kv) int32, tail-padded by repetition
    kv_counts: jax.Array  # (nq,) int32
    q_indices: jax.Array  # (nk, max_q) int32
    q_counts: jax.Array  # (nk,) int32
    rowmask: jax.Array  # (sq_pad, ncol_pad) int32: 1 = cell active
    causal: bool

    @property
    def max_kv(self):
        return self.kv_indices.shape[1]

    @property
    def max_q(self):
        return self.q_indices.shape[1]


def build_layout(
    blockmask: np.ndarray | jax.Array,
    *,
    sq: int,
    sk: int,
    block_q: int = 128,
    causal: bool = False,
) -> BlockSparseLayout:
    """Compile a (ceil(sq/16), ceil(sk/256)) 0/1 blockmask into the kernel
    layout. Host-side (numpy) — layouts are built once per config, like the
    reference's registered buffer (flash_blocksparse_attention.py:32-36).
    """
    blockmask = np.asarray(blockmask).astype(bool)
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, BLOCK_K)
    nq = sq_pad // block_q
    nk = sk_pad // BLOCK_K
    n_row_cells = sq_pad // ROW_CELL
    if blockmask.shape[0] < (sq + ROW_CELL - 1) // ROW_CELL or blockmask.shape[1] < (
        sk + COL_CELL - 1
    ) // COL_CELL:
        raise ValueError(
            f"blockmask {blockmask.shape} too small for sq={sq}, sk={sk}"
        )
    # pad/trim to padded grid
    bm = np.zeros((n_row_cells, nk), bool)
    r = min(blockmask.shape[0], n_row_cells)
    c = min(blockmask.shape[1], nk)
    bm[:r, :c] = blockmask[:r, :c]

    # block-level activity: q block active for kv block if ANY of its row
    # cells is active (finer rows are refined in-kernel via rowmask)
    rows_per_block = block_q // ROW_CELL
    blk = bm.reshape(nq, rows_per_block, nk).any(axis=1)  # (nq, nk)
    if causal:
        # drop kv blocks entirely above the causal diagonal
        qi = np.arange(nq)[:, None]
        ki = np.arange(nk)[None, :]
        reachable = (qi + 1) * block_q - 1 >= ki * BLOCK_K
        blk = blk & reachable

    def index_lists(mat):  # mat (n, m) -> indices (n, max) tail-repeat, counts
        counts = mat.sum(axis=1).astype(np.int32)
        max_n = max(int(counts.max()), 1)
        idx = np.zeros((mat.shape[0], max_n), np.int32)
        for i in range(mat.shape[0]):
            active = np.nonzero(mat[i])[0]
            if len(active):
                idx[i, : len(active)] = active
                idx[i, len(active):] = active[-1]  # repeat: no extra DMA
            # count 0: leave zeros (fetched but predicated off)
        return jnp.asarray(idx), jnp.asarray(counts)

    kv_indices, kv_counts = index_lists(blk)
    q_indices, q_counts = index_lists(blk.T)

    # per-row x per-col-cell activity map, lanes padded to 128
    ncol_pad = _round_up(max(nk, 1), NUM_LANES)
    rowmask = np.zeros((sq_pad, ncol_pad), np.int32)
    rowmask[: n_row_cells * ROW_CELL, :nk] = np.repeat(
        bm.astype(np.int32), ROW_CELL, axis=0
    )
    return BlockSparseLayout(
        sq_pad=sq_pad,
        sk_pad=sk_pad,
        block_q=block_q,
        kv_indices=kv_indices,
        kv_counts=kv_counts,
        q_indices=q_indices,
        q_counts=q_counts,
        rowmask=jnp.asarray(rowmask),
        causal=causal,
    )


def convert_blockmask(blockmask, causal, *, sq=None, sk=None, block_q=128):
    """Reference-named entry point (flash_blocksparse_attn_interface.py:8):
    compiles the blockmask to the TPU layout (not the CUDA sorted-column
    format — see module docstring)."""
    bm = np.asarray(blockmask)
    if sq is None:
        sq = bm.shape[0] * ROW_CELL
    if sk is None:
        sk = bm.shape[1] * COL_CELL
    return build_layout(bm, sq=sq, sk=sk, block_q=block_q, causal=causal)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _mask_for_tile(
    rowmask_tile, cell, rows, cols, *, sk, causal, seg_refs
):
    """(block_q, BLOCK_K) bool mask for one active tile."""
    bq, ncol = rowmask_tile.shape
    # Select lane `cell` without dynamic_slice (not lowerable in Mosaic):
    # masked lane reduction on the (bq, ncol<=128) bitmap.
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, ncol), 1)
    row_act = (
        jnp.sum(jnp.where(lane == cell, rowmask_tile, 0), axis=1, keepdims=True)
        > 0
    )
    mask = row_act & (cols < sk)
    if causal:
        mask = mask & (rows >= cols)
    if seg_refs is not None:
        qseg_ref, kseg_ref = seg_refs
        qs = qseg_ref[0][:, None]
        ks = kseg_ref[0][None, :]
        mask = mask & (qs == ks) & (ks >= 0) & (qs >= 0)
    return mask


def _bs_fwd_kernel(
    kv_idx_ref,  # scalar prefetch (nq, max_kv)
    kv_cnt_ref,  # scalar prefetch (nq,)
    *refs,
    sk: int,
    block_q: int,
    max_kv: int,
    causal: bool,
    has_segments: bool,
    scale: float,
    p_drop: float,
    num_heads: int,
):
    idx = 0
    if p_drop > 0.0:
        seed_ref = refs[idx]
        idx += 1
    q_ref, k_ref, v_ref, rowmask_ref = refs[idx : idx + 4]
    idx += 4
    seg_refs = None
    if has_segments:
        seg_refs = (refs[idx], refs[idx + 1])
        idx += 2
    o_ref, lse_ref, m_ref, l_ref, acc_ref = refs[idx : idx + 5]

    iq = pl.program_id(2)
    j = pl.program_id(3)
    bh = pl.program_id(0) * num_heads + pl.program_id(1)
    cell = kv_idx_ref[iq, j]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j < kv_cnt_ref[iq])
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        c = jnp.float32(scale * 1.4426950408889634)
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, BLOCK_K), 0)
            + iq * block_q
        )
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, BLOCK_K), 1)
            + cell * BLOCK_K
        )
        mask = _mask_for_tile(
            rowmask_ref[...], cell, rows, cols, sk=sk, causal=causal,
            seg_refs=seg_refs,
        )
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_curr = jnp.max(s, axis=1, keepdims=True) * c
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s * c - m_next[:, 0:1])
        p = jnp.where(mask, p, 0.0)
        l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next
        if p_drop > 0.0:
            keep = prng.keep_mask(
                seed_ref[0, 0],
                bh.astype(jnp.uint32),
                rows.astype(jnp.uint32),
                cols.astype(jnp.uint32),
                p_drop,
            )
            p = jnp.where(keep, p, 0.0)
        v = v_ref[0, 0]
        acc_ref[...] = acc_ref[...] * alpha[:, 0:1] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == max_kv - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        if p_drop > 0.0:
            l_inv = l_inv * (1.0 / (1.0 - p_drop))
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        m0 = m_ref[...]
        l0 = l_ref[...]
        lse_ref[0, 0] = jnp.where(
            l0 == 0.0,
            -jnp.inf,
            m0 * jnp.float32(0.6931471805599453) + jnp.log(l0),
        )


def blocksparse_attention_fwd(
    q,  # (b, h, sq_pad, d)
    k,
    v,
    layout: BlockSparseLayout,
    q_segment_ids,  # (b, sq_pad) int32 or None
    kv_segment_ids,
    dropout_seed,
    *,
    sk: int,
    softmax_scale: float,
    dropout_p: float = 0.0,
    interpret: bool = False,
):
    b, h, sq_pad, d = q.shape
    bq = layout.block_q
    assert sq_pad == layout.sq_pad and k.shape[2] == layout.sk_pad
    nq = sq_pad // bq
    max_kv = layout.max_kv
    has_segments = q_segment_ids is not None
    p_drop = float(dropout_p)

    in_specs = []
    args = []
    if p_drop > 0.0:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(dropout_seed.reshape(1, 1).astype(jnp.uint32))
    in_specs += [
        pl.BlockSpec(
            (1, 1, bq, d),
            lambda b_, h_, iq, j, idx, cnt: (b_, h_, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, BLOCK_K, d),
            lambda b_, h_, iq, j, idx, cnt: (b_, h_, idx[iq, j], 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, BLOCK_K, d),
            lambda b_, h_, iq, j, idx, cnt: (b_, h_, idx[iq, j], 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (bq, layout.rowmask.shape[1]),
            lambda b_, h_, iq, j, idx, cnt: (iq, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args += [q, k, v, layout.rowmask]
    if has_segments:
        in_specs += [
            pl.BlockSpec(
                (1, bq), lambda b_, h_, iq, j, idx, cnt: (b_, iq),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_K),
                lambda b_, h_, iq, j, idx, cnt: (b_, idx[iq, j]),
                memory_space=pltpu.VMEM,
            ),
        ]
        args += [
            q_segment_ids.astype(jnp.int32),
            kv_segment_ids.astype(jnp.int32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, nq, max_kv),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, bq, d),
                lambda b_, h_, iq, j, idx, cnt: (b_, h_, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bq, NUM_LANES),
                lambda b_, h_, iq, j, idx, cnt: (b_, h_, iq, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _bs_fwd_kernel,
        sk=sk,
        block_q=bq,
        max_kv=max_kv,
        causal=layout.causal,
        has_segments=has_segments,
        scale=float(softmax_scale),
        p_drop=p_drop,
        num_heads=h,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_pad, NUM_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(layout.kv_indices, layout.kv_counts, *args)
    return out, lse


def _bs_dkv_kernel(
    q_idx_ref,  # (nk, max_q)
    q_cnt_ref,  # (nk,)
    *refs,
    sk: int,
    block_q: int,
    max_q: int,
    causal: bool,
    has_segments: bool,
    scale: float,
    p_drop: float,
    num_heads: int,
):
    idx = 0
    if p_drop > 0.0:
        seed_ref = refs[idx]
        idx += 1
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, rowmask_ref = refs[idx : idx + 7]
    idx += 7
    seg_refs = None
    if has_segments:
        seg_refs = (refs[idx], refs[idx + 1])
        idx += 2
    dk_ref, dv_ref, dk_acc, dv_acc = refs[idx : idx + 4]

    ik = pl.program_id(2)  # kv cell index (== block index, BLOCK_K = COL_CELL)
    j = pl.program_id(3)
    bh = pl.program_id(0) * num_heads + pl.program_id(1)
    iq = q_idx_ref[ik, j]

    @pl.when(j == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(j < q_cnt_ref[ik])
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0][:, 0:1] * jnp.float32(1.4426950408889634)
        di_col = di_ref[0, 0][:, 0:1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        c = jnp.float32(scale * 1.4426950408889634)
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, BLOCK_K), 0)
            + iq * block_q
        )
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, BLOCK_K), 1)
            + ik * BLOCK_K
        )
        mask = _mask_for_tile(
            rowmask_ref[...], ik, rows, cols, sk=sk, causal=causal,
            seg_refs=seg_refs,
        )
        p = jnp.where(mask, jnp.exp2(s * c - lse2), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if p_drop > 0.0:
            keep = prng.keep_mask(
                seed_ref[0, 0], bh.astype(jnp.uint32),
                rows.astype(jnp.uint32), cols.astype(jnp.uint32), p_drop,
            )
            rp = jnp.float32(1.0 / (1.0 - p_drop))
            p_dropped = jnp.where(keep, p, 0.0) * rp
            dp = jnp.where(keep, dp, 0.0) * rp
        else:
            p_dropped = p
        dv_acc[...] += jax.lax.dot_general(
            p_dropped.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di_col) * jnp.float32(scale)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == max_q - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bs_dq_kernel(
    kv_idx_ref,
    kv_cnt_ref,
    *refs,
    sk: int,
    block_q: int,
    max_kv: int,
    causal: bool,
    has_segments: bool,
    scale: float,
    p_drop: float,
    num_heads: int,
):
    idx = 0
    if p_drop > 0.0:
        seed_ref = refs[idx]
        idx += 1
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, rowmask_ref = refs[idx : idx + 7]
    idx += 7
    seg_refs = None
    if has_segments:
        seg_refs = (refs[idx], refs[idx + 1])
        idx += 2
    dq_ref, dq_acc = refs[idx : idx + 2]

    iq = pl.program_id(2)
    j = pl.program_id(3)
    bh = pl.program_id(0) * num_heads + pl.program_id(1)
    cell = kv_idx_ref[iq, j]

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(j < kv_cnt_ref[iq])
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0][:, 0:1] * jnp.float32(1.4426950408889634)
        di_col = di_ref[0, 0][:, 0:1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        c = jnp.float32(scale * 1.4426950408889634)
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, BLOCK_K), 0)
            + iq * block_q
        )
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, BLOCK_K), 1)
            + cell * BLOCK_K
        )
        mask = _mask_for_tile(
            rowmask_ref[...], cell, rows, cols, sk=sk, causal=causal,
            seg_refs=seg_refs,
        )
        p = jnp.where(mask, jnp.exp2(s * c - lse2), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if p_drop > 0.0:
            keep = prng.keep_mask(
                seed_ref[0, 0], bh.astype(jnp.uint32),
                rows.astype(jnp.uint32), cols.astype(jnp.uint32), p_drop,
            )
            dp = jnp.where(keep, dp, 0.0) * jnp.float32(1.0 / (1.0 - p_drop))
        ds = p * (dp - di_col) * jnp.float32(scale)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == max_kv - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def blocksparse_attention_bwd(
    q,
    k,
    v,
    out,
    dout,
    lse,  # (b, h, sq_pad, 128) lane-replicated
    layout: BlockSparseLayout,
    q_segment_ids,
    kv_segment_ids,
    dropout_seed,
    *,
    sk: int,
    softmax_scale: float,
    dropout_p: float = 0.0,
    interpret: bool = False,
):
    b, h, sq_pad, d = q.shape
    sk_pad = k.shape[2]
    bq = layout.block_q
    nq = sq_pad // bq
    nk = sk_pad // BLOCK_K
    has_segments = q_segment_ids is not None
    p_drop = float(dropout_p)

    di = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (*di.shape, NUM_LANES))

    seed_args, seed_specs = [], []
    if p_drop > 0.0:
        seed_specs = [
            pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)
        ]
        seed_args = [dropout_seed.reshape(1, 1).astype(jnp.uint32)]

    ncol = layout.rowmask.shape[1]

    def tensor_specs(qmap, kmap):
        return [
            pl.BlockSpec((1, 1, bq, d), qmap, memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((1, 1, BLOCK_K, d), kmap, memory_space=pltpu.VMEM),  # k
            pl.BlockSpec((1, 1, BLOCK_K, d), kmap, memory_space=pltpu.VMEM),  # v
            pl.BlockSpec((1, 1, bq, d), qmap, memory_space=pltpu.VMEM),  # do
            pl.BlockSpec(
                (1, 1, bq, NUM_LANES),
                lambda *a: qmap(*a)[:3] + (0,),
                memory_space=pltpu.VMEM,
            ),  # lse
            pl.BlockSpec(
                (1, 1, bq, NUM_LANES),
                lambda *a: qmap(*a)[:3] + (0,),
                memory_space=pltpu.VMEM,
            ),  # di
        ]

    # ---- dKV: grid (b, h, nk, max_q); q blocks indexed via q_indices ----
    qmap = lambda b_, h_, ik, j, idx, cnt: (b_, h_, idx[ik, j], 0)  # noqa: E731
    kmap = lambda b_, h_, ik, j, idx, cnt: (b_, h_, ik, 0)  # noqa: E731
    in_specs = seed_specs + tensor_specs(qmap, kmap) + [
        pl.BlockSpec(
            (bq, ncol),
            lambda b_, h_, ik, j, idx, cnt: (idx[ik, j], 0),
            memory_space=pltpu.VMEM,
        )
    ]
    args = seed_args + [q, k, v, dout, lse, di, layout.rowmask]
    if has_segments:
        in_specs += [
            pl.BlockSpec(
                (1, bq),
                lambda b_, h_, ik, j, idx, cnt: (b_, idx[ik, j]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_K),
                lambda b_, h_, ik, j, idx, cnt: (b_, ik),
                memory_space=pltpu.VMEM,
            ),
        ]
        args += [
            q_segment_ids.astype(jnp.int32), kv_segment_ids.astype(jnp.int32)
        ]
    kv_out = pl.BlockSpec(
        (1, 1, BLOCK_K, d),
        lambda b_, h_, ik, j, idx, cnt: (b_, h_, ik, 0),
        memory_space=pltpu.VMEM,
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _bs_dkv_kernel,
            sk=sk, block_q=bq, max_q=layout.max_q, causal=layout.causal,
            has_segments=has_segments, scale=float(softmax_scale),
            p_drop=p_drop, num_heads=h,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h, nk, layout.max_q),
            in_specs=in_specs,
            out_specs=[kv_out, kv_out],
            scratch_shapes=[
                pltpu.VMEM((BLOCK_K, d), jnp.float32),
                pltpu.VMEM((BLOCK_K, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(layout.q_indices, layout.q_counts, *args)

    # ---- dQ: grid (b, h, nq, max_kv) ----
    qmap = lambda b_, h_, iq, j, idx, cnt: (b_, h_, iq, 0)  # noqa: E731
    kmap = lambda b_, h_, iq, j, idx, cnt: (b_, h_, idx[iq, j], 0)  # noqa: E731
    in_specs = seed_specs + tensor_specs(qmap, kmap) + [
        pl.BlockSpec(
            (bq, ncol),
            lambda b_, h_, iq, j, idx, cnt: (iq, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    args = seed_args + [q, k, v, dout, lse, di, layout.rowmask]
    if has_segments:
        in_specs += [
            pl.BlockSpec(
                (1, bq),
                lambda b_, h_, iq, j, idx, cnt: (b_, iq),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_K),
                lambda b_, h_, iq, j, idx, cnt: (b_, idx[iq, j]),
                memory_space=pltpu.VMEM,
            ),
        ]
        args += [
            q_segment_ids.astype(jnp.int32), kv_segment_ids.astype(jnp.int32)
        ]
    dq = pl.pallas_call(
        functools.partial(
            _bs_dq_kernel,
            sk=sk, block_q=bq, max_kv=layout.max_kv, causal=layout.causal,
            has_segments=has_segments, scale=float(softmax_scale),
            p_drop=p_drop, num_heads=h,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h, nq, layout.max_kv),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, bq, d),
                lambda b_, h_, iq, j, idx, cnt: (b_, h_, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(layout.kv_indices, layout.kv_counts, *args)
    return dq, dk, dv
