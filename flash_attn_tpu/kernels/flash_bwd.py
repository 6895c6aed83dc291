"""Pallas TPU flash-attention backward kernels.

The reference snapshot never shipped its backward kernel (SURVEY.md: only
``fwd`` is bound, csrc/flash_attn/fmha_api.cpp:244-247); its contract is
defined by the Python call site (flash_attn/flash_attn_interface.py:29-36):
recompute probabilities from saved (q, k, lse), regenerate the identical
dropout mask, produce dq/dk/dv.

TPU-native design: two kernels with independent tilings (the standard
split, since their reduction axes differ):

  - dKV kernel: grid (b, h, kv_block, q_block); K/V-stationary, iterates q
    blocks accumulating (dk, dv) in fp32 VMEM scratch.
  - dQ kernel: grid (b, h, q_block, kv_block); Q-stationary, iterates kv
    blocks accumulating dq.

Both recompute the normalized probabilities as p = exp(scale*q.k - lse)
(no second softmax reduction), and use di = rowsum(dout * out) — the
``softmax_d`` correction of the reference contract. The dropout mask is
regenerated bit-identically from global element coordinates
(kernels/prng.py), so no mask tensor is ever stored.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels import prng
from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.kernels.common import NUM_LANES, attention_mask, block_coords


def _recompute_p(s, mask, lse_col):
    """Normalized probabilities from the saved logsumexp ((block_q, 1)).

    Masked (or fully-masked, lse = -inf) slots are forced to exactly zero;
    the where() also stops inf/NaN from exp(s - (-inf)) escaping.
    """
    p = jnp.exp(s - lse_col)
    return jnp.where(mask, p, 0.0)


def _dkv_kernel(
    *refs,
    sk: int,
    block_q: int,
    block_k: int,
    num_q_blocks: int,
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
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = refs[idx : idx + 6]
    idx += 6
    if has_segments:
        qpos_ref, kpos_ref, qseg_ref, kseg_ref = refs[idx : idx + 4]
        idx += 4
    dk_ref, dv_ref, dk_acc, dv_acc = refs[idx : idx + 4]

    ik = pl.program_id(2)
    iq = pl.program_id(3)
    # program_id must be read at kernel top level (the CPU interpreter does
    # not substitute it inside pl.when branches).
    bh = pl.program_id(0) * num_heads + pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def _compute():
        q = q_ref[0, 0]  # (bq, d)
        k = k_ref[0, 0]  # (bk, d)
        v = v_ref[0, 0]
        do = do_ref[0, 0]  # (bq, d)
        lse_col = lse_ref[0, 0][:, 0:1]  # (bq, 1), lane-replicated input
        di_col = di_ref[0, 0][:, 0:1]  # (bq, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        rows, cols = block_coords(block_q, block_k, iq, ik)
        mask = attention_mask(
            rows,
            cols,
            sk=sk,
            causal=causal,
            q_pos=qpos_ref[0] if has_segments else None,
            kv_pos=kpos_ref[0] if has_segments else None,
            q_seg=qseg_ref[0] if has_segments else None,
            kv_seg=kseg_ref[0] if has_segments else None,
        )
        p = _recompute_p(s, mask, lse_col)

        # dp = dO @ V^T, w.r.t. the post-dropout probabilities.
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if p_drop > 0.0:
            keep = prng.keep_mask(
                seed_ref[0, 0],
                bh.astype(jnp.uint32),
                rows.astype(jnp.uint32),
                cols.astype(jnp.uint32),
                p_drop,
            )
            rp = jnp.float32(1.0 / (1.0 - p_drop))
            p_dropped = jnp.where(keep, p, 0.0) * rp
            dp = jnp.where(keep, dp, 0.0) * rp
        else:
            p_dropped = p

        # dV += P_dropped^T @ dO
        dv_acc[...] += jax.lax.dot_general(
            p_dropped.astype(do.dtype),
            do,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di_col) * jnp.float32(scale)
        # dK += dS^T @ Q
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype),
            q,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal and not has_segments:
        should_run = (iq + 1) * block_q - 1 >= ik * block_k
        pl.when(should_run)(_compute)
    else:
        _compute()

    @pl.when(iq == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(
    *refs,
    sk: int,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
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
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = refs[idx : idx + 6]
    idx += 6
    if has_segments:
        qpos_ref, kpos_ref, qseg_ref, kseg_ref = refs[idx : idx + 4]
        idx += 4
    dq_ref, dq_acc = refs[idx : idx + 2]

    iq = pl.program_id(2)
    ik = pl.program_id(3)
    bh = pl.program_id(0) * num_heads + pl.program_id(1)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_col = lse_ref[0, 0][:, 0:1]
        di_col = di_ref[0, 0][:, 0:1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        rows, cols = block_coords(block_q, block_k, iq, ik)
        mask = attention_mask(
            rows,
            cols,
            sk=sk,
            causal=causal,
            q_pos=qpos_ref[0] if has_segments else None,
            kv_pos=kpos_ref[0] if has_segments else None,
            q_seg=qseg_ref[0] if has_segments else None,
            kv_seg=kseg_ref[0] if has_segments else None,
        )
        p = _recompute_p(s, mask, lse_col)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if p_drop > 0.0:
            keep = prng.keep_mask(
                seed_ref[0, 0],
                bh.astype(jnp.uint32),
                rows.astype(jnp.uint32),
                cols.astype(jnp.uint32),
                p_drop,
            )
            dp = jnp.where(keep, dp, 0.0) * jnp.float32(1.0 / (1.0 - p_drop))

        ds = p * (dp - di_col) * jnp.float32(scale)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype),
            k,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal and not has_segments:
        should_run = (iq + 1) * block_q - 1 >= ik * block_k
        pl.when(should_run)(_compute)
    else:
        _compute()

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _seq_specs(bq, bk, d, *, kv_major: bool):
    """BlockSpecs for (q, k, v, do, lse, di) given grid (b, h, X, Y) where
    (X, Y) = (ik, iq) if kv_major else (iq, ik)."""
    if kv_major:
        qi = lambda b_, h_, x, y: (b_, h_, y, 0)  # noqa: E731
        ki = lambda b_, h_, x, y: (b_, h_, x, 0)  # noqa: E731
        qv = lambda b_, h_, x, y: (b_, y)  # noqa: E731
        kv = lambda b_, h_, x, y: (b_, x)  # noqa: E731
    else:
        qi = lambda b_, h_, x, y: (b_, h_, x, 0)  # noqa: E731
        ki = lambda b_, h_, x, y: (b_, h_, y, 0)  # noqa: E731
        qv = lambda b_, h_, x, y: (b_, x)  # noqa: E731
        kv = lambda b_, h_, x, y: (b_, y)  # noqa: E731
    tensor = [
        pl.BlockSpec((1, 1, bq, d), qi, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, 1, bk, d), ki, memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, 1, bk, d), ki, memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((1, 1, bq, d), qi, memory_space=pltpu.VMEM),  # do
        pl.BlockSpec((1, 1, bq, NUM_LANES), qi, memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, 1, bq, NUM_LANES), qi, memory_space=pltpu.VMEM),  # di
    ]
    seg = [
        pl.BlockSpec((1, bq), qv, memory_space=pltpu.VMEM),  # q_pos
        pl.BlockSpec((1, bk), kv, memory_space=pltpu.VMEM),  # kv_pos
        pl.BlockSpec((1, bq), qv, memory_space=pltpu.VMEM),  # q_seg
        pl.BlockSpec((1, bk), kv, memory_space=pltpu.VMEM),  # kv_seg
    ]
    return tensor, seg


def flash_attention_bwd(
    q: jax.Array,  # (b, h, sq_pad, d_pad)
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    dout: jax.Array,
    lse: jax.Array,  # (b, h, sq_pad, 128) fp32 lane-replicated
    q_positions: jax.Array | None,
    kv_positions: jax.Array | None,
    q_segment_ids: jax.Array | None,
    kv_segment_ids: jax.Array | None,
    dropout_seed: jax.Array | None,
    *,
    sq: int,
    sk: int,
    causal: bool,
    softmax_scale: float,
    dropout_p: float = 0.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool = False,
):
    """Returns (dq, dk, dv) on the padded layout."""
    b, h, sq_pad, d = q.shape
    sk_pad = k.shape[2]
    if block_sizes is None:
        block_sizes = BlockSizes.choose(seq_len_q=sq, seq_len_k=sk, head_dim=d)
    has_segments = q_segment_ids is not None
    p_drop = float(dropout_p)

    # di = rowsum(dout * out): the softmax_d correction. Cheap fused XLA op,
    # lane-replicated to match the kernels' native layout (TODO(perf): pack
    # instead of replicating to cut the HBM footprint 128x).
    di = jnp.sum(
        out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1
    )  # (b, h, sq_pad)
    di = jnp.broadcast_to(di[..., None], (*di.shape, NUM_LANES))

    seed_args = []
    seed_specs = []
    if p_drop > 0.0:
        assert dropout_seed is not None
        seed_specs = [
            pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)
        ]
        seed_args = [dropout_seed.reshape(1, 1).astype(jnp.uint32)]

    seg_args = []
    if has_segments:
        seg_args = [
            q_positions.astype(jnp.int32),
            kv_positions.astype(jnp.int32),
            q_segment_ids.astype(jnp.int32),
            kv_segment_ids.astype(jnp.int32),
        ]

    # ---- dKV kernel ----
    bq = min(block_sizes.block_q_dkv, sq_pad)
    bk = min(block_sizes.block_k_dkv, sk_pad)
    assert sq_pad % bq == 0 and sk_pad % bk == 0
    nq, nk = sq_pad // bq, sk_pad // bk
    tensor_specs, seg_specs = _seq_specs(bq, bk, d, kv_major=True)
    kv_out_spec = pl.BlockSpec(
        (1, 1, bk, d), lambda b_, h_, x, y: (b_, h_, x, 0),
        memory_space=pltpu.VMEM,
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel,
            sk=sk,
            block_q=bq,
            block_k=bk,
            num_q_blocks=nq,
            causal=causal,
            has_segments=has_segments,
            scale=float(softmax_scale),
            p_drop=p_drop,
            num_heads=h,
        ),
        grid=(b, h, nk, nq),
        in_specs=seed_specs + tensor_specs + (seg_specs if has_segments else []),
        out_specs=[kv_out_spec, kv_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*seed_args, q, k, v, dout, lse, di, *seg_args)

    # ---- dQ kernel ----
    bq = min(block_sizes.block_q_dq, sq_pad)
    bk = min(block_sizes.block_k_dq, sk_pad)
    assert sq_pad % bq == 0 and sk_pad % bk == 0
    nq, nk = sq_pad // bq, sk_pad // bk
    tensor_specs, seg_specs = _seq_specs(bq, bk, d, kv_major=False)
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel,
            sk=sk,
            block_q=bq,
            block_k=bk,
            num_k_blocks=nk,
            causal=causal,
            has_segments=has_segments,
            scale=float(softmax_scale),
            p_drop=p_drop,
            num_heads=h,
        ),
        grid=(b, h, nq, nk),
        in_specs=seed_specs + tensor_specs + (seg_specs if has_segments else []),
        out_specs=pl.BlockSpec(
            (1, 1, bq, d), lambda b_, h_, x, y: (b_, h_, x, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*seed_args, q, k, v, dout, lse, di, *seg_args)

    return dq, dk, dv
