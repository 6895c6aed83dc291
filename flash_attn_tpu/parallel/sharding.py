"""Multi-device attention: shard_map wrappers over the Pallas kernels.

The reference is single-GPU (SURVEY.md section 2.3: no distributed layer
anywhere); scaling is new TPU-first scope (BASELINE.json north star). The
composition model:

  - **Head tensor parallelism**: q/k/v heads sharded over the ``model``
    mesh axis; attention is embarrassingly parallel over heads, so the
    kernel runs unchanged per shard with zero collectives. Communication
    happens later in the out-projection (psum), exactly like the canonical
    head-sharded pattern.
  - **Data parallelism**: batch over the ``data`` axis — also free.
  - **Sequence parallelism**: ring attention over the ``seq`` axis
    (parallel/ring.py) — K/V shards rotate via ppermute and merge with the
    same (m, l, acc) online-softmax rule the kernel uses internally.

Pallas calls do not auto-partition under pjit, so any multi-device use of
flash_attention MUST go through these shard_map wrappers (or your own).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.ops.attention import flash_attention


def make_sharded_flash_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    dropout_p: float = 0.0,
    window_size=None,
    alibi_slopes=None,
    block_sizes: Optional[BlockSizes] = None,
    data_axis: str | None = "data",
    model_axis: str | None = "model",
    interpret: Optional[bool] = None,
):
    """Head-TP + DP sharded flash attention.

    ``window_size`` (sliding-window attention) is safe under this sharding:
    heads/batch are split but every shard sees the full sequence, so the
    band is applied on global positions.

    ``alibi_slopes``: (h_total,) fp32 per-head ALiBi slopes; they shard
    along the model axis with the heads, so each shard biases its own
    heads with the right slopes.

    Returns f(q, k, v, dropout_seed=None) on (batch, seq, heads, head_dim)
    arrays sharded P(data, None, model, None). Segment-id varlen accepts
    (batch, seq) arrays sharded P(data, None).
    """
    import jax.numpy as _jnp

    qkv_spec = P(data_axis, None, model_axis, None)
    seg_spec = P(data_axis, None)
    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi_slopes = _jnp.asarray(alibi_slopes, _jnp.float32)
        if alibi_slopes.ndim != 1:
            raise ValueError(
                "sharded alibi_slopes must be a flat (h_total,) array; "
                f"got shape {alibi_slopes.shape}"
            )

    def _attn(q, k, v, qseg, kseg, qpos, kpos, seed, slopes):
        import jax.numpy as jnp

        # Decorrelate dropout across shards: the kernel keys its mask on
        # LOCAL (bh, row, col) coordinates, which coincide between shards.
        if dropout_p > 0.0:
            off = jnp.uint32(0)
            if model_axis is not None:
                off = off + jax.lax.axis_index(model_axis).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
            if data_axis is not None:
                off = off + jax.lax.axis_index(data_axis).astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
            seed = seed + off
        return flash_attention(
            q, k, v,
            causal=causal,
            softmax_scale=softmax_scale,
            q_segment_ids=qseg,
            kv_segment_ids=kseg,
            q_positions=qpos,
            kv_positions=kpos,
            dropout_p=dropout_p,
            dropout_seed=seed,
            window_size=window_size,
            alibi_slopes=slopes if has_alibi else None,
            block_sizes=block_sizes,
            interpret=interpret,
        )

    sharded = shard_map(
        _attn,
        mesh=mesh,
        in_specs=(
            qkv_spec, qkv_spec, qkv_spec,
            seg_spec, seg_spec, seg_spec, seg_spec,
            P(),
            P(model_axis) if has_alibi else P(),
        ),
        out_specs=qkv_spec,
        check_vma=False,
    )

    def call(
        q, k, v, *, q_segment_ids=None, kv_segment_ids=None,
        q_positions=None, kv_positions=None, dropout_seed=None,
    ):
        import jax.numpy as jnp

        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        if q_segment_ids is None:
            # shard_map needs concrete operands; synthesize the dense case.
            q_segment_ids = jnp.zeros((b, sq), jnp.int32)
            kv_segment_ids = jnp.zeros((b, sk), jnp.int32)
        if q_positions is None:
            q_positions = jnp.broadcast_to(
                jnp.arange(sq, dtype=jnp.int32)[None], (b, sq)
            )
            kv_positions = jnp.broadcast_to(
                jnp.arange(sk, dtype=jnp.int32)[None], (b, sk)
            )
        if dropout_seed is None:
            seed = jnp.zeros((), jnp.uint32)
        else:
            seed = jnp.asarray(dropout_seed).astype(jnp.uint32)
        slopes = (
            alibi_slopes if has_alibi else jnp.zeros((), jnp.float32)
        )
        return sharded(
            q, k, v, q_segment_ids, kv_segment_ids, q_positions,
            kv_positions, seed, slopes,
        )

    return call
