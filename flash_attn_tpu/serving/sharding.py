"""Tensor-parallel (head-sharded) serving attention.

Multi-chip serving shards the model's heads across the mesh's model
axis (Megatron-style, like parallel/sharding.py does for training):
each chip holds its own heads' slice of the paged KV cache — per-chip
cache memory scales down 1/TP — and paged attention needs NO collectives
at all (softmax never crosses heads; the out_proj psum happens in the
surrounding matmul layer under GSPMD).

Pallas kernels do not auto-partition under pjit, so these wrappers run
the decode / chunk kernels under shard_map with the head axes sharded:

  q:            (batch, n_q_heads, d)        -> P(None, model, None)
  k/v_pages:    (n_kv_heads, pages, ps, d)   -> P(model, None, None, None)
  k/v_scales:   (n_kv_heads, pages, 1, ps)   -> P(model, None, None, None)
  lengths / page_table: replicated (every chip serves every sequence).

GQA divides cleanly as long as n_kv_heads % tp == 0 (each shard keeps
whole q-head groups with their kv head).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from flash_attn_tpu.kernels.chunk import paged_chunk_attention
from flash_attn_tpu.kernels.decode import paged_decode_attention


def _shard_slopes(alibi_slopes, n_q_heads):
    if alibi_slopes is None:
        return None, False
    a = jnp.asarray(alibi_slopes, jnp.float32)
    if a.shape != (n_q_heads,):
        raise ValueError(
            f"alibi_slopes must have shape ({n_q_heads},); got {a.shape}"
        )
    return a, True


def make_sharded_paged_decode(
    mesh: Mesh,
    *,
    model_axis: str = "model",
    softmax_scale: Optional[float] = None,
    window_left: Optional[int] = None,
    num_sinks: int = 0,
    softcap: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Head-TP paged decode:
    ``f(q, k_pages, v_pages, lengths, page_table, k_scales=None,
    v_scales=None, alibi_slopes=None) -> (batch, n_q_heads, d)``.

    Inputs must be sharded as in the module docstring (device_put with
    the matching NamedSharding, or produced sharded by the surrounding
    pjit'd layer). ALiBi slopes shard with the q heads."""

    def call(
        q, k_pages, v_pages, lengths, page_table,
        k_scales=None, v_scales=None, alibi_slopes=None,
    ):
        n_q_heads = q.shape[1]
        tp = mesh.shape[model_axis]
        n_kv = k_pages.shape[0]
        if n_kv % tp != 0 or n_q_heads % n_kv != 0:
            raise ValueError(
                f"kv heads {n_kv} must divide over tp={tp} with whole "
                f"GQA groups (q heads {n_q_heads})"
            )
        slopes, has_alibi = _shard_slopes(alibi_slopes, n_q_heads)
        quantized = k_scales is not None

        def local(q, kp, vp, ln, tbl, ks, vs, sl):
            return paged_decode_attention(
                q, kp, vp, ln, tbl,
                k_scales=ks if quantized else None,
                v_scales=vs if quantized else None,
                softmax_scale=softmax_scale,
                window_left=window_left,
                num_sinks=num_sinks,
                softcap=softcap,
                alibi_slopes=sl if has_alibi else None,
                interpret=interpret,
            )

        page_spec = P(model_axis, None, None, None)
        scale_spec = page_spec if quantized else P()
        f = shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(None, model_axis, None), page_spec, page_spec,
                P(), P(), scale_spec, scale_spec,
                P(model_axis) if has_alibi else P(),
            ),
            out_specs=P(None, model_axis, None),
            check_vma=False,
        )
        dummy = jnp.zeros((), jnp.float32)
        return f(
            q, k_pages, v_pages,
            lengths.astype(jnp.int32), page_table.astype(jnp.int32),
            k_scales if quantized else dummy,
            v_scales if quantized else dummy,
            slopes if has_alibi else dummy,
        )

    return call


def make_sharded_chunk_attention(
    mesh: Mesh,
    *,
    model_axis: str = "model",
    softmax_scale: Optional[float] = None,
    window_left: Optional[int] = None,
    softcap: Optional[float] = None,
    qk_quant: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Head-TP multi-token paged attention (speculative decode / chunked
    prefill): ``f(q, k_pages, v_pages, lengths, page_table,
    k_scales=None, v_scales=None, chunk_lens=None, alibi_slopes=None)
    -> (batch, sq, n_q_heads, d)`` with q sharded
    P(None, None, model, None) and pages as in the module docstring."""

    def call(
        q, k_pages, v_pages, lengths, page_table,
        k_scales=None, v_scales=None, chunk_lens=None, alibi_slopes=None,
    ):
        batch, sq, n_q_heads, _ = q.shape
        tp = mesh.shape[model_axis]
        n_kv = k_pages.shape[0]
        if n_kv % tp != 0 or n_q_heads % n_kv != 0:
            raise ValueError(
                f"kv heads {n_kv} must divide over tp={tp} with whole "
                f"GQA groups (q heads {n_q_heads})"
            )
        slopes, has_alibi = _shard_slopes(alibi_slopes, n_q_heads)
        quantized = k_scales is not None
        if chunk_lens is None:
            chunk_lens = jnp.full((batch,), sq, jnp.int32)

        def local(q, kp, vp, ln, tbl, ks, vs, cl, sl):
            return paged_chunk_attention(
                q, kp, vp, ln, tbl,
                ks if quantized else None,
                vs if quantized else None,
                chunk_lens=cl,
                softmax_scale=softmax_scale,
                window_left=window_left,
                softcap=softcap,
                qk_quant=qk_quant,
                alibi_slopes=sl if has_alibi else None,
                interpret=interpret,
            )

        page_spec = P(model_axis, None, None, None)
        scale_spec = page_spec if quantized else P()
        f = shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(None, None, model_axis, None), page_spec, page_spec,
                P(), P(), scale_spec, scale_spec, P(),
                P(model_axis) if has_alibi else P(),
            ),
            out_specs=P(None, None, model_axis, None),
            check_vma=False,
        )
        dummy = jnp.zeros((), jnp.float32)
        return f(
            q, k_pages, v_pages,
            lengths.astype(jnp.int32), page_table.astype(jnp.int32),
            k_scales if quantized else dummy,
            v_scales if quantized else dummy,
            chunk_lens.astype(jnp.int32),
            slopes if has_alibi else dummy,
        )

    return call
