"""Ring attention: sequence-parallel exact attention over an ICI ring.

Generalizes the kernel's blockwise online-softmax carry across *devices*
(SURVEY.md section 5 "Long-context"): each device owns a K/V shard; shards
rotate around the mesh axis via ppermute while every device accumulates
partial attention of its local Q against the shard currently resident.
Partials merge with the same (m, l) rescale rule the kernel uses per tile —
here expressed through the per-row logsumexp:

    lse' = logaddexp(lse_a, lse_b)
    o'   = o_a * exp(lse_a - lse') + o_b * exp(lse_b - lse')

The ppermute for step i+1 is issued *before* step i's compute so XLA's
latency-hiding scheduler can overlap the ICI transfer with the Pallas
kernel (communication rides ICI; compute dominates for large local
shards).

Causal balance — zigzag layout (``zigzag=True``): with contiguous shards a
causal mask makes device 0 nearly idle and device n-1 do n shards of work.
In zigzag layout each device owns TWO half-chunks of the global sequence —
chunk i and chunk 2n-1-i — so every (device, shard) pair carries roughly
the same ~half-live attention area and wall-clock per step is constant.
The kernels never compute the dead area: per-block runtime classification
on the position vectors skips blocks where max(q_pos) < min(kv_pos)
entirely and runs uniformly-past blocks on the mask-free fast path
(kernels/flash_fwd.py / flash_bwd.py). Use ``zigzag_permutation`` /
``inverse_permutation`` to reorder the global sequence before sharding and
to restore outputs.

Dropout: supported in both directions. The mask for the (q-shard i,
kv-shard j) pair is keyed on ``seed + i*C1 + j*C2`` plus the kernel's
local coordinates, so it is reproducible in backward (same pair seeds)
and decorrelated across pairs.

Training path: ``ring_flash_attention`` is differentiable via custom_vjp.
The backward rotates (k, v, dk, dv) around the same ring; each device runs
the flash backward kernels between its local Q and the resident shard
using the *global* saved logsumexp (p = exp(s - lse_global) and
di = rowsum(dout * out_global) make each per-shard backward exactly the
partial gradient of the global softmax), accumulating dk/dv onto the
traveling shard — after n hops the accumulators arrive back at the
shard's home device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.ops.attention import flash_attention

_PAIR_C1 = 0x9E3779B1
_PAIR_C2 = 0x85EBCA77


def zigzag_permutation(seq_len: int, n_dev: int) -> np.ndarray:
    """Index array reordering a sequence so that contiguous shard ``i`` of
    the permuted sequence holds original chunks (i, 2n-1-i) (half-chunk
    granularity c = seq_len / (2*n_dev)). Apply as ``x[:, perm]`` before
    sharding along the sequence axis."""
    assert seq_len % (2 * n_dev) == 0, (seq_len, n_dev)
    c = seq_len // (2 * n_dev)
    parts = []
    for i in range(n_dev):
        parts.append(np.arange(i * c, (i + 1) * c))
        parts.append(np.arange((2 * n_dev - 1 - i) * c, (2 * n_dev - i) * c))
    return np.concatenate(parts).astype(np.int32)


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    """Inverse index array: ``x_zig[:, inv][...] == x`` restores order."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


def _shard_positions(b, s_loc, idx, n_dev, zigzag):
    """Global positions of a shard's rows. ``idx`` may be traced."""
    if zigzag:
        c = s_loc // 2
        lo = jnp.arange(c, dtype=jnp.int32) + idx.astype(jnp.int32) * c
        hi = jnp.arange(c, dtype=jnp.int32) + (
            (2 * n_dev - 1) - idx.astype(jnp.int32)
        ) * c
        pos = jnp.concatenate([lo, hi])
    else:
        pos = jnp.arange(s_loc, dtype=jnp.int32) + (
            idx.astype(jnp.int32) * s_loc
        )
    return jnp.broadcast_to(pos[None], (b, s_loc))


@dataclasses.dataclass(frozen=True)
class _RingCfg:
    axis_name: str
    causal: bool
    softmax_scale: Optional[float]
    dropout_p: float
    zigzag: bool
    block_sizes: Optional[BlockSizes]
    interpret: Optional[bool]
    window_size: Optional[tuple] = None


def _merge_partials(o_a, lse_a, o_b, lse_b):
    """Merge two attention partials (o in any float dtype, lse fp32).

    Shapes: o (b, s, h, d), lse (b, h, s). Fully-masked partials carry
    lse = -inf and must contribute exactly zero.
    """
    lse_new = jnp.logaddexp(lse_a, lse_b)

    def w(lse_x):
        # exp(-inf - -inf) -> NaN; force weight 0 for empty partials.
        raw = jnp.exp(lse_x - lse_new)
        return jnp.where(jnp.isneginf(lse_x), 0.0, raw)

    w_a = jnp.transpose(w(lse_a), (0, 2, 1))[..., None]  # (b, s, h, 1)
    w_b = jnp.transpose(w(lse_b), (0, 2, 1))[..., None]
    o = o_a.astype(jnp.float32) * w_a + o_b.astype(jnp.float32) * w_b
    return o, lse_new


def _pair_seed(seed, q_owner, kv_owner):
    return (
        seed
        + q_owner.astype(jnp.uint32) * jnp.uint32(_PAIR_C1)
        + kv_owner.astype(jnp.uint32) * jnp.uint32(_PAIR_C2)
    )


def ring_flash_attention(
    q: jax.Array,  # (b, s_local, h, d) — local Q shard
    k: jax.Array,  # (b, s_local, h, d) — local K shard
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    dropout_p: float = 0.0,
    dropout_seed: jax.Array | int | None = None,
    zigzag: bool = False,
    window_size=None,
    alibi_slopes: jax.Array | None = None,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
):
    """Exact attention over the full (sharded) sequence. Call inside
    shard_map with q/k/v sharded along ``axis_name`` on the seq dim.

    ``zigzag=True`` expects the global sequence pre-permuted with
    ``zigzag_permutation`` (balanced causal work per device); outputs come
    back in the same permuted layout.

    ``window_size=(left, right)``: sliding-window attention. The band is
    applied on GLOBAL positions (the per-pair kernels mask on the position
    vectors), so it composes with both contiguous and zigzag layouts;
    shard pairs entirely outside the band contribute lse=-inf partials
    that merge to zero, and the kernels skip their dead blocks outright.

    ``alibi_slopes``: (h,) or (b_local, h) per-head ALiBi slopes; the bias
    compares GLOBAL positions inside each pair kernel, so the merged
    result equals single-device ALiBi attention (zigzag included).

    Returns (o, lse). Differentiable w.r.t. (q, k, v) — gradients do not
    flow through the returned lse (a diagnostic/merge artifact)."""
    if dropout_p > 0.0 and dropout_seed is None:
        raise ValueError("dropout_p > 0 requires dropout_seed")
    seed = (
        jnp.zeros((), jnp.uint32)
        if dropout_seed is None
        else jnp.asarray(dropout_seed).astype(jnp.uint32)
    )
    if window_size is not None:
        window_size = tuple(window_size)
    alibi = (
        None
        if alibi_slopes is None
        else jnp.asarray(alibi_slopes, jnp.float32)
    )
    cfg = _RingCfg(
        axis_name, causal, softmax_scale, float(dropout_p), zigzag,
        block_sizes, interpret, window_size,
    )
    return _ring_core_p(cfg, q, k, v, seed, alibi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_core_p(cfg, q, k, v, seed, alibi):
    return _ring_fwd(cfg, q, k, v, seed, alibi)


def _ring_fwd(cfg: _RingCfg, q, k, v, seed, alibi):
    axis_name = cfg.axis_name
    n_dev = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, s_loc, h, d = q.shape
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    if cfg.zigzag and s_loc % 2 != 0:
        raise ValueError("zigzag needs an even local sequence length")

    q_pos = _shard_positions(b, s_loc, my_idx, n_dev, cfg.zigzag)
    zeros_seg = jnp.zeros((b, s_loc), jnp.int32)

    o_acc = jnp.zeros((b, s_loc, h, d), jnp.float32)
    lse_acc = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)

    kv = (k, v)
    src = my_idx.astype(jnp.int32)
    for step in range(n_dev):
        if step < n_dev - 1:
            # Issue the rotation for the NEXT step first: independent of this
            # step's compute, so the ICI transfer overlaps the kernel.
            kv_next = jax.lax.ppermute(kv, axis_name, perm)
        k_cur, v_cur = kv
        kv_pos = _shard_positions(b, s_loc, src, n_dev, cfg.zigzag)
        o_i, lse_i = flash_attention(
            q,
            k_cur,
            v_cur,
            causal=cfg.causal,
            softmax_scale=cfg.softmax_scale,
            q_segment_ids=zeros_seg,
            kv_segment_ids=zeros_seg,
            q_positions=q_pos,
            kv_positions=kv_pos,
            dropout_p=cfg.dropout_p,
            dropout_seed=(
                _pair_seed(seed, my_idx, src) if cfg.dropout_p > 0.0 else None
            ),
            window_size=cfg.window_size,
            alibi_slopes=alibi,
            block_sizes=cfg.block_sizes,
            return_lse=True,
            interpret=cfg.interpret,
        )
        o_acc, lse_acc = _merge_partials(o_acc, lse_acc, o_i, lse_i)
        if step < n_dev - 1:
            kv = kv_next
            src = jnp.mod(src - 1, n_dev)  # the shard we now hold came from src-1

    return o_acc.astype(q.dtype), lse_acc


def _ring_fwd_vjp(cfg: _RingCfg, q, k, v, seed, alibi):
    out, lse = _ring_fwd(cfg, q, k, v, seed, alibi)
    return (out, lse), (q, k, v, seed, alibi, out, lse)


def _ring_bwd_vjp(cfg: _RingCfg, residuals, cot):
    """Ring backward: rotate (k, v, dk, dv); each device runs the flash
    backward between its local Q and the resident shard using the GLOBAL
    lse (and global out/dout for the di correction) — each per-shard
    backward is then exactly the partial gradient of the global softmax.
    dk/dv accumulate on the traveling shard: n-1 rotations alongside k/v
    plus one final hop deliver them to the shard's home device."""
    from flash_attn_tpu.ops.attention import flash_attention_bwd_bshd

    q, k, v, seed, alibi, out, lse = residuals
    dout, _dlse = cot  # gradients do not flow through lse
    dout = dout.astype(q.dtype)

    axis_name = cfg.axis_name
    n_dev = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, s_loc, h, d = q.shape
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    q_pos = _shard_positions(b, s_loc, my_idx, n_dev, cfg.zigzag)
    zeros_seg = jnp.zeros((b, s_loc), jnp.int32)

    dq_acc = jnp.zeros(q.shape, jnp.float32)
    kv = (k, v)
    dkv = (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    src = my_idx.astype(jnp.int32)
    for step in range(n_dev):
        if step < n_dev - 1:
            # Prefetch the next shard; independent of this step's kernels.
            kv_next = jax.lax.ppermute(kv, axis_name, perm)
        k_cur, v_cur = kv
        kv_pos = _shard_positions(b, s_loc, src, n_dev, cfg.zigzag)
        dq_i, dk_i, dv_i = flash_attention_bwd_bshd(
            q, k_cur, v_cur, out, dout, lse,
            causal=cfg.causal,
            softmax_scale=cfg.softmax_scale,
            q_segment_ids=zeros_seg,
            kv_segment_ids=zeros_seg,
            q_positions=q_pos,
            kv_positions=kv_pos,
            dropout_p=cfg.dropout_p,
            dropout_seed=(
                _pair_seed(seed, my_idx, src) if cfg.dropout_p > 0.0 else None
            ),
            window_size=cfg.window_size,
            alibi_slopes=alibi,
            block_sizes=cfg.block_sizes,
            interpret=cfg.interpret,
        )
        dq_acc = dq_acc + dq_i.astype(jnp.float32)
        dkv = (
            dkv[0] + dk_i.astype(jnp.float32),
            dkv[1] + dv_i.astype(jnp.float32),
        )
        # dk/dv travel with their shard (one hop behind the kv prefetch);
        # the final rotation delivers them home.
        dkv = jax.lax.ppermute(dkv, axis_name, perm)
        if step < n_dev - 1:
            kv = kv_next
            src = jnp.mod(src - 1, n_dev)

    return (
        dq_acc.astype(q.dtype),
        dkv[0].astype(k.dtype),
        dkv[1].astype(v.dtype),
        None,
        None,
    )


_ring_core_p.defvjp(_ring_fwd_vjp, _ring_bwd_vjp)
