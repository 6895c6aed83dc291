"""int8 QK^T quantization path — EXPERIMENTAL, fenced off the hot kernels.

SageAttention-style (arXiv:2410.02367) per-token symmetric int8
quantization of the QK^T operands: k is mean-centered (subtracting a
per-row constant from the scores leaves softmax exactly invariant),
scales are per token, the dot runs int8 x int8 -> int32 on the MXU and is
dequantized per chain in-kernel. Softmax and PV stay bf16/fp32.

Status (INT8.md, measured round 4 on v5e via benchmarks/ab_int8.py):
0.68x vs bf16 — Mosaic does not reach the MXU 2x int8 rate for these
dots on this stack, so the path is demoted to a correctness surface for
experiments and for hardware/toolchains where int8 dots do pay. Round 5
(VERDICT #6) moved every int8-specific helper here so flash_fwd.py /
chunk.py carry only `if qk_int8:` fences with zero cost to the bf16
trace (qk_int8 is a trace-time static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_qk(qp, kp):
    """SageAttention-style int8 QK^T prep on padded (b, h, s, d) inputs.

    k is mean-centered per (b, h_kv, d) before quantizing: subtracting
    any per-row-constant from the scores (q . k_mean) leaves the softmax
    EXACTLY invariant, and centering shrinks k's dynamic range, which is
    where int8 quantization error concentrates. Per-token symmetric
    scales: q rows (b, h, s, 1), k cols pre-transposed (b, h_kv, 1, s)
    (a (s, 1) -> (1, s) vector relayout inside a kernel is the pattern
    Mosaic historically rejects, so the transpose happens here).

    Returns (q_int8, k_int8, q_scale, k_scale, k_mean)."""
    eps = jnp.float32(1e-30)
    qf = qp.astype(jnp.float32)
    kf = kp.astype(jnp.float32)
    km = jnp.mean(kf, axis=2, keepdims=True)  # (b, h_kv, 1, d)
    kc = kf - km
    qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=3, keepdims=True), eps) / 127.0
    ks = jnp.maximum(jnp.max(jnp.abs(kc), axis=3, keepdims=True), eps) / 127.0
    qq = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    kq = jnp.clip(jnp.round(kc / ks), -127, 127).astype(jnp.int8)
    return qq, kq, qs, jnp.swapaxes(ks, 2, 3), km


def quantize_q_rows(q4):
    """Per-token symmetric q quantization for the chunked paged-attention
    launcher (the KV-cache payload is already int8 with its own per-token
    scales). q4: (b, n_kv, gq, d) any float dtype.

    Returns (q_int8, q_scale) with q_scale (b, n_kv, gq, 1) fp32."""
    qf = q4.astype(jnp.float32)
    qsc = jnp.maximum(
        jnp.max(jnp.abs(qf), axis=3, keepdims=True), 1e-30
    ) / 127.0
    qq = jnp.clip(jnp.round(qf / qsc), -127, 127).astype(jnp.int8)
    return qq, qsc


def dequant_scores(s_int32, q_row_scale, k_col_scale):
    """Dequantize an int32 QK^T accumulator into raw-dot units inside a
    kernel: rank-1 per-row q scales x per-col k scales. The softmax scale
    stays folded into the caller's exp2 constant."""
    return s_int32.astype(jnp.float32) * q_row_scale * k_col_scale


def fwd_scale_specs(bq, bk, q_index, kv_index):
    """BlockSpecs for the forward kernel's (q_scale, k_scale) operands:
    q rows as a (bq, 1) column following the q tiling, k cols as a
    pre-transposed (1, bk) row following the kv tiling."""

    def kscale_index(*a):
        bb, hh, ike, _ = kv_index(*a)
        return (bb, hh, 0, ike)

    return [
        pl.BlockSpec((1, 1, bq, 1), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, bk), kscale_index, memory_space=pltpu.VMEM),
    ]
