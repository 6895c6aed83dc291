"""Pure-jnp reference attention: the numerical oracle for every kernel test.

Mirrors the testing methodology of the reference implementation
(/root/reference/tests/test_flash_attn.py:115-173 ``attention_ref``): a
float32 "ground truth" and a native-dtype "baseline" whose error sets the
bar — every fused kernel must satisfy

    max|kernel - ref_fp32| <= 2 * max|ref_dtype - ref_fp32|

This module is deliberately simple XLA-compiled jnp code (no Pallas): it
materializes the full (sq, sk) score matrix and is only used for tests and
small-shape validation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large-negative mask value instead of -inf so that fully-masked rows produce
# exp(x - max) = exp(0) rather than NaN from (-inf) - (-inf).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def build_mask(
    sq: int,
    sk: int,
    *,
    causal: bool = False,
    q_positions: jax.Array | None = None,
    kv_positions: jax.Array | None = None,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    window_left: int | None = None,
    window_right: int | None = None,
) -> jax.Array:
    """Boolean (… , sq, sk) mask; True = attend.

    ``q_positions``/``kv_positions`` are per-token positions used for the
    causal comparison (local position within each packed sequence). When
    omitted they default to ``arange``. Segment ids of ``-1`` mark padding
    tokens and never match anything. ``window_left``/``window_right`` bound
    the visible band: position j is visible from i iff
    i - window_left <= j <= i + window_right (None = unbounded).
    """
    if q_positions is None:
        q_positions = jnp.arange(sq, dtype=jnp.int32)
    if kv_positions is None:
        kv_positions = jnp.arange(sk, dtype=jnp.int32)
    qp = q_positions[..., :, None]
    kp = kv_positions[..., None, :]
    mask = jnp.broadcast_to(
        jnp.array(True), jnp.broadcast_shapes(qp.shape, kp.shape)
    )
    if causal:
        mask = mask & (qp >= kp)
    if window_left is not None:
        mask = mask & (kp >= qp - window_left)
    if window_right is not None:
        mask = mask & (kp <= qp + window_right)
    if q_segment_ids is not None:
        assert kv_segment_ids is not None
        seg_ok = q_segment_ids[..., :, None] == kv_segment_ids[..., None, :]
        valid = (q_segment_ids[..., :, None] >= 0) & (
            kv_segment_ids[..., None, :] >= 0
        )
        mask = mask & seg_ok & valid
    return mask


def attention_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    mask: jax.Array | None = None,
    bias: jax.Array | None = None,
    dropout_mask: jax.Array | None = None,
    dropout_p: float = 0.0,
    upcast: bool = True,
    return_attn_probs: bool = False,
    softcap: float | None = None,
):
    """Reference attention on (batch, heads, seq, head_dim) inputs.

    - ``upcast=True``: compute everything in float32 (the ground-truth path).
    - ``upcast=False``: compute in the native dtype (the baseline-error path).
    - ``mask``: optional boolean (…, sq, sk), True = attend (combined with
      causal if both given).
    - ``dropout_mask``: optional boolean (…, sq, sk), True = keep. Applied to
      the normalized probabilities and rescaled by 1/(1-p), matching the
      reference semantics (dropout after softmax).

    Returns ``out`` (same dtype as q) and, if ``return_attn_probs``, also the
    pre-dropout normalized attention matrix.
    """
    orig_dtype = q.dtype
    if softmax_scale is None:
        softmax_scale = q.shape[-1] ** -0.5
    if upcast:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    sq, sk = q.shape[-2], k.shape[-2]
    # On TPU, fp32 einsums run at DEFAULT MXU precision (bf16 passes)
    # unless told otherwise — without HIGHEST the "fp32 oracle" and the
    # native-bf16 baseline coincide and the dual-reference bound
    # degenerates to 2x0 (caught by the round-4 on-device spotcheck).
    prec = jax.lax.Precision.HIGHEST if upcast else None
    scores = jnp.einsum(
        "...qd,...kd->...qk", q, k, precision=prec
    ).astype(jnp.float32)
    scores = scores * jnp.float32(softmax_scale)
    if softcap is not None:
        # Logit soft-capping (Gemma-2 style): cap * tanh(s / cap), applied
        # to the scaled scores BEFORE any additive bias / masking.
        scores = jnp.float32(softcap) * jnp.tanh(
            scores / jnp.float32(softcap)
        )
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    full_mask = None
    if causal:
        full_mask = build_mask(sq, sk, causal=True)
    if mask is not None:
        full_mask = mask if full_mask is None else (mask & full_mask)
    if full_mask is not None:
        scores = jnp.where(full_mask, scores, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    # Rows with no valid key: softmax of all-equal mask values is uniform;
    # zero them out to match the kernel's "sum==0 -> output 0" convention.
    if full_mask is not None:
        any_valid = jnp.any(full_mask, axis=-1, keepdims=True)
        probs = jnp.where(any_valid, probs, 0.0)
    probs_pre_drop = probs
    if dropout_mask is not None and dropout_p > 0.0:
        probs = jnp.where(dropout_mask, probs, 0.0) / (1.0 - dropout_p)
    if not upcast:
        probs = probs.astype(orig_dtype)
        v = v.astype(orig_dtype)
    out = jnp.einsum("...qk,...kd->...qd", probs, v, precision=prec)
    out = out.astype(orig_dtype)
    if return_attn_probs:
        return out, probs_pre_drop
    return out


def attention_lse_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Float32 logsumexp of the scaled scores, (…, sq).

    Fully-masked rows get -inf, matching the kernel's degenerate-row rule
    (reference: csrc/flash_attn/src/fmha_fprop_kernel_1xN.h:617).
    """
    if softmax_scale is None:
        softmax_scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "...qd,...kd->...qk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * jnp.float32(softmax_scale)
    sq, sk = q.shape[-2], k.shape[-2]
    full_mask = None
    if causal:
        full_mask = build_mask(sq, sk, causal=True)
    if mask is not None:
        full_mask = mask if full_mask is None else (mask & full_mask)
    if full_mask is not None:
        scores = jnp.where(full_mask, scores, -jnp.inf)
    return jax.nn.logsumexp(scores, axis=-1)
