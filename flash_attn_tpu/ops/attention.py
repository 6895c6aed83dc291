"""Public functional flash-attention API with custom VJP.

The TPU-native analog of the reference's autograd layer
(flash_attn/flash_attn_interface.py): a ``jax.custom_vjp`` wrapping the
Pallas forward/backward kernels. Differences by design:

  - No RNG-state save/restore protocol (reference
    flash_attn_interface.py:43-63): the dropout mask is a pure function of
    (seed, coordinates) (kernels/prng.py), so the only residual is the
    integer seed.
  - Varlen is encoded as per-token positions + segment ids; converters
    from/to cu_seqlens live in ops/packing.py, and the reference's
    cu_seqlens-based entry points are provided in ops/interface.py.
  - Arbitrary (non-aligned) seqlens and head dims are handled here by
    zero-padding to tile multiples and slicing back; the kernels mask
    padded key columns by static bounds.

Input layout: (batch, seq, heads, head_dim) — the flax convention.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from flash_attn_tpu.kernels import int8 as int8_qk
from flash_attn_tpu.kernels.block_sizes import MIN_BLOCK, BlockSizes
from flash_attn_tpu.kernels.common import default_interpret
from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fit_block(limit: int, total: int) -> int:
    """Largest multiple of MIN_BLOCK that divides ``total`` and is <= limit.

    ``total`` must itself be a multiple of MIN_BLOCK.
    """
    assert total % MIN_BLOCK == 0
    units = total // MIN_BLOCK
    for d_units in range(min(limit // MIN_BLOCK, units), 0, -1):
        if units % d_units == 0:
            return d_units * MIN_BLOCK
    raise AssertionError((limit, total))


@dataclasses.dataclass(frozen=True)
class _Config:
    sq: int
    sk: int
    causal: bool
    softmax_scale: float
    dropout_p: float
    has_segments: bool
    block_sizes: BlockSizes
    interpret: bool
    window_left: int | None = None
    window_right: int | None = None
    has_alibi: bool = False
    softcap: float | None = None
    out_dtype: object = None  # int8 path: original (pre-quant) dtype
    # Cell-quantized window + leading global (sink) columns: the
    # blocksparse band router (ops/blocksparse.py) and StreamingLLM-style
    # training sinks. See kernels/common.py window_band_mask.
    window_cell: tuple | None = None
    num_sinks: int = 0


def _parse_window(window_size, causal: bool):
    """Normalize a ``window_size`` argument to (left, right).

    Accepts None (no window), or a (left, right) pair where each entry is
    None or -1 for unbounded (the CUDA flash_attn convention uses -1) or a
    non-negative int. Key j is visible from query i iff
    i - left <= j <= i + right (intersected with causal/segment masks).
    """
    if window_size is None:
        return None, None
    try:
        left, right = window_size
    except (TypeError, ValueError):
        raise ValueError(
            f"window_size must be a (left, right) pair, got {window_size!r}"
        ) from None

    def norm(v, name):
        if v is None or v == -1:
            return None
        v = int(v)
        if v < 0:
            raise ValueError(
                f"window_size {name} must be >= 0, None, or -1 "
                f"(unbounded); got {v}"
            )
        return v

    left, right = norm(left, "left"), norm(right, "right")
    if causal and right is not None:
        # Causal already enforces j <= i; a non-negative right bound is
        # subsumed, so drop it from the kernel's static config (fewer
        # mask components / specializations).
        right = None
    return left, right


def alibi_slopes(n_heads: int) -> jax.Array:
    """The standard ALiBi geometric slope schedule (Press et al. 2022):
    for power-of-two head counts, slope_i = 2^(-8(i+1)/n); otherwise the
    paper's interpolation (closest power of two plus every other slope of
    the doubled schedule). Returns (n_heads,) fp32, ready for
    ``flash_attention(alibi_slopes=...)``."""
    import math

    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start ** (i + 1) for i in range(n)]

    if math.log2(n_heads).is_integer():
        s = pow2(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        s = pow2(closest) + pow2(2 * closest)[0::2][: n_heads - closest]
    return jnp.asarray(s, jnp.float32)


def _norm_alibi(alibi_slopes, b, h, softmax_scale):
    """Validate/broadcast slopes to (b, h) fp32 and pre-divide by the
    softmax scale so the kernels can add the bias to the RAW QK^T without
    breaking the folded exp2/scale constant."""
    if alibi_slopes is None:
        return None
    a = jnp.asarray(alibi_slopes, jnp.float32)
    if a.shape == (h,):
        a = jnp.broadcast_to(a[None], (b, h))
    elif a.shape != (b, h):
        raise ValueError(
            f"alibi_slopes must have shape ({h},) or ({b}, {h}); "
            f"got {a.shape}"
        )
    return a / jnp.float32(softmax_scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core_int8(cfg: _Config, q, k, v, seg, alibi):
    """Inference-only int8-QK forward (see ``qk_quant``;
    quantization lives in kernels/int8.py — demoted, INT8.md)."""
    qq, kq, qs, ks, _ = int8_qk.quantize_qk(q, k)
    qpos, kpos, qseg, kseg = seg if cfg.has_segments else (None,) * 4
    out, _ = flash_attention_fwd(
        qq, kq, v, qpos, kpos, qseg, kseg, None,
        sq=cfg.sq, sk=cfg.sk, causal=cfg.causal,
        softmax_scale=cfg.softmax_scale,
        block_sizes=cfg.block_sizes, interpret=cfg.interpret,
        save_lse=False, window_left=cfg.window_left,
        window_right=cfg.window_right, alibi=alibi,
        q_scale=qs, k_scale=ks, out_dtype=cfg.out_dtype,
    )
    return out


def _int8_fwd_vjp(cfg, q, k, v, seg, alibi):
    return _flash_core_int8(cfg, q, k, v, seg, alibi), None


def _int8_bwd_vjp(cfg, residuals, dout):
    raise NotImplementedError(
        "flash_attention(qk_quant='int8') is an inference-only path — "
        "gradients are not defined through the quantized QK^T. Drop "
        "qk_quant (or wrap in jax.lax.stop_gradient) for training."
    )


_flash_core_int8.defvjp(_int8_fwd_vjp, _int8_bwd_vjp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(cfg: _Config, q, k, v, seg, seed, alibi):
    # Primal (inference) path: skip materializing the LSE tensor.
    out, _ = _core_fwd_impl(cfg, q, k, v, seg, seed, alibi, save_lse=False)
    return out


def _core_fwd_impl(cfg: _Config, q, k, v, seg, seed, alibi, save_lse=True):
    qpos, kpos, qseg, kseg = seg if cfg.has_segments else (None,) * 4
    return flash_attention_fwd(
        q,
        k,
        v,
        qpos,
        kpos,
        qseg,
        kseg,
        seed,
        sq=cfg.sq,
        sk=cfg.sk,
        causal=cfg.causal,
        softmax_scale=cfg.softmax_scale,
        dropout_p=cfg.dropout_p,
        block_sizes=cfg.block_sizes,
        interpret=cfg.interpret,
        save_lse=save_lse,
        window_left=cfg.window_left,
        window_right=cfg.window_right,
        alibi=alibi,
        softcap=cfg.softcap,
        window_cell=cfg.window_cell,
        num_sinks=cfg.num_sinks,
    )


def _core_fwd_vjp(cfg, q, k, v, seg, seed, alibi):
    out, lse = _core_fwd_impl(cfg, q, k, v, seg, seed, alibi)
    # Under jax.checkpoint with a save_only_these_names("flash_out")
    # policy (models/gpt2.py remat_policy="dots_flash") these names mark
    # the kernel's residuals saveable, so the backward does NOT re-run
    # the S^2 forward kernel just to rebuild (out, lse). Identity
    # otherwise.
    out = _checkpoint_name(out, "flash_out")
    lse = _checkpoint_name(lse, "flash_out")
    return out, (q, k, v, seg, seed, alibi, out, lse)


def _core_bwd_vjp(cfg, residuals, dout):
    q, k, v, seg, seed, alibi, out, lse = residuals
    qpos, kpos, qseg, kseg = seg if cfg.has_segments else (None,) * 4
    dq, dk, dv = flash_attention_bwd(
        q,
        k,
        v,
        out,
        dout,
        lse,
        qpos,
        kpos,
        qseg,
        kseg,
        seed,
        sq=cfg.sq,
        sk=cfg.sk,
        causal=cfg.causal,
        softmax_scale=cfg.softmax_scale,
        dropout_p=cfg.dropout_p,
        block_sizes=cfg.block_sizes,
        interpret=cfg.interpret,
        window_left=cfg.window_left,
        window_right=cfg.window_right,
        alibi=alibi,
        softcap=cfg.softcap,
        window_cell=cfg.window_cell,
        num_sinks=cfg.num_sinks,
    )
    return dq, dk, dv, None, None, None


_flash_core.defvjp(_core_fwd_vjp, _core_bwd_vjp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core_lse(cfg: _Config, q, k, v, seg, seed, alibi):
    """(out, lse) variant that is differentiable through BOTH outputs.

    The lse cotangent folds exactly into the backward's di correction
    (see kernels/flash_bwd.py `dlse`), so gradients through
    ``return_lse=True`` match the unfused oracle — the reference's
    softmax_lse return (flash_attn_interface.py:17-26) was fwd-only.
    """
    return _core_fwd_impl(cfg, q, k, v, seg, seed, alibi)


def _core_lse_fwd_vjp(cfg, q, k, v, seg, seed, alibi):
    out, lse = _core_fwd_impl(cfg, q, k, v, seg, seed, alibi)
    return (out, lse), (q, k, v, seg, seed, alibi, out, lse)


def _core_lse_bwd_vjp(cfg, residuals, cotangents):
    dout, dlse = cotangents
    q, k, v, seg, seed, alibi, out, lse = residuals
    qpos, kpos, qseg, kseg = seg if cfg.has_segments else (None,) * 4
    dq, dk, dv = flash_attention_bwd(
        q,
        k,
        v,
        out,
        dout,
        lse,
        qpos,
        kpos,
        qseg,
        kseg,
        seed,
        sq=cfg.sq,
        sk=cfg.sk,
        causal=cfg.causal,
        softmax_scale=cfg.softmax_scale,
        dropout_p=cfg.dropout_p,
        block_sizes=cfg.block_sizes,
        interpret=cfg.interpret,
        dlse=dlse,
        window_left=cfg.window_left,
        window_right=cfg.window_right,
        alibi=alibi,
        softcap=cfg.softcap,
        window_cell=cfg.window_cell,
        num_sinks=cfg.num_sinks,
    )
    return dq, dk, dv, None, None, None


_flash_core_lse.defvjp(_core_lse_fwd_vjp, _core_lse_bwd_vjp)


def flash_attention_bwd_bshd(
    q: jax.Array,  # (b, sq, h, d)
    k: jax.Array,  # (b, sk, h_kv, d)
    v: jax.Array,
    out: jax.Array,  # (b, sq, h, d)
    dout: jax.Array,
    lse: jax.Array,  # (b, h, sq) fp32 — the *global* logsumexp
    *,
    causal: bool,
    softmax_scale: float | None = None,
    q_segment_ids: jax.Array | None = None,  # (b, sq)
    kv_segment_ids: jax.Array | None = None,
    q_positions: jax.Array | None = None,
    kv_positions: jax.Array | None = None,
    dropout_p: float = 0.0,
    dropout_seed: jax.Array | int | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    window_size: tuple[int | None, int | None] | None = None,
    alibi_slopes: jax.Array | None = None,
    softcap: float | None = None,
):
    """Standalone backward with an externally-supplied logsumexp.

    The building block for distributed attention (ring SP): a per-shard
    backward evaluated against the global lse / global (out, dout) is
    exactly the partial gradient of the global softmax. Handles the same
    padding/layout contract as ``flash_attention``. Returns (dq, dk, dv)
    in bshd layout (dk/dv at kv-head width).
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if softmax_scale is None:
        softmax_scale = d**-0.5
    if interpret is None:
        interpret = default_interpret()
    if block_sizes is None:
        block_sizes = BlockSizes.choose(seq_len_q=sq, seq_len_k=sk, head_dim=d)

    has_segments = q_segment_ids is not None
    if has_segments and q_positions is None:
        q_positions = jnp.broadcast_to(
            jnp.arange(sq, dtype=jnp.int32)[None], (b, sq)
        )
    if has_segments and kv_positions is None:
        kv_positions = jnp.broadcast_to(
            jnp.arange(sk, dtype=jnp.int32)[None], (b, sk)
        )

    d_pad = _round_up(d, MIN_BLOCK)
    bq = min(block_sizes.block_q, _round_up(sq, MIN_BLOCK))
    bk = min(block_sizes.block_k, _round_up(sk, MIN_BLOCK))
    sq_pad = _round_up(sq, bq)
    sk_pad = _round_up(sk, bk)
    block_sizes = dataclasses.replace(
        block_sizes,
        block_q=bq,
        block_k=bk,
        block_q_dkv=_fit_block(block_sizes.block_q_dkv, sq_pad),
        block_k_dkv=_fit_block(block_sizes.block_k_dkv, sk_pad),
        block_q_dq=_fit_block(block_sizes.block_q_dq, sq_pad),
        block_k_dq=_fit_block(block_sizes.block_k_dq, sk_pad),
    )

    def pad_bshd(x, s_tgt):
        pads = [(0, 0), (0, s_tgt - x.shape[1]), (0, 0), (0, d_pad - d)]
        if any(p != (0, 0) for p in pads):
            x = jnp.pad(x, pads)
        return jnp.transpose(x, (0, 2, 1, 3))

    qp = pad_bshd(q, sq_pad)
    kp = pad_bshd(k, sk_pad)
    vp = pad_bshd(v, sk_pad)
    op = pad_bshd(out, sq_pad)
    dop = pad_bshd(dout, sq_pad)
    lse_p = lse.astype(jnp.float32)
    if sq_pad != sq:
        # Padded rows: dout rows are zero so their ds/di vanish; any finite
        # lse keeps exp2 well-defined.
        lse_p = jnp.pad(lse_p, [(0, 0), (0, 0), (0, sq_pad - sq)])

    seg_args = (None,) * 4
    if has_segments:
        def pad_i32(x, s_tgt, fill):
            if x.shape[1] != s_tgt:
                x = jnp.pad(x, [(0, 0), (0, s_tgt - x.shape[1])],
                            constant_values=fill)
            return x.astype(jnp.int32)

        seg_args = (
            pad_i32(q_positions, sq_pad, 0),
            pad_i32(kv_positions, sk_pad, 0),
            pad_i32(q_segment_ids, sq_pad, -1),
            pad_i32(kv_segment_ids, sk_pad, -1),
        )

    if dropout_seed is None:
        seed = None
    else:
        seed = jnp.asarray(dropout_seed).astype(jnp.uint32)
    window_left, window_right = _parse_window(window_size, causal)
    if not has_segments:
        if window_left is not None and window_left >= sq - 1:
            window_left = None
        if window_right is not None and window_right >= sk - 1:
            window_right = None
    alibi = _norm_alibi(alibi_slopes, b, h, softmax_scale)
    dq, dk, dv = flash_attention_bwd(
        qp, kp, vp, op, dop, lse_p,
        *seg_args,
        seed,
        sq=sq,
        sk=sk,
        causal=causal,
        softmax_scale=float(softmax_scale),
        dropout_p=float(dropout_p),
        block_sizes=block_sizes,
        interpret=interpret,
        window_left=window_left,
        window_right=window_right,
        alibi=alibi,
        softcap=None if softcap is None else float(softcap),
    )
    unpack_q = lambda x: jnp.transpose(x, (0, 2, 1, 3))[:, :sq, :, :d]  # noqa: E731
    unpack_k = lambda x: jnp.transpose(x, (0, 2, 1, 3))[:, :sk, :, :d]  # noqa: E731
    return unpack_q(dq), unpack_k(dk), unpack_k(dv)


def flash_attention(
    q: jax.Array,  # (b, sq, h, d)
    k: jax.Array,  # (b, sk, h, d)
    v: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    q_segment_ids: jax.Array | None = None,  # (b, sq) int32, -1 = padding
    kv_segment_ids: jax.Array | None = None,
    q_positions: jax.Array | None = None,  # (b, sq) int32 local positions
    kv_positions: jax.Array | None = None,
    dropout_p: float = 0.0,
    dropout_seed: jax.Array | int | None = None,
    block_sizes: BlockSizes | None = None,
    return_lse: bool = False,
    interpret: bool | None = None,
    layout: str = "bshd",
    window_size: tuple[int | None, int | None] | None = None,
    alibi_slopes: jax.Array | None = None,
    softcap: float | None = None,
    qk_quant: str | None = None,
    num_sinks: int = 0,
    window_cell: tuple[int, int] | None = None,
):
    """Fused flash attention. O = dropout(softmax(scale * Q K^T + mask)) V.

    ``layout``: "bshd" (default, the flax convention — transposed to the
    kernel layout internally) or "bhsd" (the kernel-native layout; zero
    relayout cost — use for benchmarks/serving paths that keep tensors
    head-major, like the reference benchmark unpads outside the timed
    region, reference benchmarks/benchmark_flash_attention.py:60-63).

    GQA/MQA: k/v may carry fewer heads than q (q heads must be a
    multiple); kv blocks are read in place via head-index mapping — no
    broadcasted copy — and dk/dv come back group-summed at kv-head shape.

    - ``causal``: lower-triangular masking; with ``q_positions`` /
      ``kv_positions`` given, compares those (per-segment local positions)
      instead of global indices.
    - ``*_segment_ids``: tokens attend only within equal segment ids;
      id -1 marks padding (attends to/from nothing, output row = 0).
    - ``dropout_p``: probability of dropping an attention weight. Requires
      ``dropout_seed`` (uint32 scalar or int). Same seed => bit-identical
      mask in forward and backward, any tiling.
    - ``return_lse``: also return the fp32 (b, h, sq) logsumexp.
    - ``window_size``: sliding-window (local) attention, a (left, right)
      pair: key j is visible from query i iff i - left <= j <= i + right
      (positions when segment ids are given, global indices otherwise).
      None / -1 entries mean unbounded (the CUDA flash_attn convention).
      Band-dead blocks are skipped by the kernels, so cost scales with the
      band width, not the sequence length. E.g. ``causal=True,
      window_size=(4095, 0)`` is Mistral-style local causal attention.
    - ``alibi_slopes``: (h,) or (b, h) fp32 per-head ALiBi slopes (the
      CUDA flash_attn v2.4 feature): bias -slope * (i - j) is added to
      the scaled scores for causal attention and -slope * |i - j|
      otherwise. Distances use global indices — the same top-left
      convention as this library's causal mask (the CUDA v2 bottom-right
      alignment differs only when sq != sk; pass positions via the
      segment path for custom alignments). ``alibi_slopes(n_heads)`` in
      this module builds the standard geometric schedule. Slopes are
      constants (no gradient flows to them), matching the CUDA semantics.
    - ``softcap``: logit soft-capping (Gemma-2 style; the CUDA flash_attn
      v2.6 feature): the scaled scores pass through
      ``softcap * tanh(s / softcap)`` before the ALiBi bias and masking,
      bounding every logit to (-softcap, softcap). Differentiable (the
      backward applies the tanh chain rule in-kernel). Must be > 0.
    - ``qk_quant="int8"``: EXPERIMENTAL, inference-only SageAttention-
      style path — q/k are symmetrically quantized per token (k mean-
      centered per head, which leaves the softmax exactly invariant) and
      the QK^T dot runs as int8 x int8 -> int32; softmax and PV stay
      full-precision. Composes with causal / window / ALiBi / GQA /
      varlen segments; not with dropout, softcap, or return_lse, and
      gradients raise (quantized scores have no defined vjp here).
      NOT a speed win on v5e as measured: Mosaic does not reach the
      MXU's 2x int8 rate for these dots — benchmarks/ab_int8.py
      measured 0.68x vs bf16 at the bench shape. Kept for accuracy
      experiments and for hardware/toolchains where int8 dots do pay.
    - ``num_sinks``: with a ``window_size`` band, keeps the first N key
      columns always visible (global attention-sink tokens — the
      training-path twin of the paged decode kernels' ``num_sinks``;
      StreamingLLM, Longformer-style global prefixes). Global indices;
      does not compose with segment ids.
    - ``window_cell``: (cq, ck) — quantize the window comparison to cell
      granularity: key j is visible from query i iff cell j//ck lies in
      the band run of cell row i//cq. Used by the blocksparse band
      router (ops/blocksparse.py) to reproduce a cell-granular blockmask
      EXACTLY on the band-following window schedule; see
      kernels/common.py window_band_mask for the identities.
    """
    if q.dtype == jnp.float16:
        # fp16 envelope (the reference is fp16-primary, fmha_api.cpp:136):
        # v5e has no fp16 MXU mode and Mosaic does not lower f16 kernels,
        # so fp16 is accepted via an exact upcast to f32 compute and cast
        # back. bf16 is the native TPU performance path.
        out = flash_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32),
            causal=causal, softmax_scale=softmax_scale,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            q_positions=q_positions, kv_positions=kv_positions,
            dropout_p=dropout_p, dropout_seed=dropout_seed,
            block_sizes=block_sizes, return_lse=return_lse,
            interpret=interpret, layout=layout, window_size=window_size,
            alibi_slopes=alibi_slopes, softcap=softcap, qk_quant=qk_quant,
            num_sinks=num_sinks, window_cell=window_cell,
        )
        if return_lse:
            return out[0].astype(jnp.float16), out[1]
        return out.astype(jnp.float16)

    if layout == "bshd":
        b, sq, h, d = q.shape
        sk, h_kv = k.shape[1], k.shape[2]
        kv_shape = (b, sk, h_kv, d)
    elif layout == "bhsd":
        b, h, sq, d = q.shape
        h_kv, sk = k.shape[1], k.shape[2]
        kv_shape = (b, h_kv, sk, d)
    else:
        raise ValueError(f"layout must be 'bshd' or 'bhsd', got {layout!r}")
    if k.shape != kv_shape or v.shape != kv_shape or h % max(h_kv, 1) != 0:
        raise ValueError(
            f"q/k/v shape mismatch: {q.shape}, {k.shape}, {v.shape} "
            "(GQA/MQA requires q heads to be a multiple of kv heads)"
        )
    if softmax_scale is None:
        softmax_scale = d**-0.5
    if interpret is None:
        interpret = default_interpret()
    if dropout_p < 0.0 or dropout_p >= 1.0:
        raise ValueError(f"dropout_p must be in [0, 1), got {dropout_p}")
    if dropout_p > 0.0 and dropout_seed is None:
        raise ValueError("dropout_p > 0 requires dropout_seed")
    if softcap is not None and softcap <= 0.0:
        raise ValueError(f"softcap must be > 0, got {softcap}")
    if qk_quant not in (None, "int8"):
        raise ValueError(f"qk_quant must be None or 'int8', got {qk_quant!r}")
    if qk_quant is not None:
        if dropout_p > 0.0:
            raise ValueError(
                "qk_quant is an inference-only path; dropout implies "
                "training — drop one of them"
            )
        if softcap is not None:
            raise ValueError(
                "qk_quant does not compose with softcap: the k-mean-"
                "centering shift is only softmax-invariant for ADDITIVE "
                "score transforms, and tanh capping is not"
            )
        if return_lse:
            raise ValueError(
                "return_lse is not supported with qk_quant (the centered "
                "lse differs from the true lse by a per-row q.k_mean term)"
            )
    window_left, window_right = _parse_window(window_size, causal)

    has_segments = q_segment_ids is not None
    if window_cell is not None or num_sinks > 0:
        # Sliding-window extensions: ``num_sinks`` keeps the first N key
        # columns always visible (StreamingLLM training sinks /
        # blocksparse global tokens); ``window_cell=(cq, ck)`` quantizes
        # the band comparison to cell granularity (exact blocksparse band
        # routing — see ops/blocksparse.py). Both compare GLOBAL indices.
        if has_segments:
            raise ValueError(
                "num_sinks/window_cell do not compose with segment ids "
                "(they compare global indices, not positions)"
            )
        if window_left is None and window_right is None:
            raise ValueError(
                "num_sinks/window_cell require a window_size band"
            )
        if num_sinks < 0:
            raise ValueError(f"num_sinks must be >= 0, got {num_sinks}")
        if window_cell is not None:
            cq_c, ck_c = window_cell
            if int(cq_c) < 1 or int(ck_c) < 1:
                raise ValueError(f"window_cell must be >= 1, {window_cell}")
            window_cell = (int(cq_c), int(ck_c))
        if qk_quant is not None:
            raise ValueError("num_sinks/window_cell: no qk_quant support")
    if not has_segments:
        # Without segments the window compares global indices, so a band
        # covering every (i, j) pair is exactly the unwindowed kernel —
        # drop the bound (fewer specializations; tri-grid/diag paths stay
        # available). With segments, positions are caller-supplied and
        # unbounded, so no such simplification is valid.
        if window_left is not None and window_left >= sq - 1:
            window_left = None
        if window_right is not None and window_right >= sk - 1:
            window_right = None
        if window_left is None and window_right is None:
            # Band dropped as all-covering: the quantized band is a
            # superset and the sink columns a subset — both redundant.
            window_cell = None
            num_sinks = 0
    if has_segments and kv_segment_ids is None:
        raise ValueError("q_segment_ids requires kv_segment_ids")
    if has_segments and q_positions is None:
        q_positions = jnp.broadcast_to(
            jnp.arange(sq, dtype=jnp.int32)[None], (b, sq)
        )
    if has_segments and kv_positions is None:
        kv_positions = jnp.broadcast_to(
            jnp.arange(sk, dtype=jnp.int32)[None], (b, sk)
        )

    if block_sizes is None:
        block_sizes = BlockSizes.choose(seq_len_q=sq, seq_len_k=sk, head_dim=d)

    # --- resolve tiles and pad to multiples ---
    # The forward block sets the padded length; the backward blocks are then
    # fitted to the largest 128-multiple divisor of it within their limit,
    # so every kernel's tiling divides the padded shapes exactly.
    d_pad = _round_up(d, MIN_BLOCK)
    bq = min(block_sizes.block_q, _round_up(sq, MIN_BLOCK))
    bk = min(block_sizes.block_k, _round_up(sk, MIN_BLOCK))
    sq_pad = _round_up(sq, bq)
    sk_pad = _round_up(sk, bk)
    block_sizes = dataclasses.replace(
        block_sizes,
        block_q=bq,
        block_k=bk,
        block_q_dkv=_fit_block(block_sizes.block_q_dkv, sq_pad),
        block_k_dkv=_fit_block(block_sizes.block_k_dkv, sk_pad),
        block_q_dq=_fit_block(block_sizes.block_q_dq, sq_pad),
        block_k_dq=_fit_block(block_sizes.block_k_dq, sk_pad),
    )

    def pad_qkv(x, s_tgt):
        if layout == "bshd":
            pads = [(0, 0), (0, s_tgt - x.shape[1]), (0, 0), (0, d_pad - d)]
            if any(p != (0, 0) for p in pads):
                x = jnp.pad(x, pads)
            # (b, s, h, d) -> (b, h, s, d)
            return jnp.transpose(x, (0, 2, 1, 3))
        pads = [(0, 0), (0, 0), (0, s_tgt - x.shape[2]), (0, d_pad - d)]
        if any(p != (0, 0) for p in pads):
            x = jnp.pad(x, pads)
        return x

    qp = pad_qkv(q, sq_pad)
    kp = pad_qkv(k, sk_pad)
    vp = pad_qkv(v, sk_pad)

    seg = ()
    if has_segments:

        def pad_i32(x, s_tgt, fill):
            if x.shape[1] != s_tgt:
                x = jnp.pad(x, [(0, 0), (0, s_tgt - x.shape[1])],
                            constant_values=fill)
            return x.astype(jnp.int32)

        seg = (
            pad_i32(q_positions, sq_pad, 0),
            pad_i32(kv_positions, sk_pad, 0),
            pad_i32(q_segment_ids, sq_pad, -1),
            pad_i32(kv_segment_ids, sk_pad, -1),
        )

    if dropout_seed is None:
        seed = jnp.zeros((), jnp.uint32)
    else:
        seed = jnp.asarray(dropout_seed).astype(jnp.uint32)
    alibi = _norm_alibi(alibi_slopes, b, h, softmax_scale)

    cfg = _Config(
        sq=sq,
        sk=sk,
        causal=causal,
        softmax_scale=float(softmax_scale),
        dropout_p=float(dropout_p),
        has_segments=has_segments,
        block_sizes=block_sizes,
        interpret=interpret,
        window_left=window_left,
        window_right=window_right,
        has_alibi=alibi is not None,
        softcap=None if softcap is None else float(softcap),
        window_cell=window_cell,
        num_sinks=int(num_sinks),
    )

    def unpack(out):
        if layout == "bshd":
            return jnp.transpose(out, (0, 2, 1, 3))[:, :sq, :, :d]
        return out[:, :, :sq, :d]

    if qk_quant == "int8":
        cfg8 = dataclasses.replace(cfg, out_dtype=q.dtype)
        return unpack(_flash_core_int8(cfg8, qp, kp, vp, seg, alibi))

    if return_lse:
        out, lse = _flash_core_lse(cfg, qp, kp, vp, seg, seed, alibi)
        return unpack(out), lse[:, :, :sq]

    return unpack(_flash_core(cfg, qp, kp, vp, seg, seed, alibi))
