"""Reference-parity functional API (cu_seqlens entry points).

Mirrors the public surface of the reference's
``flash_attn/flash_attn_interface.py``:

  - flash_attn_unpadded_qkvpacked_func   (reference :151-176)
  - flash_attn_unpadded_kvpacked_func    (reference :179-210)
  - flash_attn_unpadded_func             (reference :213-243)
  - flash_attn_func (legacy alias)       (reference :246-252)

Inputs are packed token-major tensors plus int32 ``cu_seqlens`` of shape
(batch + 1,). Internally these convert cu_seqlens to the TPU-idiomatic
segment-id/position encoding and run the packed batch as a single fused
super-sequence (batch=1) through the Pallas kernels — no gather/scatter.

Instead of the reference's implicit CUDA RNG-generator state, dropout takes
an explicit ``dropout_seed`` (any uint32; same seed => bit-identical mask in
fwd/bwd — see kernels/prng.py). ``return_attn_probs=True`` returns
(out, softmax_lse, S_dmask) where S_dmask is the boolean keep-mask in plain
(1, nheads, total_q, total_k) layout — the TPU debug equivalent of the
reference's sign-bit-encoded S tensor (no layout decoder needed;
SURVEY.md section 4 "Implication for the TPU build").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels import prng
from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.packing import cu_seqlens_to_segments


def _packed_attention(
    q,  # (total_q, h, d)
    k,  # (total_k, h, d)
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    dropout_p,
    softmax_scale,
    causal,
    return_attn_probs,
    dropout_seed,
    block_sizes: BlockSizes | None = None,
    window_size=None,
    alibi_slopes=None,
    softcap=None,
):
    total_q, h, d = q.shape
    total_k = k.shape[0]
    qseg, qpos = cu_seqlens_to_segments(cu_seqlens_q, total_q)
    kseg, kpos = cu_seqlens_to_segments(cu_seqlens_k, total_k)
    kw = dict(
        causal=causal,
        softmax_scale=softmax_scale,
        q_segment_ids=qseg[None],
        kv_segment_ids=kseg[None],
        q_positions=qpos[None],
        kv_positions=kpos[None],
        dropout_p=dropout_p,
        dropout_seed=dropout_seed,
        block_sizes=block_sizes,
        # Later-upstream kwargs (v2.3/2.4/2.6): the segment path compares
        # per-sequence LOCAL positions, so window bands and ALiBi
        # distances are exact per packed sequence.
        window_size=window_size,
        alibi_slopes=alibi_slopes,
        softcap=softcap,
    )
    if not return_attn_probs:
        # Differentiable path (custom VJP).
        return flash_attention(q[None], k[None], v[None], **kw)[0]
    # Test/debug path (forward-only, also returns lse).
    out, lse = flash_attention(q[None], k[None], v[None], **kw, return_lse=True)
    out = out[0]
    # lse: (1, h, total_q) fp32; S_dmask: keep-mask regenerated from the seed
    # (bit-identical to what the kernels used).
    if dropout_p > 0.0:
        s_dmask = prng.dropout_mask_dense(
            jnp.asarray(dropout_seed).astype(jnp.uint32), 1, h, total_q, total_k,
            dropout_p,
        )
    else:
        s_dmask = None
    return out, lse, s_dmask


def flash_attn_unpadded_func(
    q,
    k,
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q,
    max_seqlen_k,
    dropout_p,
    softmax_scale=None,
    causal=False,
    return_attn_probs=False,
    *,
    dropout_seed=None,
    block_sizes=None,
    window_size=None,
    alibi_slopes=None,
    softcap=None,
):
    """Separate q/k/v packed varlen attention (reference :213-243).

    q: (total_q, nheads, headdim); k, v: (total_k, nheads, headdim);
    cu_seqlens_*: (batch + 1,) int32. ``max_seqlen_*`` are accepted for API
    parity (tile sizing is derived from the static packed shapes).
    ``window_size`` / ``alibi_slopes`` / ``softcap`` follow the later
    upstream varlen API (per-sequence local positions).
    """
    del max_seqlen_q, max_seqlen_k
    return _packed_attention(
        q, k, v, cu_seqlens_q, cu_seqlens_k, dropout_p, softmax_scale,
        causal, return_attn_probs, dropout_seed, block_sizes,
        window_size, alibi_slopes, softcap,
    )


def flash_attn_unpadded_kvpacked_func(
    q,
    kv,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q,
    max_seqlen_k,
    dropout_p,
    softmax_scale=None,
    causal=False,
    return_attn_probs=False,
    *,
    dropout_seed=None,
    block_sizes=None,
    window_size=None,
    alibi_slopes=None,
    softcap=None,
):
    """q + packed kv (total_k, 2, nheads, headdim) (reference :179-210)."""
    return flash_attn_unpadded_func(
        q, kv[:, 0], kv[:, 1], cu_seqlens_q, cu_seqlens_k, max_seqlen_q,
        max_seqlen_k, dropout_p, softmax_scale, causal, return_attn_probs,
        dropout_seed=dropout_seed, block_sizes=block_sizes,
        window_size=window_size, alibi_slopes=alibi_slopes, softcap=softcap,
    )


def flash_attn_unpadded_qkvpacked_func(
    qkv,
    cu_seqlens,
    max_seqlen,
    dropout_p,
    softmax_scale=None,
    causal=False,
    return_attn_probs=False,
    *,
    dropout_seed=None,
    block_sizes=None,
    window_size=None,
    alibi_slopes=None,
    softcap=None,
):
    """Packed qkv (total, 3, nheads, headdim) self-attention
    (reference :151-176)."""
    return flash_attn_unpadded_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], cu_seqlens, cu_seqlens, max_seqlen,
        max_seqlen, dropout_p, softmax_scale, causal, return_attn_probs,
        dropout_seed=dropout_seed, block_sizes=block_sizes,
        window_size=window_size, alibi_slopes=alibi_slopes, softcap=softcap,
    )


def flash_attn_func(
    qkv,
    cu_seqlens,
    dropout_p,
    max_s,
    softmax_scale=None,
    causal=False,
    return_attn_probs=False,
    **kwargs,
):
    """Legacy alias with the pre-rename argument order (reference :246-252)."""
    return flash_attn_unpadded_qkvpacked_func(
        qkv, cu_seqlens, max_s, dropout_p, softmax_scale, causal,
        return_attn_probs, **kwargs,
    )


# Modern upstream names (the package renamed unpadded -> varlen in v2):
# same signatures, so migrating code from either era finds its symbols.
flash_attn_varlen_func = flash_attn_unpadded_func
flash_attn_varlen_kvpacked_func = flash_attn_unpadded_kvpacked_func
flash_attn_varlen_qkvpacked_func = flash_attn_unpadded_qkvpacked_func


def _get_block_size(device=None, head_dim: int = 64, is_dropout: bool = False,
                    seq_len: int = 4096):
    """Parity shim for the reference's block-size mirror
    (flash_attn/flash_attn_interface.py:8-14, used by its tests to decode
    the S_dmask layout). The CUDA table keys on (arch, head_dim, dropout);
    the TPU analog is the BlockSizes heuristic — returns
    (block_q, block_k) as resolved for these parameters. ``device`` is
    accepted for signature parity and ignored (JAX arrays carry their own
    placement)."""
    del device
    bs = BlockSizes.choose(
        seq_len_q=seq_len, seq_len_k=seq_len, head_dim=head_dim,
        dropout=is_dropout,
    )
    return bs.block_q, bs.block_k
