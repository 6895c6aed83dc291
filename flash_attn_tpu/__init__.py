"""flash_attn_tpu: a TPU-native flash-attention engine.

Brand-new JAX/Pallas implementation of the full capability surface of the
reference ``flash_attn`` package (FlashAttention alpha 0.1): fused
forward/backward exact attention with online softmax, causal and varlen
(cu_seqlens / segment-id) masking, reproducible fused dropout, rotary
embeddings (1D/2D), blocksparse attention, padding/packing utilities,
drop-in MHA modules — plus TPU-first extensions: GQA/MQA, sharding
(tensor/sequence parallel via shard_map + ring attention), paged decode
with quantized KV cache, and serving.
"""

from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.ops.attention import alibi_slopes, flash_attention
from flash_attn_tpu.ops.interface import (
    flash_attn_func,
    flash_attn_unpadded_func,
    flash_attn_unpadded_kvpacked_func,
    flash_attn_unpadded_qkvpacked_func,
    flash_attn_varlen_func,
    flash_attn_varlen_kvpacked_func,
    flash_attn_varlen_qkvpacked_func,
)
from flash_attn_tpu.ops.packing import pad_input, unpad_input

__version__ = "0.1.0"

__all__ = [
    "BlockSizes",
    "flash_attention",
    "alibi_slopes",
    "flash_attn_func",
    "flash_attn_unpadded_func",
    "flash_attn_unpadded_kvpacked_func",
    "flash_attn_unpadded_qkvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_kvpacked_func",
    "flash_attn_varlen_qkvpacked_func",
    "pad_input",
    "unpad_input",
    "__version__",
]
