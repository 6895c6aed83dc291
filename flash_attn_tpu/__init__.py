"""flash_attn_tpu: a TPU-native flash-attention engine.

Brand-new JAX/Pallas implementation of the full capability surface of the
reference ``flash_attn`` package (FlashAttention alpha 0.1): fused
forward/backward exact attention with online softmax, causal and varlen
(cu_seqlens / segment-id) masking, reproducible fused dropout, rotary
embeddings (1D/2D), blocksparse attention, padding/packing utilities,
drop-in MHA modules — plus TPU-first extensions: sharding (tensor/sequence
parallel via shard_map + ring attention), paged decode with quantized KV
cache, and serving.
"""

from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.ops.attention import flash_attention

__version__ = "0.1.0"

__all__ = [
    "BlockSizes",
    "flash_attention",
    "__version__",
]
