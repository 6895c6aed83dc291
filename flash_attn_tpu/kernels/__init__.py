from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd
from flash_attn_tpu.kernels.chunk import paged_chunk_attention
from flash_attn_tpu.kernels.decode import paged_decode_attention

__all__ = [
    "BlockSizes",
    "flash_attention_fwd",
    "flash_attention_bwd",
    "paged_chunk_attention",
    "paged_decode_attention",
]
