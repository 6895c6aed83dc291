from flash_attn_tpu.ops.attention import flash_attention

__all__ = ["flash_attention"]
