from flash_attn_tpu.ops.attention import alibi_slopes, flash_attention

__all__ = ["alibi_slopes", "flash_attention"]
