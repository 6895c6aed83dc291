from flash_attn_tpu.utils.checkpoint import TrainCheckpointer

__all__ = ["TrainCheckpointer"]
