"""Model families on FlashMHA: the reference's named integration targets
(BERT / GPT-2 / ViT, reference README.md:145), the Llama/Mistral family
(GQA + rotary + RMSNorm + SwiGLU + sliding window), and drop-in modules."""

from flash_attn_tpu.models.bert import BertConfig, BertForMaskedLM, BertModel
from flash_attn_tpu.models.convert import (
    convert_hf_gpt2_state_dict,
    gpt2_config_from_hf,
    load_hf_gpt2,
)
from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from flash_attn_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    convert_hf_llama_state_dict,
    llama_config_from_hf,
    load_hf_llama,
)
from flash_attn_tpu.models.modules import FlashAttention, FlashMHA
from flash_attn_tpu.models.vit import ViTClassifier, ViTConfig

__all__ = [
    "BertConfig",
    "BertForMaskedLM",
    "BertModel",
    "FlashAttention",
    "FlashMHA",
    "GPT2Config",
    "GPT2LMHeadModel",
    "LlamaConfig",
    "LlamaForCausalLM",
    "ViTClassifier",
    "ViTConfig",
    "convert_hf_gpt2_state_dict",
    "convert_hf_llama_state_dict",
    "gpt2_config_from_hf",
    "llama_config_from_hf",
    "load_hf_gpt2",
    "load_hf_llama",
]
