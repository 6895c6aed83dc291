from flash_attn_tpu.serving.cache import (
    PageAllocator,
    PagedKVCache,
    append_span,
    append_token,
    init_cache,
    write_prompt,
)
from flash_attn_tpu.serving.kvcache import (
    append_chunk,
    flash_attn_with_kvcache,
)
from flash_attn_tpu.serving.sharding import (
    make_sharded_chunk_attention,
    make_sharded_paged_decode,
)

__all__ = [
    "PageAllocator",
    "PagedKVCache",
    "ServingEngine",
    "append_chunk",
    "append_span",
    "append_token",
    "flash_attn_with_kvcache",
    "init_cache",
    "make_sharded_chunk_attention",
    "make_sharded_paged_decode",
    "write_prompt",
]


def __getattr__(name):
    # Lazy: the engine pulls in the GPT-2 decode model, which itself
    # imports serving.cache — an eager import here would be circular.
    if name == "ServingEngine":
        from flash_attn_tpu.serving.engine import ServingEngine

        return ServingEngine
    raise AttributeError(name)
