from flash_attn_tpu.parallel.ring import (  # noqa: F401
    inverse_permutation,
    ring_flash_attention,
    zigzag_permutation,
)
from flash_attn_tpu.parallel.sharding import (  # noqa: F401
    make_sharded_flash_attention,
)
