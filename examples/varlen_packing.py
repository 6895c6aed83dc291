"""Variable-length sequences: the BERT-padding round trip and the
cu_seqlens entry points (the reference flash_attn API), plus the
TPU-idiomatic segment-id form.

    python examples/varlen_packing.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import flash_attention
from flash_attn_tpu.ops.interface import flash_attn_unpadded_qkvpacked_func
from flash_attn_tpu.ops.packing import (
    make_segment_ids_from_mask,
    pad_input,
    unpad_input,
)

rng = np.random.default_rng(0)
b, s, h, d = 3, 256, 4, 64
lengths = [200, 96, 256]
mask = jnp.asarray(
    [[1] * n + [0] * (s - n) for n in lengths], bool
)  # (b, s) True at valid tokens
qkv_padded = jnp.asarray(rng.standard_normal((b, s, 3, h, d)), jnp.float32)

# --- Path 1: reference-style pack -> attend -> unpack -----------------------
packed, indices, cu_seqlens, max_seqlen = unpad_input(qkv_padded, mask)
print("packed:", packed.shape, "cu_seqlens:", np.asarray(cu_seqlens))

out_packed = flash_attn_unpadded_qkvpacked_func(
    packed, cu_seqlens, max_seqlen, dropout_p=0.0, causal=True
)
out1 = pad_input(out_packed, indices, b, s)
print("repadded:", out1.shape)

# --- Path 2: TPU-idiomatic — stay padded, pass segment ids ------------------
# No gather/scatter round trip; padding is masked inside the kernel.
seg, pos = make_segment_ids_from_mask(mask)
q, k, v = (qkv_padded[:, :, i] for i in range(3))
out2 = flash_attention(
    q, k, v, causal=True,
    q_segment_ids=seg, kv_segment_ids=seg,
    q_positions=pos, kv_positions=pos,
)

# Both paths agree on the valid tokens.
m = np.asarray(mask)[:, :, None, None]
np.testing.assert_allclose(
    np.asarray(out1) * m, np.asarray(out2) * m, atol=2e-5
)
print("pack/unpack and segment-id paths agree; ok")
