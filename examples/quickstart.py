"""Quickstart: the dense flash_attention op.

Runs anywhere (TPU, or CPU via Pallas interpret mode — auto-detected):

    python examples/quickstart.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import flash_attention

rng = np.random.default_rng(0)
b, s, h, d = 2, 1024, 8, 64
dt = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
q = jnp.asarray(rng.standard_normal((b, s, h, d)), dt)
k = jnp.asarray(rng.standard_normal((b, s, h, d)), dt)
v = jnp.asarray(rng.standard_normal((b, s, h, d)), dt)

# 1. Causal self-attention. Layout is (batch, seq, heads, head_dim).
out = flash_attention(q, k, v, causal=True)
print("causal:", out.shape, out.dtype)

# 2. LSE output (the reference's softmax_lse contract: fp32 (b, h, s)).
#    Differentiable through BOTH outputs.
out, lse = flash_attention(q, k, v, causal=True, return_lse=True)
print("lse:", lse.shape, lse.dtype)

# 3. Dropout: explicit uint32 seed; the same seed regenerates the identical
#    mask in the backward pass (nothing is stored).
out = flash_attention(q, k, v, causal=True, dropout_p=0.1, dropout_seed=42)

# 4. Variable-length sequences via segment ids (-1 marks padding): tokens
#    attend only within their own segment — several documents can be packed
#    into one row with no cross-contamination.
seg = jnp.asarray(
    [[0] * 300 + [1] * 500 + [-1] * 224, [0] * 1000 + [-1] * 24], jnp.int32
)
out = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)

# 5. GQA / MQA: fewer kv heads than q heads.
k2 = k[:, :, :2, :]
v2 = v[:, :, :2, :]
out = flash_attention(q, k2, v2, causal=True)
print("gqa:", out.shape)

# 6. Gradients: it is a jax.custom_vjp — just differentiate.
def loss(q, k, v):
    return jnp.sum(flash_attention(q, k, v, causal=True).astype(jnp.float32))

dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
print("grads:", dq.shape, dk.shape, dv.shape)
print("ok")
