"""Long-context attention: ring sequence parallelism over a device mesh.

The sequence dimension is sharded across devices; K/V blocks rotate around
the ring (jax.lax.ppermute over ICI) while each device attends its local
queries — communication overlaps the attention matmuls, and causal load is
balanced by the ZIGZAG shard order.

On a TPU pod slice this runs as-is over real ICI. To try it on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/long_context_ring.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from flash_attn_tpu import flash_attention
from flash_attn_tpu.parallel.ring import (
    inverse_permutation,
    ring_flash_attention,
    zigzag_permutation,
)

devices = jax.devices()
n = len(devices)
mesh = Mesh(np.asarray(devices), ("seq",))

b, s, h, d = 1, 1024 * n, 4, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

# Zigzag order: device i holds tokens (i, 2n-1-i, 2n+i, ...) so every
# device does the same amount of causal work.
perm = zigzag_permutation(s, n)
inv = inverse_permutation(perm)


def ring(q, k, v):
    out, _ = ring_flash_attention(
        q, k, v, axis_name="seq", causal=True, zigzag=True
    )
    return out


f = jax.jit(
    shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "seq", None, None),) * 3,
        out_specs=P(None, "seq", None, None),
        check_vma=False,
    )
)
out = f(q[:, perm], k[:, perm], v[:, perm])[:, inv]

ref = flash_attention(q, k, v, causal=True)
err = float(jnp.max(jnp.abs(out - ref)))
print(f"{n} devices, S={s}: ring vs single-device max err {err:.2e}")
assert err < 2e-5
print("ok")
