"""Host-factored (DCN x ICI) mesh tests on the 8-virtual-device CPU mesh.

Emulates a 2-host x 4-chip topology: axis 0 of the mesh stands for the
DCN (host) boundary, the rest for intra-host ICI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attn_tpu import flash_attention
from flash_attn_tpu.parallel.multihost import host_device_mesh
from flash_attn_tpu.parallel.ring import (
    inverse_permutation,
    ring_flash_attention,
    zigzag_permutation,
)
from flash_attn_tpu.utils.testing import random_qkv


def test_host_device_mesh_shapes():
    devs = jax.devices()[:8]
    mesh = host_device_mesh(devices=devs, num_hosts=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)
    mesh3 = host_device_mesh(
        ("data", "seq", "model"), devices=devs, num_hosts=2,
        chip_factors=(2, 2),
    )
    assert mesh3.devices.shape == (2, 2, 2)


def test_host_dp_train_step():
    """GPT-2 train step on the host-factored mesh: DP over the host (DCN)
    axis, head-TP over the chip (ICI) axis."""
    from flash_attn_tpu.models.gpt2 import (
        GPT2Config, make_sharded_model, make_train_step, param_shardings,
    )

    mesh = host_device_mesh(devices=jax.devices()[:8], num_hosts=2)
    cfg = GPT2Config.tiny(n_head=8, dropout=0.0)
    model = make_sharded_model(cfg, mesh, interpret=True)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 256)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids}
    params = model.init(jax.random.PRNGKey(0), ids)
    optimizer = optax.adamw(1e-3)
    params = jax.device_put(params, param_shardings(params, mesh))
    opt_state = optimizer.init(params)
    batch = jax.device_put(batch, NamedSharding(mesh, P("data", None)))
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0, 1))
    _, _, loss = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_sp_across_hosts(causal):
    """Ring attention with the ring axis ON the host (DCN) axis: each hop
    crosses the host boundary; result must match dense."""
    mesh = host_device_mesh(devices=jax.devices()[:8], num_hosts=2)
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 256, 4, 64
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    ref = flash_attention(q, k, v, causal=causal)

    def ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, axis_name="data", causal=causal
        )
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, "data", "model", None),) * 3,
        out_specs=P(None, "data", "model", None),
        check_vma=False,
    )
    out = jax.jit(f)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_hostdp_ringsp_headtp_composed():
    """3-axis composition on the host-factored mesh: batch over the host
    (DCN) axis, zigzag ring SP over one ICI axis, head-TP over the other."""
    mesh = host_device_mesh(
        ("data", "seq", "model"), devices=jax.devices()[:8], num_hosts=2,
        chip_factors=(2, 2),
    )
    rng = np.random.default_rng(2)
    b, s, h, d = 2, 256, 4, 64
    n_seq = 2
    q, k, v = random_qkv(rng, b, s, s, h, d, jnp.float32)
    ref = flash_attention(q, k, v, causal=True)

    perm = zigzag_permutation(s, n_seq)
    inv = inverse_permutation(perm)

    def ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, axis_name="seq", causal=True, zigzag=True
        )
        return out

    f = shard_map(
        ring,
        mesh=mesh,
        in_specs=(P("data", "seq", "model", None),) * 3,
        out_specs=P("data", "seq", "model", None),
        check_vma=False,
    )
    out = jax.jit(f)(q[:, perm], k[:, perm], v[:, perm])[:, inv]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )
