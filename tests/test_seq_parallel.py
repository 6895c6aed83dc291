"""Model-level zigzag sequence-parallel GPT-2 on the virtual mesh:
the SP train path (ring attention inside the model, activations sharded
on the sequence dimension) must agree with the single-device model."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.models.gpt2 import (
    GPT2Config,
    GPT2LMHeadModel,
    cross_entropy_loss,
    cross_entropy_positionwise,
    make_seq_parallel_model,
    make_seq_parallel_train_step,
    zigzag_batch,
)


def _mesh(n_seq=4, dp=2):
    devices = np.asarray(jax.devices()[: dp * n_seq]).reshape(dp, n_seq)
    return Mesh(devices, axis_names=("data", "seq"))


def test_seq_parallel_loss_matches_dense():
    mesh = _mesh()
    cfg = GPT2Config.tiny(n_layer=2, dropout=0.0)
    rng = np.random.default_rng(0)
    b, s = 2, 256
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)

    dense = GPT2LMHeadModel(cfg)
    params = dense.init(jax.random.PRNGKey(0), ids)
    ref_loss = float(cross_entropy_loss(dense.apply(params, ids), ids))

    sp = make_seq_parallel_model(cfg, mesh, interpret=True)
    ids_z, labels_z, pos_z = zigzag_batch(ids, n_seq=4)
    spec = NamedSharding(mesh, P("data", "seq"))
    ids_z, labels_z, pos_z = (
        jax.device_put(x, spec) for x in (ids_z, labels_z, pos_z)
    )

    @jax.jit
    def sp_loss(params, ids_z, labels_z, pos_z):
        logits = sp.apply(params, ids_z, positions=pos_z)
        return cross_entropy_positionwise(logits, labels_z)

    got = float(sp_loss(params, ids_z, labels_z, pos_z))
    np.testing.assert_allclose(got, ref_loss, rtol=2e-3)


def test_seq_parallel_window_loss_matches_dense():
    """cfg.window under zigzag ring SP: band masking is on global
    positions, so the SP loss must match the dense windowed model."""
    mesh = _mesh()
    cfg = GPT2Config.tiny(n_layer=2, dropout=0.0, window=48)
    rng = np.random.default_rng(2)
    b, s = 2, 256
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)

    dense = GPT2LMHeadModel(cfg)
    params = dense.init(jax.random.PRNGKey(0), ids)
    ref_loss = float(cross_entropy_loss(dense.apply(params, ids), ids))

    sp = make_seq_parallel_model(cfg, mesh, interpret=True)
    ids_z, labels_z, pos_z = zigzag_batch(ids, n_seq=4)
    spec = NamedSharding(mesh, P("data", "seq"))
    ids_z, labels_z, pos_z = (
        jax.device_put(x, spec) for x in (ids_z, labels_z, pos_z)
    )

    @jax.jit
    def sp_loss(params, ids_z, labels_z, pos_z):
        logits = sp.apply(params, ids_z, positions=pos_z)
        return cross_entropy_positionwise(logits, labels_z)

    got = float(sp_loss(params, ids_z, labels_z, pos_z))
    np.testing.assert_allclose(got, ref_loss, rtol=2e-3)


def test_seq_parallel_train_step_reduces_loss():
    mesh = _mesh()
    cfg = GPT2Config.tiny(n_layer=2, dropout=0.1)
    rng = np.random.default_rng(1)
    b, s = 2, 256
    ids = jnp.asarray(rng.integers(0, 64, (b, s)), jnp.int32)

    sp = make_seq_parallel_model(cfg, mesh, interpret=True)
    ids_z, labels_z, pos_z = zigzag_batch(ids, n_seq=4)
    spec = NamedSharding(mesh, P("data", "seq"))
    batch = {
        "input_ids": jax.device_put(ids_z, spec),
        "labels": jax.device_put(labels_z, spec),
        "positions": jax.device_put(pos_z, spec),
    }
    params = sp.init(jax.random.PRNGKey(0), ids_z)
    optimizer = optax.adamw(3e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(
        make_seq_parallel_train_step(sp, optimizer), donate_argnums=(0, 1)
    )
    losses = []
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] - 0.3, losses
