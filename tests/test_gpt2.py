"""GPT-2 flagship model: forward, loss, train step, sharded variant."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.models.gpt2 import (
    GPT2Config,
    GPT2LMHeadModel,
    chunked_lm_loss,
    cross_entropy_loss,
    make_sharded_model,
    make_train_step,
    param_shardings,
)


def _tiny():
    return GPT2Config.tiny(dtype=jnp.float32)


def test_forward_and_loss():
    cfg = _tiny()
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 128)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 128, cfg.vocab_size)
    loss = cross_entropy_loss(logits, ids)
    # random init => loss ~ ln(vocab)
    assert abs(float(loss) - np.log(cfg.vocab_size)) < 0.5


def test_train_step_reduces_loss():
    cfg = _tiny()
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 128)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids}
    params = model.init(jax.random.PRNGKey(0), ids)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(model, opt))
    losses = []
    for i in range(5):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses


def test_sharded_model_matches_unsharded():
    cfg = _tiny()
    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 128)), jnp.int32)

    base = GPT2LMHeadModel(cfg)
    params = base.init(jax.random.PRNGKey(0), ids)
    ref = base.apply(params, ids)

    sharded = make_sharded_model(cfg, mesh)
    p_sh = jax.device_put(params, param_shardings(params, mesh))
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    out = jax.jit(lambda p, x: sharded.apply(p, x))(p_sh, ids_sh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
    )


def test_sharded_model_window_matches_unsharded():
    cfg = GPT2Config.tiny(dtype=jnp.float32, window=32)
    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 128)), jnp.int32)

    base = GPT2LMHeadModel(cfg)
    params = base.init(jax.random.PRNGKey(0), ids)
    ref = base.apply(params, ids)

    sharded = make_sharded_model(cfg, mesh)
    p_sh = jax.device_put(params, param_shardings(params, mesh))
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    out = jax.jit(lambda p, x: sharded.apply(p, x))(p_sh, ids_sh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
    )


def test_chunked_lm_loss_matches_full():
    """chunked_lm_loss streams the LM head + CE over sequence chunks; its
    value AND gradients must match the materialized-logits path (same
    bf16-dot contract), including a chunk that doesn't divide s-1 and
    ignored (-100) labels."""
    cfg = _tiny()
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 96)), jnp.int32)
    labels = ids.at[:, 40:50].set(-100)
    params = model.init(jax.random.PRNGKey(0), ids)

    def full(p):
        return cross_entropy_loss(model.apply(p, ids), labels)

    def chunked(p):
        x, wte = model.apply(p, ids, return_hidden=True)
        return chunked_lm_loss(x, wte, labels, chunk=40, dtype=cfg.dtype)

    l0, g0 = jax.value_and_grad(full)(params)
    l1, g1 = jax.value_and_grad(chunked)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_train_step_chunked_loss_reduces_loss():
    cfg = _tiny()
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(12)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 128)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids}
    params = model.init(jax.random.PRNGKey(0), ids)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(model, opt, lm_loss_chunk=64))
    losses = []
    for i in range(5):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses


def test_remat_matches_no_remat():
    """cfg.remat is a pure memory/flops trade: same params, same logits,
    and a train-step gradient identical up to fp tolerance."""
    import dataclasses

    cfg = _tiny()
    cfg_r = dataclasses.replace(cfg, remat=True)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 128)), jnp.int32)
    base, rem = GPT2LMHeadModel(cfg), GPT2LMHeadModel(cfg_r)
    params = base.init(jax.random.PRNGKey(0), ids)
    assert jax.tree.structure(params) == jax.tree.structure(
        rem.init(jax.random.PRNGKey(0), ids)
    )
    np.testing.assert_allclose(
        np.asarray(rem.apply(params, ids)),
        np.asarray(base.apply(params, ids)),
        atol=1e-5, rtol=1e-5,
    )

    def loss_fn(model):
        def f(p):
            return cross_entropy_loss(model.apply(p, ids), ids)
        return f

    g0 = jax.grad(loss_fn(base))(params)
    g1 = jax.grad(loss_fn(rem))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_remat_policy_matches_full_remat():
    """remat_policy='dots'/'dots_flash' only changes which intermediates
    are SAVED vs recomputed — gradients must match the full-remat step to
    fp tolerance, and unknown names must raise."""
    import dataclasses

    cfg = _tiny()
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 128)), jnp.int32)
    models = {
        name: GPT2LMHeadModel(
            dataclasses.replace(cfg, remat=True, remat_policy=name)
        )
        for name in (None, "dots", "dots_flash")
    }
    params = models[None].init(jax.random.PRNGKey(0), ids)

    def grad_of(model):
        return jax.grad(
            lambda p: cross_entropy_loss(model.apply(p, ids), ids)
        )(params)

    g_full = grad_of(models[None])
    for name in ("dots", "dots_flash"):
        g = grad_of(models[name])
        for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
                err_msg=f"remat_policy={name}",
            )

    import pytest as _pytest
    bad = GPT2LMHeadModel(
        dataclasses.replace(cfg, remat=True, remat_policy="everything")
    )
    with _pytest.raises(ValueError, match="remat_policy"):
        bad.apply(params, ids)
