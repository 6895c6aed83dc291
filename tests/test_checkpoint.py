"""Checkpoint/resume (utils/checkpoint.py): an interrupted-and-resumed
training run must continue bit-identically with an uninterrupted one.

The reference has no checkpoint subsystem (SURVEY.md §5) — this is new
TPU-production scope, so the oracle is self-consistency: same data, same
seeds, save at step k, restore into a fresh process-like state, and the
final params must match exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from flash_attn_tpu.models.gpt2 import (
    GPT2Config, GPT2LMHeadModel, make_train_step,
)
from flash_attn_tpu.utils.checkpoint import TrainCheckpointer


def _setup():
    cfg = GPT2Config.tiny(n_layer=1, dtype=jnp.float32)
    model = GPT2LMHeadModel(cfg)
    opt = optax.adamw(1e-3)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (2, 64)), jnp.int32
    )
    batch = {"input_ids": ids, "labels": ids}
    step_fn = jax.jit(make_train_step(model, opt))

    def init():
        params = model.init(jax.random.PRNGKey(0), ids)
        return params, opt.init(params)

    return init, step_fn, batch


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_matches_uninterrupted(tmp_path):
    init, step_fn, batch = _setup()
    key = jax.random.PRNGKey(1)

    # Uninterrupted: 4 steps straight through.
    params, opt_state = init()
    for _ in range(4):
        params, opt_state, _ = step_fn(params, opt_state, batch, key)
    want = params

    # Interrupted: 2 steps, checkpoint, "crash", resume, 2 more.
    ckptdir = str(tmp_path / "run")
    with TrainCheckpointer(ckptdir, async_save=False) as ckpt:
        step, params, opt_state = ckpt.resume_or_init(init)
        assert step == 0
        for i in range(2):
            params, opt_state, _ = step_fn(params, opt_state, batch, key)
        ckpt.save(2, params, opt_state)

    with TrainCheckpointer(ckptdir, async_save=False) as ckpt:
        step, params, opt_state = ckpt.resume_or_init(init)
        assert step == 2
        for _ in range(step, 4):
            params, opt_state, _ = step_fn(params, opt_state, batch, key)

    _tree_equal(params, want)


def test_opt_state_structure_roundtrip(tmp_path):
    """optax's NamedTuple opt-state must restore with its exact structure
    (the template path), not as nested dicts."""
    init, step_fn, batch = _setup()
    params, opt_state = init()
    params, opt_state, _ = step_fn(
        params, opt_state, batch, jax.random.PRNGKey(2)
    )
    with TrainCheckpointer(str(tmp_path / "r"), async_save=False) as ckpt:
        ckpt.save(1, params, opt_state, rng_key=jax.random.PRNGKey(7))
        step, p2, o2, extra = ckpt.restore(
            params, opt_state, rng_key=jax.random.PRNGKey(0)
        )
    assert step == 1
    assert jax.tree_util.tree_structure(o2) == jax.tree_util.tree_structure(
        opt_state
    )
    _tree_equal(p2, params)
    _tree_equal(o2, opt_state)
    np.testing.assert_array_equal(
        np.asarray(extra["rng_key"]), np.asarray(jax.random.PRNGKey(7))
    )


def test_max_to_keep_and_latest(tmp_path):
    init, step_fn, batch = _setup()
    params, opt_state = init()
    with TrainCheckpointer(
        str(tmp_path / "k"), max_to_keep=2, async_save=False
    ) as ckpt:
        for s in (1, 2, 3):
            ckpt.save(s, params, opt_state)
        ckpt.wait()
        assert ckpt.latest_step() == 3
        assert list(ckpt.all_steps()) == [2, 3]


def test_sharded_roundtrip(tmp_path):
    """Sharded train state (virtual 8-device mesh): save/restore must
    preserve values AND shardings — the multi-host pjit contract."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(
        np.asarray(jax.devices()).reshape(2, 4), ("data", "model")
    )
    sh = NamedSharding(mesh, P(None, "model"))
    repl = NamedSharding(mesh, P())
    params = {
        "w": jax.device_put(
            jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16), sh
        ),
        "b": jax.device_put(jnp.ones((16,), jnp.float32), repl),
    }
    opt_state = {"m": jax.device_put(jnp.zeros((8, 16)), sh)}
    with TrainCheckpointer(str(tmp_path / "s"), async_save=False) as ckpt:
        ckpt.save(5, params, opt_state)
        step, p2, o2, _ = ckpt.restore(params, opt_state)
    assert step == 5
    _tree_equal(p2, params)
    _tree_equal(o2, opt_state)
    assert p2["w"].sharding.is_equivalent_to(sh, 2)
    assert o2["m"].sharding.is_equivalent_to(sh, 2)


def test_restore_missing_raises(tmp_path):
    init, _, _ = _setup()
    params, opt_state = init()
    with TrainCheckpointer(str(tmp_path / "empty")) as ckpt:
        with pytest.raises(FileNotFoundError):
            ckpt.restore(params, opt_state)
