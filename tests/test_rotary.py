"""Rotary embedding parity vs the reference torch implementation.

The reference's rotary module (flash_attn/rotary.py) has no CUDA extension
dependency, so we import it directly from /root/reference and compare
numerics — a byte-level behavioral parity check without code sharing.
"""

import importlib.util
import math
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.rotary import (
    RotaryEmbedding,
    RotaryEmbedding2D,
    apply_rotary_at_positions,
    apply_rotary_pos_emb,
    rotary_cos_sin,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_rotary():
    spec = importlib.util.spec_from_file_location(
        "ref_rotary", "/root/reference/flash_attn/rotary.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_rotary"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("seq_dimension", [-2, -3])
@pytest.mark.parametrize("d", [32, 64])
def test_rotary_1d_matches_reference(ref_rotary, seq_dimension, d):
    rng = np.random.default_rng(0)
    b, s, h = 2, 48, 3
    shape = (b, h, s, d) if seq_dimension == -2 else (b, s, h, d)
    q = rng.standard_normal(shape).astype(np.float32)
    k = rng.standard_normal(shape).astype(np.float32)

    rot_t = ref_rotary.RotaryEmbedding(d)
    q_t, k_t = rot_t(torch.from_numpy(q), torch.from_numpy(k), seq_dimension)

    rot_j = RotaryEmbedding(d)
    q_j, k_j = rot_j(jnp.asarray(q), jnp.asarray(k), seq_dimension)

    np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_j), k_t.numpy(), atol=1e-5)


@pytest.mark.parametrize("seq_dimension", [-2, -3])
def test_rotary_2d_matches_reference(ref_rotary, seq_dimension):
    rng = np.random.default_rng(1)
    b, h, d = 2, 2, 32
    s = 49  # 7x7 grid
    shape = (b, h, s, d) if seq_dimension == -2 else (b, s, h, d)
    q = rng.standard_normal(shape).astype(np.float32)
    k = rng.standard_normal(shape).astype(np.float32)

    rot_t = ref_rotary.RotaryEmbedding2D(d)
    q_t, k_t = rot_t(torch.from_numpy(q), torch.from_numpy(k), seq_dimension)

    rot_j = RotaryEmbedding2D(d)
    q_j, k_j = rot_j(jnp.asarray(q), jnp.asarray(k), seq_dimension)

    np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_j), k_t.numpy(), atol=1e-5)


def test_positions_variant_matches_table():
    rng = np.random.default_rng(2)
    s, d = 37, 64
    x = jnp.asarray(rng.standard_normal((2, s, d)), jnp.float32)
    cos, sin = rotary_cos_sin(s, d)
    a = apply_rotary_pos_emb(x, cos, sin, seq_dimension=-2)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (2, s))
    b = apply_rotary_at_positions(x, pos)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # offset positions == slice of a longer table
    cos2, sin2 = rotary_cos_sin(s + 10, d)
    a2 = apply_rotary_pos_emb(
        jnp.pad(x, ((0, 0), (10, 0), (0, 0))), cos2, sin2, seq_dimension=-2
    )[:, 10:]
    b2 = apply_rotary_at_positions(x, pos + 10)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


def test_rotation_preserves_norm_and_inner_products():
    """Rotary is an orthogonal transform: |x| preserved; <q,k> depends only
    on relative position."""
    rng = np.random.default_rng(3)
    s, d = 32, 64
    q = jnp.asarray(rng.standard_normal((1, s, d)), jnp.float32)
    cos, sin = rotary_cos_sin(s, d)
    qr = apply_rotary_pos_emb(q, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q), axis=-1),
        np.linalg.norm(np.asarray(qr), axis=-1),
        rtol=1e-5,
    )
