"""Probe which lane<->sublane relayout tricks Mosaic accepts on this chip."""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kernel, in_shape, out_shape):
    try:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(in_shape),
                        jnp.float32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        out = np.asarray(out)
        print(f"{name}: OK, out[:2,:3] = {out[:2, :3].tolist()}")
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return None


# 1. pack: (1024,128) lane-replicated -> (8,128) via eye-masked reduction
def pack_eye(x_ref, o_ref):
    eye = jnp.eye(128, dtype=jnp.float32)
    rows = []
    for i in range(8):
        chunk = x_ref[i * 128:(i + 1) * 128, :]
        rows.append(jnp.sum(chunk * eye, axis=0, keepdims=True))
    o_ref[...] = jnp.concatenate(rows, axis=0)


# 2. expand: (8,128) packed -> (1024,128) lane-replicated via bcast+MXU dot
def expand_dot(x_ref, o_ref):
    eye = jnp.eye(128, dtype=jnp.float32)
    for i in range(8):
        row = x_ref[i:i + 1, :]  # (1,128)
        bc = jnp.broadcast_to(row, (128, 128))
        col = jax.lax.dot_general(
            bc, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[i * 128:(i + 1) * 128, :] = col


# 3. expand via jnp.transpose
def expand_T(x_ref, o_ref):
    for i in range(8):
        row = x_ref[i:i + 1, :]
        bc = jnp.broadcast_to(row, (128, 128))
        o_ref[i * 128:(i + 1) * 128, :] = bc.T


# 4. pack via reshape
def pack_reshape(x_ref, o_ref):
    o_ref[...] = x_ref[:, 0].reshape(8, 128)


rng = np.random.default_rng(0)
vals = rng.standard_normal(1024).astype(np.float32)
rep = np.broadcast_to(vals[:, None], (1024, 128)).copy()

out = probe("pack_eye", pack_eye, (1024, 128), (8, 128))
if out is not None:
    ok = np.allclose(out.reshape(-1), vals)
    print("  pack_eye correct:", ok)
packed = vals.reshape(8, 128)
out = probe("expand_dot", expand_dot, (8, 128), (1024, 128))
if out is not None:
    print("  expand_dot correct:", np.allclose(out, rep))
out = probe("expand_T", expand_T, (8, 128), (1024, 128))
if out is not None:
    print("  expand_T correct:", np.allclose(out, rep))
out = probe("pack_reshape", pack_reshape, (1024, 128), (8, 128))
if out is not None:
    print("  pack_reshape correct:", np.allclose(out.reshape(-1), vals))
