"""Test helpers: the dual-reference error-bound methodology.

Port of the reference's correctness bar (reference README.md:128-132,
tests/test_flash_attn.py:405-414): the fused kernel's max error against an
fp32 oracle must be at most 2x the error of a plain native-dtype
implementation against the same oracle.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def max_err(a, b) -> float:
    return float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )


def assert_two_x_bound(out, ref_f32, ref_native, *, mult=2.0, atol=1e-5, label=""):
    """assert max|out - ref_f32| <= mult * max|ref_native - ref_f32| + atol.

    ``atol`` floors the bound for fp32 inputs where the baseline error is 0.
    """
    err = max_err(out, ref_f32)
    base = max_err(ref_native, ref_f32)
    assert err <= mult * base + atol, (
        f"{label}: kernel err {err:.3e} > {mult} * baseline {base:.3e} + {atol}"
    )


def random_qkv(rng: np.random.Generator, b, sq, sk, h, d, dtype):
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype=dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype=dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype=dtype)
    return q, k, v
