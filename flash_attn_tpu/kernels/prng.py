"""Counter-based dropout RNG, keyed on *global element coordinates*.

The reference reproduces its dropout mask in the backward pass by replaying
a Philox stream seeded per CUDA thread (reference:
csrc/flash_attn/src/philox.cuh, fmha_fprop_kernel_1xN.h:696-702, and the
torch RNG-state save/restore in flash_attn/flash_attn_interface.py:43-63).
That couples the mask to the kernel's thread/block layout.

The TPU-native design removes the coupling entirely: the keep/drop decision
for attention-matrix element (b, h, i, j) is a pure integer hash of
(seed, b*h, i, j). Any kernel — forward, dKV, dQ, blocksparse, or a plain
jnp test oracle — regenerates the identical mask regardless of tiling,
grid order, or device count. No RNG state is saved in residuals except the
integer seed.

The mixer is the 32-bit "lowbias32" finalizer (xorshift-multiply, full
avalanche); drop iff hash < floor(p * 2^32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Python ints (not jnp arrays): inside a Pallas kernel trace, module-level
# device arrays would be rejected as captured constants.
_C0 = 0x9E3779B1  # golden-ratio odd constants for input mixing
_C1 = 0x85EBCA77
_C2 = 0xC2B2AE3D
_M0 = 0x7FEB352D  # lowbias32 multipliers
_M1 = 0x846CA68B


def _mix32(x: jax.Array) -> jax.Array:
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(_M0)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(15))
    x = x * jnp.uint32(_M1)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x


def hash_coords(seed: jax.Array, bh: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """uint32 hash of (seed, batch*head index, row, col); broadcasts.

    Deliberately *separable*: everything that depends only on the row
    (including one full mixing round) is computed first, so kernels can
    pass rows as a (bq, 1) column and cols as a (1, bk) row — the
    row-hash then costs vector work and only the final round runs at
    full-tile width (~9 elementwise ops/element instead of ~22)."""
    seed = seed.astype(jnp.uint32)
    bh = bh.astype(jnp.uint32)
    rh = _mix32(
        rows.astype(jnp.uint32) * jnp.uint32(_C0)
        ^ bh * jnp.uint32(_C2)
        ^ seed
    )
    return _mix32(rh ^ cols.astype(jnp.uint32) * jnp.uint32(_C1))


def dropout_threshold(p_drop: float) -> jnp.uint32:
    """uint32 threshold: drop iff hash < threshold."""
    return jnp.uint32(min(int(p_drop * 4294967296.0), 0xFFFFFFFF))


def keep_mask(
    seed: jax.Array,
    bh: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    p_drop: float,
) -> jax.Array:
    """Boolean mask, True = keep. Shapes broadcast (rows x cols)."""
    return hash_coords(seed, bh, rows, cols) >= dropout_threshold(p_drop)


def dropout_mask_dense(
    seed: jax.Array, batch: int, heads: int, sq: int, sk: int, p_drop: float
) -> jax.Array:
    """Materialize the full (batch, heads, sq, sk) keep-mask.

    Test/debug utility — bit-identical to what the kernels generate in tiles
    (the TPU replacement for the reference's S_dmask sign-bit round-trip,
    tests/test_flash_attn.py:218-262).
    """
    bh = (
        jnp.arange(batch * heads, dtype=jnp.uint32).reshape(batch, heads, 1, 1)
    )
    rows = jnp.arange(sq, dtype=jnp.uint32).reshape(1, 1, sq, 1)
    cols = jnp.arange(sk, dtype=jnp.uint32).reshape(1, 1, 1, sk)
    return keep_mask(seed, bh, rows, cols, p_drop)
