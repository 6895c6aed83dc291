"""Second fp8-dequant probe at the GPT-2 decode shape (d=64, f32 compute).

probe_fp8cast.py showed the integer bits-decode beats Mosaic's fp8
`astype` 6x at d=128/bf16. The serving benchmark (GPT-2, d=64, BlockSpec
decode path, f32 compute) still shows fp8 3.6x slower than int8 after
that fix — this probe isolates the per-variant cast cost at that exact
tile shape:

  int8_f32    : x.astype(f32)                       (the fast baseline)
  deq_bf16f32 : dequant_cast(x, f32)  (bits->bf16->f32, current kernel)
  bits_f32    : direct-to-f32 bits decode (uint32 shift-add, no 16-bit
                intermediates)
  resh_bits   : reshape (h, bk, 64) -> (h, bk/2, 128) then bits_f32
                (full-lane rows for the 8-bit source)

Run ON DEVICE: python benchmarks/probe_fp8cast2.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(__file__))
from utils import median_time  # noqa: E402

from flash_attn_tpu.kernels.common import dequant_cast  # noqa: E402

H, G, BK, D = 12, 1, 512, 64
STEPS = 64


def fp8_bits_to_f32(x, mbits=3, bias=7):
    u = x if x.dtype == jnp.uint8 else pltpu.bitcast(x, jnp.uint8)
    u = u.astype(jnp.int32)
    mag = u & 0x7F
    sign = (u >> 7) & 1
    norm_bits = (sign << 31) | ((mag << (23 - mbits)) + ((127 - bias) << 23))
    norm = pltpu.bitcast(norm_bits, jnp.float32)
    denorm = (
        mag.astype(jnp.float32)
        * jnp.where(sign == 1, -1.0, 1.0)
        * jnp.float32(2.0 ** (1 - bias - mbits))
    )
    return jnp.where(mag < (1 << mbits), denorm, norm)


def _cast(x, mode):
    if mode in ("int8_f32", "astype_f32"):
        return x.astype(jnp.float32)
    if mode == "deq_bf16f32":
        return dequant_cast(x, jnp.float32)
    if mode == "bits_f32":
        return fp8_bits_to_f32(x)
    if mode == "resh_bits":
        h, bk, d = x.shape
        u = pltpu.bitcast(x, jnp.uint8)  # Mosaic can't reshape fp8 vectors
        y = fp8_bits_to_f32(u.reshape(h, bk * d // 128, 128))
        return y.reshape(h, bk, d)
    raise ValueError(mode)


def kern(q_ref, x_ref, o_ref, *, mode):
    k = _cast(x_ref[...], mode)  # (H, BK, D) f32
    q = q_ref[...].astype(jnp.float32)  # (H, G, D)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, G, BK)
    v = _cast(x_ref[...], mode)
    o = jax.lax.dot_general(
        s, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, G, D)
    o_ref[...] = o.astype(o_ref.dtype)


def run(dtype, mode):
    name = jnp.dtype(dtype).name
    key = jax.random.key(0)
    xf = jax.random.normal(key, (H, BK, D), jnp.float32)
    x = (xf * 16).astype(jnp.int8) if dtype == jnp.int8 else xf.astype(dtype)
    q = jax.random.normal(jax.random.key(1), (H, G, D), jnp.bfloat16)

    f = pl.pallas_call(
        functools.partial(kern, mode=mode),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((H, G, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((H, BK, D), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((H, G, D), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((H, G, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    t = median_time(lambda qq: f(qq, x), q)
    per_step_us = t / STEPS * 1e6
    print(f"{name:14s} {mode:11s}: {per_step_us:8.2f} us/tile", flush=True)
    return per_step_us


def main():
    # exactness of the f32 bits decode vs XLA's cast
    xf = jax.random.normal(jax.random.key(2), (8, 256, 128), jnp.float32)
    x8 = xf.astype(jnp.float8_e4m3fn)
    want = x8.astype(jnp.float32)
    got = pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., fp8_bits_to_f32(x_ref[...])
        ),
        out_shape=jax.ShapeDtypeStruct(x8.shape, jnp.float32),
    )(x8)
    print("bits_f32 exact vs XLA cast:", bool(jnp.all(got == want)),
          flush=True)

    run(jnp.int8, "int8_f32")
    run(jnp.bfloat16, "astype_f32")
    run(jnp.float8_e4m3fn, "astype_f32")
    run(jnp.float8_e4m3fn, "deq_bf16f32")
    run(jnp.float8_e4m3fn, "bits_f32")
    # resh_bits removed: Mosaic cannot reshape 8-bit vectors on this stack


if __name__ == "__main__":
    main()
