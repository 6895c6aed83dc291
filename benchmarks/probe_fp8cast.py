"""Isolate the fp8->bf16 dequant cost inside a Pallas kernel (device probe).

SERVING.md measured fp8_e4m3 decode at 257 ms/step vs int8's 54 ms/step on
the same kernel — the only code difference is the `astype(jnp.bfloat16)`
on the fetched KV tile. This probe times a minimal decode-shaped kernel
(s = q.k^T, o = p.v, both k and v cast from the storage dtype) with the
tile resident in VMEM (same block each grid step, refetch elided), so the
measured delta is pure cast/compute cost:

  int8    : x.astype(bf16)                      (the fast baseline)
  bf16    : no cast
  fp8     : x.astype(bf16)                      (the suspect)
  fp8_f32 : x.astype(f32).astype(bf16)
  fp8_bits: integer shift-add decode via pltpu.bitcast
            (e4m3fn magnitude<<4 + (120<<7), denormals via arithmetic)

Run ON DEVICE: python benchmarks/probe_fp8cast.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "benchmarks")
from utils import median_time  # noqa: E402

H, G, BK, D = 16, 8, 1024, 128
STEPS = 64


def fp8_bits_to_bf16(x):
    """e4m3fn -> bf16 via integer ops (no hardware fp8 convert).

    normal:   bf16_bits = sign<<15 | ((mag<<4) + (120<<7))
    denormal (e==0): value = sign * m * 2^-9, computed arithmetically.
    (e4m3fn has no inf; NaN = 0x7F/0xFF maps to a finite 480*2 here —
    acceptable for a KV cache, which never stores NaN.)
    """
    u = pltpu.bitcast(x, jnp.uint8).astype(jnp.int32)
    mag = u & 0x7F
    sign = (u >> 7) & 1
    norm_bits = (sign << 15) | ((mag << 4) + (120 << 7))
    norm = pltpu.bitcast(norm_bits.astype(jnp.uint16), jnp.bfloat16)
    is_denorm = mag < 8
    denorm = (
        mag.astype(jnp.float32)
        * jnp.where(sign == 1, -1.0, 1.0)
        * jnp.float32(2.0**-9)
    ).astype(jnp.bfloat16)
    return jnp.where(is_denorm, denorm, norm)


def _cast(x, mode):
    if mode == "none":
        return x
    if mode == "astype":
        return x.astype(jnp.bfloat16)
    if mode == "f32":
        return x.astype(jnp.float32).astype(jnp.bfloat16)
    if mode == "bits":
        return fp8_bits_to_bf16(x)
    raise ValueError(mode)


def kern(q_ref, x_ref, o_ref, *, mode):
    k = _cast(x_ref[...], mode)  # (H, BK, D)
    q = q_ref[...].astype(jnp.bfloat16)  # (H, G, D)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, G, BK)
    p = s.astype(jnp.bfloat16)
    v = _cast(x_ref[...], mode)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
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
    print(f"{name:14s} {mode:7s}: {per_step_us:8.2f} us/tile", flush=True)
    return per_step_us


def main():
    # correctness of the bits path first: exact comparison vs XLA's cast
    xf = jax.random.normal(jax.random.key(2), (8, 256, 128), jnp.float32)
    x8 = xf.astype(jnp.float8_e4m3fn)
    want = x8.astype(jnp.bfloat16)
    got = pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., fp8_bits_to_bf16(x_ref[...])
        ),
        out_shape=jax.ShapeDtypeStruct(x8.shape, jnp.bfloat16),
    )(x8)
    print("bits-decode exact match vs XLA cast:",
          bool(jnp.all(got == want)), flush=True)

    run(jnp.bfloat16, "none")
    run(jnp.int8, "astype")
    run(jnp.float8_e4m3fn, "astype")
    run(jnp.float8_e4m3fn, "f32")
    run(jnp.float8_e4m3fn, "bits")


if __name__ == "__main__":
    main()
