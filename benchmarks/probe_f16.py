"""Re-probe Mosaic float16 kernel lowering and pin the claim (VERDICT #8).

CLAUDE.md records "fp16 runs via f32 upcast (Mosaic won't lower f16
kernels on this stack)". This probe makes that claim re-checkable every
round: it attempts to compile and run three minimal Pallas TPU kernels
with float16 operands —

  1. elementwise (add + exp) on f16 tiles
  2. an MXU dot with f16 inputs / f32 accumulator (the flash QK^T shape)
  3. a flash-like tile: f16 dot -> exp2 softmax math -> f16 PV dot

— and writes F16PROBE.md with, per kernel, either "LOWERED + ran
(numerics vs f32)" or the first lines of the Mosaic error transcript.
If any kernel lowers and runs, the upcast fallback in ops/attention.py
should be revisited (a native f16 path would halve the Q/K/V/O memory
envelope — the reference is fp16-primary,
/root/reference/csrc/flash_attn/fmha_api.cpp:136-137).

Usage: python benchmarks/probe_f16.py   (real TPU; ~1 min)
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ew_kernel(x_ref, o_ref):
    o_ref[...] = jnp.exp(x_ref[...] + x_ref[...])


def _dot_kernel(q_ref, k_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = s.astype(jnp.float16)


def _flashlike_kernel(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2((s - m) * jnp.float32(1.4426950408889634))
    l = jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(jnp.float16), v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = (pv / l).astype(jnp.float16)


def _try(name, kernel, args, out_shape, ref_fn):
    spec = lambda x: pl.BlockSpec(x.shape, lambda: tuple([0] * x.ndim),
                                  memory_space=pltpu.VMEM)
    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[spec(a) for a in args],
            out_specs=pl.BlockSpec(
                out_shape.shape, lambda: tuple([0] * len(out_shape.shape)),
                memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )
        out = np.asarray(jax.jit(f)(*args))
        ref = np.asarray(ref_fn(*args))
        err = float(np.max(np.abs(out.astype(np.float32)
                                  - ref.astype(np.float32))))
        return f"**LOWERED + ran.** max |err| vs f32 reference: {err:.3e}"
    except Exception:
        tb = traceback.format_exc().strip().splitlines()
        # Keep the exception type + the first informative Mosaic lines.
        head = [ln for ln in tb if ln][-12:]
        return "FAILED to lower/run:\n\n```\n" + "\n".join(head) + "\n```"


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 256)), jnp.float16)
    q = jnp.asarray(rng.standard_normal((256, 128)), jnp.float16)
    k = jnp.asarray(rng.standard_normal((256, 128)), jnp.float16)
    v = jnp.asarray(rng.standard_normal((256, 128)), jnp.float16)

    results = {
        "elementwise f16 (add+exp)": _try(
            "ew", _ew_kernel, [x],
            jax.ShapeDtypeStruct((256, 256), jnp.float16),
            lambda x: jnp.exp(x.astype(jnp.float32) * 2)),
        "f16 MXU dot (f32 acc)": _try(
            "dot", _dot_kernel, [q, k],
            jax.ShapeDtypeStruct((256, 256), jnp.float16),
            lambda q, k: (q.astype(jnp.float32)
                          @ k.astype(jnp.float32).T).astype(jnp.float16)),
        "flash-like f16 tile (dot->softmax->PV)": _try(
            "flash", _flashlike_kernel, [q, k, v],
            jax.ShapeDtypeStruct((256, 128), jnp.float16),
            lambda q, k, v: jax.nn.softmax(
                (q.astype(jnp.float32) @ k.astype(jnp.float32).T), axis=-1
            ) @ v.astype(jnp.float32)),
    }

    lines = [
        "# F16PROBE — Mosaic float16 kernel lowering status",
        "",
        f"Device: {dev.device_kind}; jax {jax.__version__}; "
        f"jaxlib {jax.lib.__version__ if hasattr(jax.lib, '__version__') else 'n/a'}.",
        "",
        "Re-run each round: `python benchmarks/probe_f16.py`. If any row",
        "flips to LOWERED, revisit the f32-upcast fallback in",
        "ops/attention.py (fp16 envelope — reference",
        "csrc/flash_attn/fmha_api.cpp:136-137).",
        "",
    ]
    for name, res in results.items():
        lines += [f"## {name}", "", res, ""]
    md = "\n".join(lines)
    out_path = os.path.join(os.path.dirname(__file__), "..", "F16PROBE.md")
    with open(out_path, "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
