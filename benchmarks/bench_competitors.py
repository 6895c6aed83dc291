"""Benchmark jax's built-in pallas flash/splash attention on the same shape
as bench.py, as a competitive reference for our kernel."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.bench_dev import B, S, H, D, median_time, make_inputs, report


def main():
    q, k, v = make_inputs()  # (B, H, S, D)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_flash, BlockSizes as JaxBlockSizes,
    )

    bs = JaxBlockSizes(
        block_q=512, block_k_major=1024, block_k=1024, block_b=1,
        block_q_major_dkv=512, block_k_major_dkv=512,
        block_q_dkv=512, block_k_dkv=512,
        block_q_dq=512, block_k_dq=512, block_k_major_dq=512,
    )
    f = jax.jit(functools.partial(
        jax_flash, causal=True, sm_scale=D ** -0.5, block_sizes=bs))
    t = median_time(f, q, k, v)
    report("jax builtin flash causal (512/1024)", t, causal=True)

    f = jax.jit(functools.partial(jax_flash, causal=True, sm_scale=D ** -0.5))
    t = median_time(f, q, k, v)
    report("jax builtin flash causal (default bs)", t, causal=True)

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.MultiHeadMask(
            [sm.CausalMask((S, S)) for _ in range(H)]
        )
        kernel = sk.make_splash_mha_single_device(mask=mask)

        def splash(q, k, v):
            return jax.vmap(kernel)(q * (D ** -0.5), k, v)

        f = jax.jit(splash)
        t = median_time(f, q, k, v)
        report("jax splash attention causal", t, causal=True)
    except Exception as e:
        print(f"splash failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
