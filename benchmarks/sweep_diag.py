"""One-off sweep: causal prod kernel with the diagonal-block specialization."""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_dev import (B, H, S, D, make_inputs, median_time, report, flash,
                       run_matmul_only)
from flash_attn_tpu.kernels.block_sizes import BlockSizes
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

q, k, v = make_inputs()

# Ceiling: pure matmul pipeline, same grid/blocking.
t = median_time(jax.jit(functools.partial(run_matmul_only, bq=1024, bk=1024)),
                q, k, v)
report("matmul-only bq=1024 bk=1024 (dense)", t, False)

bs = BlockSizes(block_q=1024, block_k=1024, q_chains=4)
t = median_time(jax.jit(functools.partial(flash, causal=False, bs=bs)), q, k, v)
report("prod dense 1024/1024/4", t, False)
t = median_time(jax.jit(functools.partial(flash, causal=True, bs=bs)), q, k, v)
report("prod causal+diag 1024/1024/4", t, True)

# Diagonal-block rate in isolation: S=1024 -> every block is diagonal.
S1 = 1024
rng = np.random.default_rng(1)
q1 = jnp.asarray(rng.standard_normal((B, H, S1, D)), jnp.bfloat16)
k1 = jnp.asarray(rng.standard_normal((B, H, S1, D)), jnp.bfloat16)
v1 = jnp.asarray(rng.standard_normal((B, H, S1, D)), jnp.bfloat16)


def flash1(q, k, v, causal, bs):
    out, _ = flash_attention_fwd(
        q, k, v, None, None, None, None, None,
        sq=S1, sk=S1, causal=causal, softmax_scale=D ** -0.5,
        block_sizes=bs, save_lse=False)
    return out


def report1(name, t, causal):
    frac = 0.5 if causal else 1.0
    fl = 4 * B * H * S1 * S1 * D * frac
    print(f"{name:42s} {t*1e3:8.2f} ms  {fl/t/1e12:7.2f} TFLOP/s")


t = median_time(jax.jit(functools.partial(flash1, causal=True, bs=bs)),
                q1, k1, v1, chain=24)
report1("diag-only (S=1024, 1 block) causal", t, True)
t = median_time(jax.jit(functools.partial(flash1, causal=False, bs=bs)),
                q1, k1, v1, chain=24)
report1("single-block dense (S=1024)", t, False)
