"""Run the BASELINE.json north-star configs (#2-#5) on the real chip.

  #2 causal + fused dropout, varlen packed batches (cu_seqlens), d=64
  #3 cross-attention with fused rotary, d=128, seqlen 2K
  #4 blocksparse flash attention at seqlen 8K
  #5 GPT-2 decode with FP8 KV cache at long context (single-chip slice of
     the multi-host config; sharding is validated by dryrun_multichip)

(#1 — the fp32 reference path — is the CPU test oracle, exercised by
pytest.) Prints one timing line per config.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.utils import median_time
from flash_attn_tpu.ops.interface import flash_attn_unpadded_qkvpacked_func
from flash_attn_tpu.ops.rotary import RotaryEmbedding
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.blocksparse import blocksparse_attention, build_layout


def config2():
    """Varlen packed causal attention + fused dropout, d=64."""
    rng = np.random.default_rng(0)
    batch, max_s, h, d = 8, 1024, 12, 64
    lens = rng.integers(max_s // 2, max_s + 1, size=batch)
    cu = np.zeros(batch + 1, np.int32)
    cu[1:] = np.cumsum(lens)
    total = int(cu[-1])
    qkv = jnp.asarray(rng.standard_normal((total, 3, h, d)), jnp.bfloat16)
    cu_seqlens = jnp.asarray(cu, jnp.int32)

    def f(qkv):
        return flash_attn_unpadded_qkvpacked_func(
            qkv, cu_seqlens, max_s, 0.1, causal=True, dropout_seed=7
        )[:, None]  # match input rank for the timing chain

    def g(x):  # wrap: output of f is (total, h, d); chain via qkv[:, 0]
        out = flash_attn_unpadded_qkvpacked_func(
            x, cu_seqlens, max_s, 0.1, causal=True, dropout_seed=7
        )
        return x.at[:, 0].set(out)

    t = median_time(jax.jit(g), qkv)
    print(f"#2 varlen causal+dropout (total={total}, d=64): {t*1e3:.2f} ms")


def config3():
    """Cross-attention with fused rotary, d=128, S=2K."""
    rng = np.random.default_rng(0)
    b, sq, sk, h, d = 4, 2048, 2048, 8, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.bfloat16)
    rot = RotaryEmbedding(d)

    def f(q, k, v):
        qr, kr = rot(q, k, seq_dimension=-3)
        return flash_attention(qr, kr, v, causal=False)

    t = median_time(jax.jit(f), q, k, v, iters=5, chain=24)
    fl = 4 * b * h * sq * sk * d
    print(f"#3 cross-attn + rotary (S=2K, d=128): {t*1e3:.2f} ms "
          f"({fl/t/1e12:.1f} TFLOP/s)")


def config4():
    """Blocksparse flash attention at seqlen 8K."""
    rng = np.random.default_rng(0)
    b, s, h, d = 1, 8192, 8, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
               for _ in range(3))
    bm = (rng.random((s // 16, s // 256)) < 0.25).astype(np.int32)
    layout = build_layout(bm, sq=s, sk=s, causal=True)
    f = jax.jit(lambda q, k, v: blocksparse_attention(
        q, k, v, layout, causal=True))
    t = median_time(f, q, k, v)
    density = float(bm.mean())
    fl = 4 * b * h * s * s * d * density * 0.5
    print(f"#4 blocksparse S=8K (density {density:.2f}, causal): "
          f"{t*1e3:.2f} ms ({fl/t/1e12:.1f} TFLOP/s on computed blocks)")


def config5():
    """Long-context FP8-KV decode (single-chip slice of config #5)."""
    from flash_attn_tpu.kernels.decode import paged_decode_attention
    from flash_attn_tpu.serving.cache import init_cache

    rng = np.random.default_rng(0)
    b, h, d, ps = 4, 8, 128, 128
    ctx = 65536
    pages_per_seq = ctx // ps
    num_pages = b * pages_per_seq + 1
    cache = init_cache(h, num_pages, ps, d, quantization="fp8_e4m3")
    k_pages = jax.device_put(jnp.asarray(
        rng.standard_normal((h, num_pages, ps, d)), cache.k_pages.dtype))
    cache = type(cache)(k_pages, k_pages, cache.k_scales, cache.v_scales)
    tbl = jnp.asarray(
        1 + np.arange(b * pages_per_seq).reshape(b, pages_per_seq), jnp.int32)
    lengths = jnp.full((b,), ctx, jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)

    @jax.jit
    def f(q, kp, vp, ks, vs):
        o = paged_decode_attention(q, kp, vp, lengths, tbl,
                                   k_scales=ks, v_scales=vs)
        return q + o.astype(q.dtype) * 1e-3  # chainable

    # cache passed as arguments: closure constants inline into the HLO.
    t = median_time(f, q, cache.k_pages, cache.v_pages,
                    cache.k_scales, cache.v_scales)
    kv_bytes = 2 * b * ctx * h * d  # int8-width payload
    print(f"#5 fp8-KV decode attention @64K context: {t*1e3:.3f} ms/step "
          f"({kv_bytes/t/1e9:.0f} GB/s KV stream)")


if __name__ == "__main__":
    config2()
    config3()
    config4()
    config5()
