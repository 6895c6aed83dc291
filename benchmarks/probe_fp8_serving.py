"""Locate the fp8-vs-int8 serving decode gap (device probe).

SERVING.md (after the in-kernel dequant fix) still shows fp8_e4m3 decode
at ~159 ms/step vs int8's ~44 — yet probe_fp8cast2.py proves the
in-kernel cast is ~free. This times each serving component separately at
the GPT-2-small decode shape (b=8, h=12, d=64, page 128, ctx 640):

  1. paged_decode_attention alone (bf16 / int8 / fp8 pages)
  2. cache append_token alone (the per-step quantize + page RMW)
  3. the quantize-to-payload XLA cast alone

Run ON DEVICE: python benchmarks/probe_fp8_serving.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from utils import median_time  # noqa: E402

from flash_attn_tpu.kernels.decode import paged_decode_attention  # noqa: E402
from flash_attn_tpu.serving.cache import append_token, init_cache  # noqa: E402

B, H, D, PAGE, CTX = 8, 12, 64, 128, 640


def bench_kernel(kv_dtype):
    rng = np.random.default_rng(0)
    pages_per_seq = CTX // PAGE
    num_pages = B * pages_per_seq + 1
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    kf = rng.standard_normal((H, num_pages, PAGE, D))
    vf = rng.standard_normal((H, num_pages, PAGE, D))
    quant = kv_dtype != jnp.bfloat16
    if kv_dtype == jnp.int8:
        k_pages = jnp.asarray(kf * 20, jnp.int8)
        v_pages = jnp.asarray(vf * 20, jnp.int8)
    else:
        k_pages = jnp.asarray(kf, jnp.float32).astype(kv_dtype)
        v_pages = jnp.asarray(vf, jnp.float32).astype(kv_dtype)
    scales = (
        jnp.asarray(rng.standard_normal((H, num_pages, 1, PAGE)) * 0.01 + 0.05,
                    jnp.float32)
        if quant else None
    )
    lengths = jnp.full((B,), CTX, jnp.int32)
    table = jnp.arange(B * pages_per_seq, dtype=jnp.int32).reshape(
        B, pages_per_seq)

    def f(q):
        o = paged_decode_attention(
            q, k_pages, v_pages, lengths, table,
            k_scales=scales, v_scales=scales,
        )
        return o.astype(jnp.bfloat16)

    t = median_time(f, q)
    print(f"decode kernel {jnp.dtype(kv_dtype).name:14s}: {t*1e6:9.1f} us",
          flush=True)


def bench_append(quantization):
    pages_per_seq = CTX // PAGE + 1
    cache = init_cache(
        H, B * pages_per_seq + 1, PAGE, D,
        dtype=jnp.bfloat16, quantization=quantization,
    )
    rng = np.random.default_rng(1)
    k_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    table = (1 + jnp.arange(B * pages_per_seq, dtype=jnp.int32)).reshape(
        B, pages_per_seq)
    lengths = jnp.full((B,), CTX, jnp.int32)

    def g(k_new):
        st = append_token(cache, k_new, k_new, table, lengths)
        return k_new + st.k_pages[0, 0, 0, :D].astype(jnp.bfloat16) * 0

    t = median_time(g, k_new)
    print(f"append_token  {quantization or 'bf16':14s}: {t*1e6:9.1f} us",
          flush=True)


def bench_cast(dtype):
    x = jnp.ones((B, H, D), jnp.float32)

    def f(x):
        return x + x.astype(dtype).astype(jnp.float32) * 0.5

    t = median_time(f, x)
    print(f"XLA cast      {jnp.dtype(dtype).name:14s}: {t*1e6:9.1f} us",
          flush=True)


def main():
    for dt in (jnp.bfloat16, jnp.int8, jnp.float8_e4m3fn):
        bench_kernel(dt)
    for qz in (None, "int8", "fp8_e4m3"):
        try:
            bench_append(qz)
        except Exception as e:  # noqa: BLE001
            print(f"append_token  {qz}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    for dt in (jnp.int8, jnp.float8_e4m3fn):
        bench_cast(dt)


if __name__ == "__main__":
    main()
