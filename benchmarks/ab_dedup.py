"""Interleaved device A/B: decode kernels before vs after the shared
per-block helper dedup (kernels/common.py paged_block_softmax et al).

The dedup is a pure refactor of the MEASURED serving path
(VERDICT r3 #7 requires the A/B before it ships): variant A is the
pre-refactor kernels/decode.py loaded from git as a standalone module;
variant B is the current one. Same process, round-robin, chained
timing — the only drift-immune comparison on the tunneled chip.

Usage: python benchmarks/ab_dedup.py [<git-rev>] (default: the last
committed decode.py)
"""

import functools
import importlib.util
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def load_old_decode(rev):
    src = subprocess.check_output(
        ["git", "show", f"{rev}:flash_attn_tpu/kernels/decode.py"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    with tempfile.NamedTemporaryFile(
        "wb", suffix="_decode_old.py", delete=False
    ) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("decode_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def chain_time(f, args, vary=0, chain=64, iters=7):
    def chained(n):
        @jax.jit
        def g(*a):
            a = list(a)
            for _ in range(n):
                a[vary] = f(*a)
            return jnp.sum(a[vary][..., :1, :1].astype(jnp.float32))

        return g

    g1, gN = chained(1), chained(chain + 1)
    np.asarray(g1(*args))
    np.asarray(gN(*args))

    def once(i):
        a = list(args)
        a[vary] = a[vary] * (1.25 + 0.5 * i)
        t0 = time.perf_counter()
        np.asarray(g1(*a))
        t1 = time.perf_counter()
        np.asarray(gN(*a))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / chain

    return once


def main():
    rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    old = load_old_decode(rev)
    from flash_attn_tpu.kernels import decode as new

    rng = np.random.default_rng(0)
    n_kv, d, page_size = 16, 128, 128
    context, batch = 8192, 8
    pages_per_seq = context // page_size
    num_pages = batch * pages_per_seq + 1
    k_pages = jnp.asarray(
        rng.standard_normal((n_kv, num_pages, page_size, d)), jnp.bfloat16)
    v_pages = jnp.asarray(
        rng.standard_normal((n_kv, num_pages, page_size, d)), jnp.bfloat16)
    table = jnp.asarray(
        1 + np.arange(batch * pages_per_seq).reshape(batch, pages_per_seq),
        jnp.int32)
    lengths = jnp.full((batch,), context, jnp.int32)
    q = jnp.asarray(rng.standard_normal((batch, n_kv, d)), jnp.bfloat16)

    scenarios = [
        ("full", {}),
        ("window+sinks", dict(window_left=2048, num_sinks=16)),
    ]
    for name, kw in scenarios:
        fa = jax.jit(functools.partial(old.paged_decode_attention, **kw))
        fb = jax.jit(functools.partial(new.paged_decode_attention, **kw))
        # Equivalence first (bitwise: identical math, identical schedule).
        oa = np.asarray(fa(q, k_pages, v_pages, lengths, table))
        ob = np.asarray(fb(q, k_pages, v_pages, lengths, table))
        bit = np.array_equal(oa, ob)
        args = (q, k_pages, v_pages, lengths, table)
        ta = chain_time(lambda q, *r: fa(q, *r), args)
        tb = chain_time(lambda q, *r: fb(q, *r), args)
        ras, rbs = [], []
        for i in range(8):  # round-robin: A, B, A, B ... same window
            ras.append(ta(i))
            rbs.append(tb(i))
        ma = sorted(ras)[len(ras) // 2]
        mb = sorted(rbs)[len(rbs) // 2]
        print(
            f"{name}: old {ma * 1e6:7.1f} us  new {mb * 1e6:7.1f} us  "
            f"ratio new/old {mb / ma:.3f}  bitwise_equal={bit}",
            flush=True,
        )


if __name__ == "__main__":
    main()
