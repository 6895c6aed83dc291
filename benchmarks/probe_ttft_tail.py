"""Attribute the engine TTFT p99 tail (VERDICT r4 Weak #7).

SERVING.md shows engine-admission p99 jumping to 2-5x p50 (e.g. 263 vs
48 ms at 4 concurrent admissions). Hypotheses: (a) scheduler/queueing
policy, (b) re-JIT events — the engine compiles one program per
(active-rows, prompt-bucket, growth-pattern) shape variant, so a rep
that first hits a new variant pays XLA+Mosaic compile in-line, (c)
ambient tunnel contention.

Method: run the same admission loop as benchmark_decode.py but with 21
reps, log every per-rep time, and wrap each step in a compile counter
(jax.monitoring record_event hook on '/jax/pjit/compile' when available;
fallback: time threshold). If tail reps coincide with compile events,
the tail is (b); if not and tail reps cluster randomly, it is (c);
a constant high tail at higher admission counts would be (a).

Usage (real TPU): python benchmarks/probe_ttft_tail.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from flash_attn_tpu.serving.engine import ServingEngine

# Count XLA compiles via the monitoring API (works on this jax version).
COMPILES = {"n": 0}
try:
    from jax._src import monitoring

    def _on_event(event, **kw):
        if "compile" in event:
            COMPILES["n"] += 1

    monitoring.register_event_listener(_on_event)
    HAVE_MON = True
except Exception:
    HAVE_MON = False


def main():
    cfg = GPT2Config(
        vocab_size=50257, n_layer=12, n_head=12, n_embd=768,
        max_position_embeddings=2048, dtype=jnp.bfloat16,
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    s = 512
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, s)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    page_size, pages_per_seq = 128, 16

    eng = ServingEngine(
        params, cfg, max_batch=8, num_pages=8 * pages_per_seq + 1,
        page_size=page_size, pages_per_seq=pages_per_seq,
    )
    base_prompt = np.asarray(ids[0, : s - 1])
    print(f"compile-counter available: {HAVE_MON}")
    for n_admit in (1, 4):
        # Warm one batch shape.
        for _ in range(n_admit):
            eng.submit(list(base_prompt), max_new_tokens=1)
        eng.step()
        rows = []
        for i in range(21):
            prompts = [
                list((base_prompt + i + j) % cfg.vocab_size)
                for j in range(n_admit)
            ]
            c0 = COMPILES["n"]
            t0 = time.perf_counter()
            for p in prompts:
                eng.submit(p, max_new_tokens=1)
            eng.step()
            dt = (time.perf_counter() - t0) * 1e3
            rows.append((dt, COMPILES["n"] - c0))
        ts = sorted(r[0] for r in rows)
        print(f"\nadmit={n_admit}: p50 {ts[len(ts)//2]:.1f} ms, "
              f"p90 {ts[int(len(ts)*0.9)]:.1f}, max {ts[-1]:.1f}")
        print("  rep times (ms, [c]=compiles that rep): " + " ".join(
            f"{dt:.0f}[{c}]" if c else f"{dt:.0f}" for dt, c in rows))


if __name__ == "__main__":
    main()
