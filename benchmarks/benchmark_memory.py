"""Peak-HBM comparison: fused flash attention vs XLA (naive) attention.

The reference's second headline is the memory saving — 10x @ S=2K, 20x @
S=4K, linear-vs-quadratic (reference README.md:86-92). This driver
measures the TPU analog from XLA's compile-time memory plan
(``benchmark_memory``: argument/output/temp bytes — the plan is exact for
a static-shape XLA program) and writes MEMORY.md.

Run: python benchmarks/benchmark_memory.py        (real TPU; compile-only,
nothing is executed, so the quadratic cases that exceed HBM still report)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from utils import benchmark_memory

from flash_attn_tpu import flash_attention

B, H, D = 8, 12, 64  # reference memory-graph config (README.md:86-92)
GIB = 1024**3


def naive_attention(q, k, v, causal):
    # XLA "standard attention": materializes the (b,h,sq,sk) score and
    # probability tensors — the reference's PyTorch baseline
    # (benchmarks/benchmark_flash_attention.py:14-36).
    qb = jnp.transpose(q, (0, 2, 1, 3))
    kb = jnp.transpose(k, (0, 2, 1, 3))
    vb = jnp.transpose(v, (0, 2, 1, 3))
    s = jnp.einsum("bhqd,bhkd->bhqk", qb, kb) * (D**-0.5)
    if causal:
        mask = jnp.tril(jnp.ones(s.shape[-2:], bool))
        s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vb)
    return jnp.transpose(o, (0, 2, 1, 3))


def measure(s, causal):
    q = jnp.zeros((B, s, H, D), jnp.bfloat16)
    k = jnp.zeros_like(q)
    v = jnp.zeros_like(q)
    g = jnp.zeros_like(q)

    rows = {}
    for name, fn in (
        ("flash", lambda q, k, v: flash_attention(q, k, v, causal=causal)),
        ("naive", lambda q, k, v: naive_attention(q, k, v, causal)),
    ):
        def loss(q, k, v):
            return jnp.sum((fn(q, k, v) * g).astype(jnp.float32))

        try:
            fwd = benchmark_memory(fn, q, k, v, verbose=False)
        except Exception:
            # This backend's AOT compile refuses any single allocation
            # larger than physical HBM — the quadratic buffers don't even
            # compile. Report the analytic floor (the fp32 score tensor).
            fwd = None
        try:
            bwd = benchmark_memory(
                lambda q, k, v: jax.grad(loss, argnums=(0, 1, 2))(q, k, v),
                q, k, v, verbose=False,
            )
        except Exception:
            bwd = None
        rows[name] = (fwd, bwd)
    return rows


def main():
    causal = "--causal" in sys.argv
    lines = [
        "# MEMORY — fused vs XLA attention peak HBM (measured, XLA memory plan)",
        "",
        f"Config: b={B}, h={H}, d={D}, bf16"
        f"{', causal' if causal else ''} — the reference's memory-graph "
        "config (reference README.md:86-92: 10x @ 2K, 20x @ 4K on A100).",
        "",
        "`attn temp` = XLA temp bytes of the jitted attention call: every "
        "intermediate the program materializes beyond args+outputs. Flash "
        "is linear in S (no (S,S) tensor exists; bwd recomputes P from the "
        "saved LSE); naive is quadratic (scores + probabilities, and the "
        "bwd saves P as a residual).",
        "",
        "| S | flash fwd temp | naive fwd temp | ratio | flash fwd+bwd temp"
        " | naive fwd+bwd temp | ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    print(f"devices: {jax.devices()}")
    for s in (2048, 4096, 8192, 16384):
        r = measure(s, causal)
        ffwd, fbwd = r["flash"]
        nfwd, nbwd = r["naive"]
        score_bytes = B * H * s * s * 4  # fp32 (b,h,s,s) score tensor

        def fmt(x):
            return f"{x / GIB:.3f} GiB"

        def naive_cell(m, floor):
            if m is None:
                return f"OOM: >={floor / GIB:.0f} GiB", floor
            return fmt(m.temp_bytes), m.temp_bytes

        nf_cell, nf_bytes = naive_cell(nfwd, score_bytes)
        nb_cell, nb_bytes = naive_cell(nbwd, 2 * score_bytes)
        r1 = nf_bytes / max(ffwd.temp_bytes, 1)
        r2 = nb_bytes / max(fbwd.temp_bytes, 1)
        ge1 = ">=" if nfwd is None else ""
        ge2 = ">=" if nbwd is None else ""
        line = (
            f"| {s} | {fmt(ffwd.temp_bytes)} | {nf_cell} | "
            f"**{ge1}{r1:.1f}x** | {fmt(fbwd.temp_bytes)} | "
            f"{nb_cell} | **{ge2}{r2:.1f}x** |"
        )
        lines.append(line)
        print(line, flush=True)

    lines += [
        "",
        "Measured from `jax.jit(...).lower().compile().memory_analysis()` "
        "on the device in `python benchmarks/benchmark_memory.py` (exact "
        "compile-time plan for a static-shape XLA program). `OOM` rows: "
        "the backend refuses to even compile a program whose single "
        "largest buffer exceeds the chip's 16 GiB HBM — the floor shown "
        "is the fp32 (b,h,S,S) score tensor alone; flash at the same "
        "shape compiles and runs.",
        "",
        "Max single-chip context (flash, this config): the fused kernel's "
        "working set stays linear, so S=64K fwd+bwd fits comfortably "
        "(see SCALING.md / DETERMINISM.md long-seq rows; the reference "
        "claims 64K on A100, README.md:74).",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..", "MEMORY.md"),
              "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote MEMORY.md")


if __name__ == "__main__":
    main()
