"""Scaling report: 1-chip measured -> 1-host / N-host projected tokens/s.

Only one physical v5e chip is reachable from this environment (axon
tunnel), so the single-chip number is MEASURED and the multi-chip rows are
PROJECTED from it with an explicit comm/compute overlap model, while the
multi-device code paths themselves are validated functionally on the
virtual 8-device mesh (tests/test_multihost.py, __graft_entry__.py
dryrun). Writes SCALING.md at the repo root.

Model (per train step, GPT-2-small, global batch scaled with chips):
  - DP all-reduce of grads: 2*(n-1)/n * P * 4 B per step. Rides ICI
    within a host (BW_ICI per chip) and DCN across hosts (BW_DCN per
    host). Overlappable with the backward pass; exposed time is
    max(0, t_comm - overlap_frac * t_bwd).
  - Ring SP (S=64K row): per ring step each device exchanges its KV shard
    over ICI/DCN while computing its local attention block; exposed comm
    is max(0, t_exchange - t_block_compute) summed over steps.

Usage: python benchmarks/benchmark_scaling.py [--steps 12] [--no-measure]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Hardware constants (v5e, published):
PEAK_BF16 = 197e12
BW_ICI = 400e9      # ICI bandwidth per chip (bidirectional aggregate), B/s
BW_DCN = 25e9       # DCN bandwidth per host, B/s (200 Gbps NICs x2)
CHIPS_PER_HOST = 8  # v5e host = 8 chips
OVERLAP = 0.8       # fraction of the bwd pass a DP all-reduce can hide in


def measure_single_chip(steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from flash_attn_tpu.models.gpt2 import (
        GPT2Config, GPT2LMHeadModel, make_train_step,
    )

    cfg = GPT2Config(
        vocab_size=50257, n_layer=12, n_head=12, n_embd=768,
        max_position_embeddings=1024, dropout=0.1, dtype=jnp.bfloat16,
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    b, s = 8, 1024
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0, 1))
    params, opt_state, loss = step(
        params, opt_state, batch, jax.random.PRNGKey(1))
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i))
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    return b * s / dt, dt, n_params, b, s


def project(n_chips, tok_1chip, t_step_1chip, n_params, overlap=OVERLAP):
    """Weak-scaling DP projection: per-chip batch fixed; grads all-reduced."""
    n_hosts = max(1, n_chips // CHIPS_PER_HOST)
    grad_bytes = 4 * n_params  # fp32 grads
    # Ring all-reduce moves 2*(n-1)/n * bytes through the slowest boundary.
    if n_hosts == 1:
        bw = BW_ICI
        t_comm = 2 * (n_chips - 1) / n_chips * grad_bytes / bw
    else:
        # DCN stage dominates: each host moves 2*(h-1)/h * bytes over DCN.
        t_comm = 2 * (n_hosts - 1) / n_hosts * grad_bytes / BW_DCN
    t_bwd = t_step_1chip * 2 / 3  # bwd ~ 2/3 of a fwd+bwd+opt step
    exposed = max(0.0, t_comm - overlap * t_bwd)
    t_step = t_step_1chip + exposed
    toks = tok_1chip * n_chips * (t_step_1chip / t_step)
    eff = toks / (tok_1chip * n_chips)
    return toks, eff, t_comm, exposed


def project_ring_64k(n_chips, n_hosts):
    """BASELINE config #5 shape: attention-only fwd tokens/s at S=64K,
    d=128, h=16, b=1, KV bf16, zigzag causal ring over n_chips."""
    S, H, D = 65536, 16, 128
    s_loc = S // n_chips
    flops = 4 * H * S * S * D * 0.5  # causal fwd
    t_compute = flops / (0.68 * PEAK_BF16)  # measured ~134/197 causal eff.
    kv_bytes = 2 * s_loc * H * D * 2  # k+v bf16 per exchange
    n_steps = n_chips
    # 2 host-boundary hops per rotation ride DCN; the rest ICI.
    per_step_compute = t_compute / n_chips / n_steps * n_chips  # per-device
    t_exposed = 0.0
    for hop in range(n_steps - 1):
        dcn_hops = 2 if n_hosts > 1 else 0
        bw = BW_DCN if (n_hosts > 1 and hop < dcn_hops) else BW_ICI
        t_x = kv_bytes / bw
        t_exposed += max(0.0, t_x - per_step_compute / n_steps)
    t_total = t_compute / n_chips + t_exposed
    return S / t_total, t_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--no-measure", action="store_true")
    ap.add_argument("--tok1", type=float, default=91000.0,
                    help="fallback 1-chip tokens/s when --no-measure")
    args = ap.parse_args()

    if args.no_measure:
        tok1, t1, n_params, b, s = args.tok1, 8 * 1024 / args.tok1, 124e6, 8, 1024
    else:
        tok1, t1, n_params, b, s = measure_single_chip(args.steps)

    rows = []
    for n_chips in (1, 8, 16, 32):
        if n_chips == 1:
            rows.append((1, 1, tok1, 1.0, 0.0, 0.0, "measured"))
            continue
        n_hosts = max(1, n_chips // CHIPS_PER_HOST)
        toks, eff, t_comm, exposed = project(
            n_chips, tok1, t1, n_params
        )
        rows.append((n_chips, n_hosts, toks, eff, t_comm * 1e3,
                     exposed * 1e3, "projected"))

    lines = [
        "# SCALING — tokens/s at 1 chip / 1 host / N hosts",
        "",
        "Single-chip row MEASURED on the tunneled v5e (GPT-2-small train",
        f"step, batch {b} x seq {s}, bf16, dropout 0.1). Multi-chip rows",
        "are PROJECTED with the comm/compute model in",
        "`benchmarks/benchmark_scaling.py` (assumptions: ICI 400 GB/s per",
        "chip, DCN 25 GB/s per host, 80% of the all-reduce hidden behind",
        "the backward pass, weak scaling with fixed per-chip batch). The",
        "multi-device code paths are validated functionally on the virtual",
        "8-device mesh: tests/test_multihost.py (host-DP train step, ring",
        "SP across the host axis, 3-axis host-DP x ring-SP x head-TP) and",
        "the driver dryrun (__graft_entry__.py).",
        "",
        "## GPT-2-small train step (weak scaling, host-DP over DCN)",
        "",
        "| chips | hosts | tokens/s | scaling eff. | all-reduce ms |"
        " exposed ms | kind |",
        "|---|---|---|---|---|---|---|",
    ]
    for n_chips, n_hosts, toks, eff, t_comm, exposed, kind in rows:
        lines.append(
            f"| {n_chips} | {n_hosts} | {toks:,.0f} | {eff * 100:.1f}% |"
            f" {t_comm:.1f} | {exposed:.1f} | {kind} |"
        )

    lines += [
        "",
        "## Overlap sensitivity (error bars on the projected rows)",
        "",
        "The 80% all-reduce/backward overlap is UNMEASURED (one physical",
        "chip): efficiency under 0% (fully exposed, hard floor) / 50% /",
        "80% / 100% overlap bounds the projection. At this model/step",
        "size the DCN all-reduce (~30 ms at 4 hosts) hides under the",
        "~60 ms backward pass at any overlap >= 50%, so the spread is",
        "carried entirely by the 0% floor; larger models (grad bytes",
        "scale with P, step time with P*tokens) keep roughly this ratio",
        "until per-chip batch shrinks.",
        "",
        "| chips | hosts | eff @ 0% | eff @ 50% | eff @ 80% | eff @ 100% |",
        "|---|---|---|---|---|---|",
    ]
    for n_chips in (8, 16, 32):
        n_hosts = max(1, n_chips // CHIPS_PER_HOST)
        effs = [
            project(n_chips, tok1, t1, n_params, overlap=ov)[1]
            for ov in (0.0, 0.5, 0.8, 1.0)
        ]
        lines.append(
            f"| {n_chips} | {n_hosts} | "
            + " | ".join(f"{e * 100:.1f}%" for e in effs)
            + " |"
        )

    lines += [
        "",
        "## Ring-SP attention at S=64K (BASELINE config #5 shape, projected)",
        "",
        "Zigzag causal ring, b=1 h=16 d=128, bf16 KV, fwd-only. Exchange",
        "of the local KV shard overlaps each step's local attention; with",
        "a host-spanning ring only 2 hops per rotation cross DCN.",
        "",
        "| chips | hosts | tokens/s | step time |",
        "|---|---|---|---|",
    ]
    for n_chips, n_hosts in ((8, 1), (16, 2), (32, 4)):
        toks, t_total = project_ring_64k(n_chips, n_hosts)
        lines.append(
            f"| {n_chips} | {n_hosts} | {toks:,.0f} | {t_total * 1e3:.1f} ms |"
        )
    lines += [
        "",
        "## Overlap-assumption validation (round 3)",
        "",
        "`python benchmarks/validate_ring_overlap.py` (virtual 8-device CPU",
        "mesh) confirms the *scheduled* compiled HLO issues every ring",
        "`collective-permute` interleaved with compute on both sides — i.e.",
        "the program hands XLA's latency-hiding scheduler an overlappable",
        "schedule (6/6 rotations for a 4-device fwd+bwd ring), and ring",
        "output matches single-device attention to 3e-7.",
        "",
        "What this does NOT validate: the TPU runtime's actual ICI-transfer",
        "hiding (the async collective-permute-start/done placement is a TPU",
        "LHS-scheduler decision) — that, and the projected 80% all-reduce",
        "overlap in the weak-scaling table, remain unmeasured until >= 2",
        "real chips are available. The sensitivity table above bounds the",
        "cost of that assumption; treat every \"projected\" row accordingly.",
        "",
    ]

    out_path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
