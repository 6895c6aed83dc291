"""GPT-2 training-step throughput on one chip (flagship end-to-end).

Reports tokens/s and model FLOPs utilization (MFU) for a GPT-2-small
train step (fwd+bwd+adamw) at S=1024, the reference benchmark seqlen.

Usage: python benchmarks/benchmark_gpt2_train.py [--batch 8] [--seqlen 1024]
       python benchmarks/benchmark_gpt2_train.py --table   (long-context
       MFU sweep S=1K/4K/8K -> TRAIN.md; the regime where the flash
       kernels dominate step flops)
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel, make_train_step


def run_config(b, s, layers=12, steps=20, dropout=0.1, remat=False,
               n_head=12, remat_policy=None):
    """One measured train-step config. Returns a result dict."""
    cfg = GPT2Config(
        vocab_size=50257, n_layer=layers, n_head=n_head, n_embd=768,
        max_position_embeddings=max(1024, s), dropout=dropout,
        dtype=jnp.bfloat16, remat=remat, remat_policy=remat_policy,
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)
    # Beyond ~8K tokens the materialized (b, s, vocab) fp32 logits + their
    # log_softmax bwd temp dominate the step's HBM (9.2 GiB at b=8/S=4K,
    # an OOM on a 16 GiB chip): stream the LM head + CE over 1K-token
    # chunks instead (models/gpt2.py chunked_lm_loss).
    lm_chunk = 1024 if b * s > 8192 else None
    step = jax.jit(
        make_train_step(model, optimizer, lm_loss_chunk=lm_chunk),
        donate_argnums=(0, 1),
    )

    params, opt_state, loss = step(
        params, opt_state, batch, jax.random.PRNGKey(1)
    )
    loss0 = float(loss)  # sync = compile + warm
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
    loss = float(loss)  # sync
    dt = (time.perf_counter() - t0) / steps
    toks = b * s
    # 6*N*T matmul flops + attention 12*L*b*h*s^2*hd flops, causal x0.5,
    # fwd+bwd = 3.5x fwd (2 fwd dots, 5 bwd dots) per the kernel schedule.
    hd = 768 // cfg.n_head
    attn_flops = 3.5 * 4 * layers * b * cfg.n_head * s * s * hd * 0.5
    flops = 6 * n_params * toks + attn_flops
    # Hardware flops: head_dim pads to the 128-lane MXU width, so at
    # hd=64 the attention kernel moves 2x the model's attention flops —
    # intrinsic to ANY TPU kernel (the QK contraction runs over lanes).
    hw_flops = flops + attn_flops * (max(128, hd) / hd - 1)
    return dict(
        b=b, s=s, h=cfg.n_head, hd=hd, ms=dt * 1e3, tok_s=toks / dt,
        mfu=flops / dt / 197e12 * 100,
        hw_mfu=hw_flops / dt / 197e12 * 100,
        attn_frac=attn_flops / flops * 100,
        loss=loss, loss0=loss0, n_params=n_params,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", default=None,
                    choices=[None, "dots", "dots_flash"])
    args = ap.parse_args()

    if not args.table:
        r = run_config(args.batch, args.seqlen, args.layers, args.steps,
                       remat=args.remat, remat_policy=args.remat_policy)
        print(f"warm loss: {r['loss0']:.3f}  ({r['n_params']/1e6:.0f}M params)")
        print(
            f"train step: {r['ms']:.1f} ms, {r['tok_s']:,.0f} tokens/s, "
            f"MFU {r['mfu']:.1f}% (v5e bf16), attn {r['attn_frac']:.0f}% of "
            f"flops, final loss {r['loss']:.3f}"
        )
        return

    # Long-context sweep (VERDICT r2 #4): token budget held near 8K,
    # batch scaled down as S grows; plus a same-batch 4K row to separate
    # the batch effect from the seqlen effect.
    rows = []
    for b, s, remat, n_head, policy in (
        (8, 1024, False, 12, None),
        (2, 4096, False, 12, None),
        (8, 4096, True, 12, None),  # 12 layers' activations blow HBM w/o remat
        (1, 8192, True, 12, None),
        (4, 8192, True, 12, None),
        # Same params/budget but head_dim=128 (6 heads): the model maps
        # natively to the 128-lane MXU, no attention padding waste.
        (8, 4096, True, 6, None),
        (4, 8192, True, 6, None),
        # Selective remat: save dot outputs + the flash kernel output,
        # recompute only elementwise — near-no-remat flops at O(1)-ish
        # activation memory (models/gpt2.py remat_policy). Policy sweep
        # {full remat, dots, dots_flash} at S=4K/8K (VERDICT r4 #2):
        # "dots" still re-runs the S^2 flash forward in the backward;
        # "dots_flash" saves (out, lse) so it does not.
        (8, 4096, True, 6, "dots"),
        (4, 8192, True, 6, "dots"),
        (8, 4096, True, 6, "dots_flash"),
        (4, 8192, True, 6, "dots_flash"),
        (8, 4096, True, 12, "dots_flash"),
        (4, 8192, True, 12, "dots_flash"),
    ):
        r = run_config(b, s, args.layers, args.steps, remat=remat,
                       n_head=n_head, remat_policy=policy)
        r["remat"] = (
            f"yes ({policy})" if (remat and policy) else
            ("yes" if remat else "no")
        )
        rows.append(r)
        print(
            f"b={b} S={s} h={n_head} remat={r['remat']}: {r['ms']:.1f} ms, "
            f"{r['tok_s']:,.0f} tok/s, MFU {r['mfu']:.1f}% "
            f"(hw {r['hw_mfu']:.1f}%), attn {r['attn_frac']:.0f}% of flops",
            flush=True,
        )
    lines = [
        "# TRAIN — GPT-2 train-step MFU vs context length (measured)",
        "",
        "GPT-2 small (124M), bf16, fwd+bwd+AdamW in one jitted step, one "
        "v5e chip. `attn %` = share of step FLOPs inside the flash "
        "attention kernels (causal, fwd 2 dots + bwd 5 dots).",
        "",
        "| batch | seqlen | heads x hd | remat | ms/step | tokens/s | MFU "
        "| hw MFU | attn % of flops |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['b']} | {r['s']} | {r['h']}x{r['hd']} "
            f"| {r['remat']} "
            f"| {r['ms']:.1f} | {r['tok_s']:,.0f} | "
            f"**{r['mfu']:.1f}%** | {r['hw_mfu']:.1f}% "
            f"| {r['attn_frac']:.0f}% |"
        )
    lines += [
        "",
        "`MFU` counts model flops (head_dim as configured); `hw MFU` "
        "counts what the chip actually executes — GPT-2's head_dim=64 "
        "pads to the 128-lane MXU inside the attention kernel (the QK "
        "contraction runs over lanes), an intrinsic 2x on attention "
        "flops for ANY TPU kernel at hd=64. The 6x128 rows carry the "
        "same parameter budget with a hardware-native head_dim.",
        "",
        "Remat accounting: plain `remat=yes` rows recompute every block "
        "forward in the backward (required to fit 12 layers' activations "
        "at S>=4K on one 16 GiB chip), executing ~4/3 of the no-remat "
        "step's matmul flops — MFU, which credits model flops only, "
        "under-reports silicon utilization by that factor on those rows. "
        "`yes (dots)` saves dot outputs but still re-runs the S^2 flash "
        "forward in the backward; `yes (dots_flash)` additionally saves "
        "the flash kernel's (out, lse) (ops/attention.py "
        "checkpoint_name), so the backward recomputes only elementwise "
        "ops — near-no-remat flops at O(saved-dots) activation memory.",
        "",
        "S>=4K rows require `lm_loss_chunk` (chunked_lm_loss, models/"
        "gpt2.py): the materialized (b, s, vocab) fp32 logits + their "
        "log_softmax bwd temp alone were 9.2 GiB at b=8/S=4K (the "
        "round-3 OOM).",
    ]
    lines += [
        "",
        "Reference bar: MLPerf BERT provenance (reference README.md:9); "
        "VERDICT r2 asked for MFU at the long-context regime where the "
        "flash kernels dominate step flops (S>=4K).",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..", "TRAIN.md"),
              "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote TRAIN.md")


if __name__ == "__main__":
    main()
