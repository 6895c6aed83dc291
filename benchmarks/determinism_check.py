"""On-device determinism / race check (reference analog:
tests/test_flash_attn.py:619-671 — 10 seeded reruns, bitwise equality).

The CPU interpret-mode determinism test (tests/test_dropout.py) cannot
surface device races; this script runs on the REAL chip once per round
and records the result in DETERMINISM.md.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import flash_attention

RERUNS = 10


def check(name, f, *args):
    ref = jax.tree.map(np.asarray, f(*args))
    for i in range(RERUNS - 1):
        got = jax.tree.map(np.asarray, f(*args))
        ok = all(
            np.array_equal(a, b)
            for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got))
        )
        if not ok:
            return name, False
    return name, True


def main():
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 1024, 4, 128
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    seed = jnp.uint32(99)

    fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
    fwd_drop = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, dropout_p=0.17, dropout_seed=seed
        )
    )

    def _loss(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, causal=True, dropout_p=0.17, dropout_seed=seed
            ).astype(jnp.float32)
        )

    grads = jax.jit(jax.grad(_loss, argnums=(0, 1, 2)))

    results = [
        check("fwd causal bf16", fwd, q, k, v),
        check("fwd causal + dropout", fwd_drop, q, k, v),
        check("fwd+bwd grads + dropout regen", grads, q, k, v),
    ]

    # ALiBi on-device correctness (the CPU suite runs interpret mode only):
    # compiled fwd vs the XLA oracle at bf16 tolerance.
    from flash_attn_tpu.ops.attention import alibi_slopes
    from flash_attn_tpu.reference import attention_ref

    slopes = alibi_slopes(h)
    out_a = np.asarray(jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, alibi_slopes=slopes
        )
    )(q, k, v)).astype(np.float32)
    i_ = jnp.arange(s, dtype=jnp.float32)[:, None]
    j_ = jnp.arange(s, dtype=jnp.float32)[None, :]
    bias = slopes[None, :, None, None] * (j_ - i_)[None, None]
    ref_a = attention_ref(
        jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
        jnp.transpose(v, (0, 2, 1, 3)), causal=True, bias=bias,
    )
    ref_a = np.asarray(jnp.transpose(ref_a, (0, 2, 1, 3))).astype(np.float32)
    err_a = float(np.max(np.abs(out_a - ref_a)))
    results.append(
        ("alibi fwd vs oracle (max err %.1e, tol 2e-2)" % err_a,
         err_a < 2e-2)
    )

    # Streamed-dq (aliased) backward equivalence vs the VMEM-scratch mode
    # (compiled-only path; the interpreter cannot model the aliased RMW).
    # Shapes chosen so every dq block is revisited across MANY kv steps
    # (nq=4, nk=2 with the default bwd tiling) — exercising the cross-step
    # accumulation and the causal row-transition redirect edge.
    import flash_attn_tpu.kernels.flash_bwd as FB

    s2 = 2048
    qa = jnp.asarray(rng.standard_normal((1, s2, 2, 128)), jnp.bfloat16)
    ka = jnp.asarray(rng.standard_normal((1, s2, 2, 128)), jnp.bfloat16)
    va = jnp.asarray(rng.standard_normal((1, s2, 2, 128)), jnp.bfloat16)

    def _grads_plain(q, k, v):
        return jax.jit(jax.grad(
            lambda a, b_, c: jnp.sum(
                flash_attention(a, b_, c, causal=True).astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        ))(q, k, v)

    ref = jax.tree.map(np.asarray, _grads_plain(qa, ka, va))
    saved = FB.DQ_SCRATCH_BYTES
    try:
        FB.DQ_SCRATCH_BYTES = 1  # force the aliased mode
        jax.clear_caches()
        got = jax.tree.map(np.asarray, _grads_plain(qa, ka, va))
    finally:
        FB.DQ_SCRATCH_BYTES = saved
        jax.clear_caches()
    err = max(
        float(np.max(np.abs(a.astype(np.float32) - b.astype(np.float32))))
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got))
    )
    results.append(("dq-alias vs scratch grads (max err %.1e, tol 5e-3)" % err,
                    err < 5e-3))

    # ---- dq-alias shape sweep (VERDICT r2 #6) ----
    # The stale-block clobber hazard (flash_bwd.py redirect notes) is
    # shape-dependent: sweep seqlen x head_dim x causal x GQA. For shapes
    # whose fp32 dq fits VMEM, oracle = scratch mode (alias forced via
    # threshold). For longer shapes (alias is the only mode that fits),
    # cross-check two *different* alias tilings — independent RMW
    # schedules agreeing rules out stale-copy clobbers there too.
    import dataclasses as _dc

    from flash_attn_tpu.kernels.block_sizes import BlockSizes

    sweep = [
        # (sq, d, causal, kv_head_divisor) — scratch-oracle rows
        (4096, 64, True, 1),
        (4096, 128, False, 1),
        (8192, 64, True, 2),
        (8192, 128, True, 1),
        # alias-vs-alias rows (natural alias; scratch would blow VMEM)
        (16384, 128, True, 1),
        (32768, 64, True, 2),
    ]
    for sq_i, d_i, causal_i, gdiv in sweep:
        h_q = 2
        qs = jnp.asarray(
            rng.standard_normal((1, sq_i, h_q, d_i)), jnp.bfloat16)
        ks = jnp.asarray(
            rng.standard_normal((1, sq_i, h_q // gdiv, d_i)), jnp.bfloat16)
        vs = jnp.asarray(
            rng.standard_normal((1, sq_i, h_q // gdiv, d_i)), jnp.bfloat16)

        def _g(bs=None):
            return jax.jit(jax.grad(
                lambda a, b_, c: jnp.sum(
                    flash_attention(
                        a, b_, c, causal=causal_i, block_sizes=bs
                    ).astype(jnp.float32)
                ),
                argnums=(0, 1, 2),
            ))(qs, ks, vs)

        natural_alias = sq_i * d_i * 4 > saved
        try:
            if not natural_alias:
                ref_s = jax.tree.map(np.asarray, _g())  # scratch
                FB.DQ_SCRATCH_BYTES = 1
                jax.clear_caches()
                got_s = jax.tree.map(np.asarray, _g())  # forced alias
                kind = "alias vs scratch"
            else:
                ref_s = jax.tree.map(np.asarray, _g())  # default alias
                alt = BlockSizes.choose(
                    seq_len_q=sq_i, seq_len_k=sq_i, head_dim=d_i)
                alt = _dc.replace(
                    alt,
                    block_k_dq=max(128, alt.block_k_dq // 2),
                    block_q_dq=max(128, alt.block_q_dq // 2),
                )
                got_s = jax.tree.map(np.asarray, _g(alt))  # alt alias tiling
                kind = "alias vs alias/2-tiles"
        finally:
            FB.DQ_SCRATCH_BYTES = saved
            jax.clear_caches()
        err = max(
            float(np.max(np.abs(a.astype(np.float32) - b.astype(np.float32))))
            for a, b in zip(jax.tree.leaves(ref_s), jax.tree.leaves(got_s))
        )
        results.append((
            f"dq sweep S={sq_i} d={d_i} causal={int(causal_i)} "
            f"gqa={gdiv}x ({kind}, err %.1e, tol 5e-3)" % err,
            err < 5e-3,
        ))
        print(results[-1], flush=True)

    dev = jax.devices()[0]
    lines = [
        "# On-device determinism check",
        "",
        f"{RERUNS} seeded reruns, bitwise equality, device: {dev.device_kind}"
        f" ({dev.platform}).",
        "",
        "| check | result |",
        "|---|---|",
    ]
    ok_all = True
    for name, ok in results:
        word = "within tolerance" if "tol" in name else "bitwise identical"
        lines.append(f"| {name} | {word if ok else 'MISMATCH'} |")
        ok_all &= ok
    lines.append("")
    out = os.path.join(os.path.dirname(__file__), "..", "DETERMINISM.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
