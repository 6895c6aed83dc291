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
        lines.append(f"| {name} | {'bitwise identical' if ok else 'MISMATCH'} |")
        ok_all &= ok
    lines.append("")
    out = os.path.join(os.path.dirname(__file__), "..", "DETERMINISM.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
