"""Blocksparse vs dense at S=8K (VERDICT config #4).

Target: blocksparse >= dense throughput at <=50% density, ~2x dense at
25% (time-proportional-to-density minus overheads).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.ops.blocksparse import blocksparse_attention, build_layout
from flash_attn_tpu.kernels.blocksparse import COL_CELL, ROW_CELL

B, S, H, D = 2, 8192, 16, 128


def make_mask(density, rng):
    """Random iid cell mask (the pathological case: nothing is block-
    skippable at any tile granularity)."""
    nr, nc = S // ROW_CELL, S // COL_CELL
    m = rng.random((nr, nc)) < density
    return m


def make_window_mask(window_cells, global_cells):
    """Structured mask (the reference's actual use-case — DeepSpeed-style
    sliding window + global columns): active cells cluster, so wide tiles
    are mostly full-or-empty."""
    nr, nc = S // ROW_CELL, S // COL_CELL
    m = np.zeros((nr, nc), bool)
    for r in range(nr):
        c_mid = r * ROW_CELL // COL_CELL
        lo = max(0, c_mid - window_cells)
        hi = min(nc, c_mid + window_cells + 1)
        m[r, lo:hi] = True
    m[:, :global_cells] = True
    return m


def make_blockdiag_mask(n_docs):
    """Block-diagonal (document-masking) pattern aligned to 1024-col tiles:
    every active tile is FULL, so the kernel runs pure fast-path on 1/n of
    the area."""
    nr, nc = S // ROW_CELL, S // COL_CELL
    m = np.zeros((nr, nc), bool)
    doc_r, doc_c = nr // n_docs, nc // n_docs
    for i in range(n_docs):
        m[i * doc_r:(i + 1) * doc_r, i * doc_c:(i + 1) * doc_c] = True
    return m


def chained(f, n):
    @jax.jit
    def g(*a):
        a = list(a)
        for _ in range(n):
            a[0] = f(*a)
        return jnp.sum(a[0][..., :1, :1].astype(jnp.float32))
    return g


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

    CHAIN = 8
    fns = {}
    fns["dense"] = functools.partial(
        flash_attention, causal=False, layout="bhsd")
    masks = {
        "rand 50%": make_mask(0.5, rng),
        "window 50%": make_window_mask(7, 1),
        "window 25%": make_window_mask(3, 1),
        "window 12%": make_window_mask(1, 1),
        "blockdiag 25%": make_blockdiag_mask(4),
        "blockdiag 50%": make_blockdiag_mask(2),
        "full 100%": make_mask(1.1, rng),
    }
    import flash_attn_tpu.ops.blocksparse as bso
    from flash_attn_tpu.kernels.blocksparse import ROW_CELL as RC

    def make_causal_band_mask(w):
        """Cell-ification of (element causal ∧ left-window w): the
        band-route policy's win case (causal banded linearized grid)."""
        nr, nc = S // RC, S // COL_CELL
        r = np.arange(nr)[:, None] * RC
        b_ = r + RC - 1
        cc = np.arange(nc)[None, :]
        lo = np.maximum((r - w) // COL_CELL, 0)
        hi = np.minimum(b_ // COL_CELL, nc - 1)  # causal staircase
        return (cc >= lo) & (cc <= hi)

    causal_masks = {
        "causal band w2048": (make_causal_band_mask(2048), True),
        "causal band w1024": (make_causal_band_mask(1024), True),
    }

    all_masks = {n: (m, False) for n, m in masks.items()}
    all_masks.update(causal_masks)

    for name, (m, is_causal) in all_masks.items():
        dens = m.mean()
        lay = build_layout(m, sq=S, sk=S, causal=is_causal)

        def f(q, k, v, lay=lay, is_causal=is_causal):
            return blocksparse_attention(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2), lay, causal=is_causal,
            ).swapaxes(1, 2)

        label = f"{name} (true {dens * 100:.0f}%)"
        if lay.band_route is not None:
            policy_routes = bso.band_route_plan(lay, is_causal) is not None
            label += " [routed]" if policy_routes else " [generic by policy]"

            def f_other(q, k, v, lay=lay, is_causal=is_causal,
                        flip=policy_routes):
                # The road not taken, same mask: forced-generic when the
                # policy routes, forced-window-route when it does not —
                # the measured evidence behind the dispatch policy.
                old = bso.ENABLE_BAND_ROUTE
                bso.ENABLE_BAND_ROUTE = False
                try:
                    if flip:
                        return blocksparse_attention(
                            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                            jnp.swapaxes(v, 1, 2), lay, causal=is_causal,
                        ).swapaxes(1, 2)
                finally:
                    bso.ENABLE_BAND_ROUTE = old
                wl, wr, g = lay.band_route
                return flash_attention(
                    q, k, v, causal=is_causal, layout="bhsd",
                    window_size=(wl, wr), num_sinks=g,
                    window_cell=(RC, COL_CELL),
                )

            other = "generic (forced)" if policy_routes else "window (forced)"
            fns[f"{name} {other}"] = f_other
        fns[label] = f

    built = {}
    for name, f in fns.items():
        g1, gN = chained(f, 1), chained(f, CHAIN + 1)
        np.asarray(g1(q, k, v)); np.asarray(gN(q, k, v))
        built[name] = (g1, gN)
    rounds = 5
    times = {n: [] for n in built}
    for r in range(rounds):
        for name, (g1, gN) in built.items():
            a = q * (1.0 + 0.37 * r)
            t0 = time.perf_counter(); np.asarray(g1(a, k, v))
            t1 = time.perf_counter(); np.asarray(gN(a, k, v))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / CHAIN)
    fl_dense = 4 * B * H * S * S * D
    t_dense = sorted(times["dense"])[rounds // 2]
    for name in built:
        med = sorted(times[name])[rounds // 2]
        print(f"{name:12s} {med*1e3:8.2f} ms  "
              f"{fl_dense/med/1e12:7.2f} dense-TFLOP/s-equiv  "
              f"speedup vs dense {t_dense/med:5.2f}x")


if __name__ == "__main__":
    main()
