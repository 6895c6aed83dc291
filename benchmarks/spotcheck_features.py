"""On-device spot checks for every kernel feature (round-3 additions).

CLAUDE.md convention + VERDICT r3 #4: every kernel feature needs an
on-device (compiled, real chip) check against the XLA oracle, because the
CPU suite runs interpret mode only — Mosaic lowering bugs (relayouts,
mask algebra, aliasing) are invisible there. One real shape per feature,
dual-reference 2x error bound (reference README.md:128-132 methodology),
grads included where the feature has a bwd chain rule.

Writes SPOTCHECK.md. Exit 1 on any failure.

Usage (real TPU): python benchmarks/spotcheck_features.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import flash_attention
from flash_attn_tpu.ops.attention import alibi_slopes
from flash_attn_tpu.reference import attention_ref, build_mask
from flash_attn_tpu.utils.testing import max_err

RESULTS = []


def _bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def check_fwd_bwd(name, kern_kw, ref_kw, *, b=2, s=2048, h=4, hkv=None,
                  d=128, seed=0, mult=2.0):
    """Compiled kernel fwd+grads vs fp32 oracle, bounded by 2x the
    native-bf16 oracle's own error (+ small atol floor)."""
    rng = np.random.default_rng(seed)
    hkv = hkv or h
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)

    group = h // hkv
    k_r = jnp.repeat(k, group, axis=2)
    v_r = jnp.repeat(v, group, axis=2)

    def loss_kern(q, k, v):
        return jnp.sum(flash_attention(q, k, v, **kern_kw).astype(jnp.float32))

    def loss_ref(q, k, v, upcast):
        o = attention_ref(_bhsd(q), _bhsd(k), _bhsd(v), upcast=upcast,
                          **ref_kw)
        return jnp.sum(o.astype(jnp.float32))

    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, **kern_kw))(
        q, k, v)
    gq, gk, gv = jax.jit(jax.grad(loss_kern, argnums=(0, 1, 2)))(q, k, v)

    ref32 = _bhsd(attention_ref(
        _bhsd(q), _bhsd(k_r), _bhsd(v_r), upcast=True, **ref_kw))
    refnat = _bhsd(attention_ref(
        _bhsd(q), _bhsd(k_r), _bhsd(v_r), upcast=False, **ref_kw))
    rq32, rk32, rv32 = jax.jit(jax.grad(
        lambda q, k, v: loss_ref(q, k, v, True), argnums=(0, 1, 2)
    ))(q, k_r, v_r)
    rqn, rkn, rvn = jax.jit(jax.grad(
        lambda q, k, v: loss_ref(q, k, v, False), argnums=(0, 1, 2)
    ))(q, k_r, v_r)
    if group > 1:  # fold repeated-head grads back to kv-head width
        fold = lambda g: g.reshape(b, s, hkv, group, d).sum(3)
        rk32, rv32 = fold(rk32), fold(rv32)
        rkn, rvn = fold(rkn), fold(rvn)

    ok = True
    details = []
    for label, got, r32, rnat, atol in (
        ("out", out, ref32, refnat, 1e-4),
        ("dq", gq, rq32, rqn, 2e-3),
        ("dk", gk, rk32, rkn, 2e-3),
        ("dv", gv, rv32, rvn, 2e-3),
    ):
        err = max_err(got, r32)
        base = max_err(rnat, r32)
        this_ok = err <= mult * base + atol
        ok &= this_ok
        details.append(f"{label} {err:.1e}<=2x{base:.1e}")
    RESULTS.append((name, ok, ", ".join(details)))
    print(RESULTS[-1], flush=True)


def check_band_route(seed=9):
    """End-to-end band routing through the blocksparse API on device:
    a bank-less causal band layout (the long-S regime band_route_plan
    routes) must match the generic blocksparse kernel compiled."""
    import flash_attn_tpu.kernels.blocksparse as kbs
    import flash_attn_tpu.ops.blocksparse as bso
    from flash_attn_tpu.kernels.blocksparse import (
        COL_CELL, ROW_CELL, build_layout,
    )
    from flash_attn_tpu.ops.blocksparse import blocksparse_attention

    s, b, h, d, w = 2048, 1, 4, 128, 900
    nr, nc = s // ROW_CELL, s // COL_CELL
    r = np.arange(nr)[:, None] * ROW_CELL
    b_ = r + ROW_CELL - 1
    cc = np.arange(nc)[None, :]
    bm = (cc >= np.maximum((r - w) // COL_CELL, 0)) & (
        cc <= np.minimum(b_ // COL_CELL, nc - 1))
    old_cap = kbs.MASK_BANK_MAX_BYTES
    kbs.MASK_BANK_MAX_BYTES = 0
    try:
        lay = build_layout(bm, sq=s, sk=s, causal=True)
    finally:
        kbs.MASK_BANK_MAX_BYTES = old_cap
    assert bso.band_route_plan(lay, True) is not None
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: blocksparse_attention(
        q, k, v, lay, causal=True))
    out_routed = np.asarray(f(q, k, v))
    old = bso.ENABLE_BAND_ROUTE
    bso.ENABLE_BAND_ROUTE = False
    try:
        out_generic = np.asarray(jax.jit(
            lambda q, k, v: blocksparse_attention(
                q, k, v, lay, causal=True))(q, k, v))
    finally:
        bso.ENABLE_BAND_ROUTE = old
    err = float(np.max(np.abs(
        out_routed.astype(np.float32) - out_generic.astype(np.float32))))
    ok = err <= 2e-2
    RESULTS.append((
        "blocksparse band route (bank-less causal band, routed vs "
        "generic)", ok, f"max |routed-generic| {err:.1e} <= 2e-2"))
    print(RESULTS[-1])


def check_kvcache(name, seed=5, **feat):
    """flash_attn_with_kvcache (append + multi-token paged attend) on the
    chip vs a dense tail-aligned-causal oracle."""
    from flash_attn_tpu.serving.cache import init_cache
    from flash_attn_tpu.serving.kvcache import (
        append_chunk, flash_attn_with_kvcache,
    )

    rng = np.random.default_rng(seed)
    n_kv, d, page_size, pages_per_seq = 4, 128, 128, 8
    batch, hist, sq = 2, 700, 24
    num_pages = batch * pages_per_seq + 1
    cache = init_cache(n_kv, num_pages, page_size, d, dtype=jnp.bfloat16)
    table = jnp.asarray(
        1 + np.arange(batch * pages_per_seq).reshape(batch, pages_per_seq),
        jnp.int32)
    ks = jnp.asarray(
        rng.standard_normal((batch, hist, n_kv, d)), jnp.bfloat16)
    vs = jnp.asarray(
        rng.standard_normal((batch, hist, n_kv, d)), jnp.bfloat16)
    cache = jax.jit(append_chunk)(
        cache, ks, vs, table, jnp.zeros((batch,), jnp.int32))
    qc = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.bfloat16)
    lengths = jnp.full((batch,), hist, jnp.int32)
    out, _ = jax.jit(
        lambda q, kn, vn, c, t, ln: flash_attn_with_kvcache(
            q, c, t, ln, kn, vn, **feat)
    )(qc, kc, vc, cache, table, lengths)

    total = hist + sq
    k_all = jnp.concatenate([ks, kc], axis=1).astype(jnp.float32)
    v_all = jnp.concatenate([vs, vc], axis=1).astype(jnp.float32)
    t = jnp.arange(sq)[:, None] + hist
    j = jnp.arange(total)[None, :]
    mask = j <= t
    if feat.get("window_left") is not None:
        mask = mask & (j >= t - feat["window_left"])
    kw = {}
    if feat.get("softcap") is not None:
        kw["softcap"] = feat["softcap"]
    if feat.get("alibi_slopes") is not None:
        sl = jnp.asarray(feat["alibi_slopes"], jnp.float32)
        kw["bias"] = sl[None, :, None, None] * (
            j - t).astype(jnp.float32)[None, None]
    ref = attention_ref(
        _bhsd(qc), jnp.transpose(k_all, (0, 2, 1, 3)),
        jnp.transpose(v_all, (0, 2, 1, 3)),
        mask=mask[None, None], **kw)
    refn = attention_ref(
        _bhsd(qc),
        jnp.transpose(k_all, (0, 2, 1, 3)).astype(jnp.bfloat16),
        jnp.transpose(v_all, (0, 2, 1, 3)).astype(jnp.bfloat16),
        mask=mask[None, None], upcast=False, **kw)
    err = max_err(_bhsd(out), ref)
    base = max_err(refn, ref)
    ok = err <= 2.0 * base + 1e-4
    RESULTS.append((name, ok, f"out {err:.1e}<=2x{base:.1e}"))
    print(RESULTS[-1], flush=True)


def main():
    dev = jax.devices()[0]
    assert dev.platform != "cpu" or os.environ.get(
        "SPOTCHECK_ALLOW_CPU"), "run this on the real chip"
    s = 2048
    w = 300
    slopes = alibi_slopes(4)
    i_ = jnp.arange(s, dtype=jnp.float32)[:, None]
    j_ = jnp.arange(s, dtype=jnp.float32)[None, :]
    alibi_bias = slopes[None, :, None, None] * (j_ - i_)[None, None]

    check_fwd_bwd(
        "window fwd+bwd (causal, w=300)",
        dict(causal=True, window_size=(w, 0)),
        dict(mask=build_mask(s, s, causal=True, window_left=w)[None, None]),
    )
    check_fwd_bwd(
        "softcap fwd+bwd (cap=30, causal)",
        dict(causal=True, softcap=30.0),
        dict(causal=True, softcap=30.0),
        seed=1,
    )
    check_fwd_bwd(
        "alibi fwd+bwd (causal)",
        dict(causal=True, alibi_slopes=slopes),
        dict(causal=True, bias=alibi_bias),
        seed=2,
    )
    check_fwd_bwd(
        "window+alibi+softcap+GQA fwd+bwd",
        dict(causal=True, window_size=(w, 0), alibi_slopes=slopes,
             softcap=30.0),
        dict(softcap=30.0, bias=alibi_bias,
             mask=build_mask(s, s, causal=True, window_left=w)[None, None]),
        hkv=2, seed=3,
    )
    # Round-5 features: training sinks + the cell-quantized band (the
    # blocksparse band router's kernel path).
    i_g = np.arange(s)[:, None]
    j_g = np.arange(s)[None, :]
    sink_mask = (
        (np.asarray(build_mask(s, s, causal=True, window_left=w))
         | (j_g < 64))
        & (i_g >= j_g)
    )
    check_fwd_bwd(
        "window+sinks fwd+bwd (w=300, sinks=64, causal)",
        dict(causal=True, window_size=(w, None), num_sinks=64),
        dict(mask=jnp.asarray(sink_mask)[None, None]),
        seed=7,
    )
    Lq = 700
    rw = (i_g // 16) * 16
    cw = (j_g // 256) * 256
    cell_mask = (
        ((cw >= rw - (Lq + 255)) | (j_g < 512)) & (i_g >= j_g)
    )
    check_fwd_bwd(
        "cell-quantized band + sinks (band route kernel path)",
        dict(causal=True, window_size=(Lq, None), window_cell=(16, 256),
             num_sinks=512),
        dict(mask=jnp.asarray(cell_mask)[None, None]),
        seed=8,
    )
    check_band_route()
    check_kvcache("kvcache chunk append+attend (sq=24, hist=700)")
    check_kvcache(
        "kvcache chunk + window+softcap+alibi",
        seed=6, window_left=256, softcap=20.0,
        alibi_slopes=np.asarray(alibi_slopes(4)),
    )

    lines = [
        "# SPOTCHECK — on-device (compiled) feature checks",
        "",
        f"Device: {dev.device_kind} ({dev.platform}). bf16 inputs, "
        "dual-reference bound: kernel error vs fp32 oracle <= 2x the "
        "native-bf16 oracle's own error (+ atol floor; grads included "
        "where the feature has a bwd chain rule). The CPU suite runs "
        "these same features in interpret mode only — this artifact is "
        "the Mosaic-lowering evidence.",
        "",
        "| feature | result | errors |",
        "|---|---|---|",
    ]
    ok_all = True
    for name, ok, det in RESULTS:
        lines.append(f"| {name} | {'PASS' if ok else 'FAIL'} | {det} |")
        ok_all &= ok
    lines.append("")
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "SPOTCHECK.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
