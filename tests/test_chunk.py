"""Multi-token paged attention (kernels/chunk.py) and the
flash_attn_with_kvcache wrapper (serving/kvcache.py).

Oracle: dense attention over the gathered cache with a tail-aligned
causal mask — query row t of sequence b attends keys
[0, lengths[b] - chunk[b] + t].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.chunk import paged_chunk_attention
from flash_attn_tpu.kernels.decode import paged_decode_attention
from flash_attn_tpu.reference import attention_ref
from flash_attn_tpu.serving import quantization as qz
from flash_attn_tpu.serving.cache import init_cache
from flash_attn_tpu.serving.kvcache import (
    append_chunk,
    flash_attn_with_kvcache,
)


def _build_paged(rng, n_kv, num_pages, page_size, d, batch, lengths,
                 pages_per_seq):
    k_pages = jnp.asarray(
        rng.standard_normal((n_kv, num_pages, page_size, d)), jnp.float32
    )
    v_pages = jnp.asarray(
        rng.standard_normal((n_kv, num_pages, page_size, d)), jnp.float32
    )
    table = np.zeros((batch, pages_per_seq), np.int32)
    used = iter(rng.permutation(num_pages))
    dense_k, dense_v = [], []
    for b, ln in enumerate(lengths):
        n = (ln + page_size - 1) // page_size
        ids = [next(used) for _ in range(n)]
        table[b, :n] = ids
        dense_k.append(
            jnp.concatenate([k_pages[:, i] for i in ids], axis=1)[:, :ln]
        )
        dense_v.append(
            jnp.concatenate([v_pages[:, i] for i in ids], axis=1)[:, :ln]
        )
    return k_pages, v_pages, jnp.asarray(table), dense_k, dense_v


def _tail_mask(ln, chunk, sq):
    """(sq, ln) tail-aligned causal mask: row t sees keys
    [0, ln - chunk + t]."""
    t = jnp.arange(sq)[:, None]
    j = jnp.arange(ln)[None, :]
    return (j <= ln - chunk + t) & (t < chunk)


def _oracle_rows(q_b, dense_k, dense_v, ln, chunk, sq, group, **kw):
    """Per-head oracle for one sequence: (sq, hq, d)."""
    hq, d = q_b.shape[1], q_b.shape[2]
    outs = []
    for hqi in range(hq):
        hk = hqi // group
        mask = _tail_mask(ln, chunk, sq)[None, None]
        ref = attention_ref(
            q_b[:, hqi][None, None],  # (1, 1, sq, d)
            dense_k[hk][None, None, :ln],
            dense_v[hk][None, None, :ln],
            mask=mask,
            **kw,
        )
        outs.append(ref[0, 0])  # (sq, d)
    return jnp.stack(outs, axis=1)  # (sq, hq, d)


@pytest.mark.parametrize("group", [1, 2])
def test_chunk_matches_oracle(group):
    rng = np.random.default_rng(0)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    sq = 24
    lengths = [100, 512, 24, 300]
    batch, n_q = len(lengths), n_kv * group
    q = jnp.asarray(
        rng.standard_normal((batch, sq, n_q, d)), jnp.float32
    )
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    out = paged_chunk_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table
    )
    assert out.shape == (batch, sq, n_q, d)
    for b, ln in enumerate(lengths):
        ref = _oracle_rows(q[b], dense_k[b], dense_v[b], ln, sq, sq, group)
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), atol=2e-5, rtol=1e-4,
            err_msg=f"b={b}",
        )


def test_chunk_bf16_compute():
    """bf16 inputs take the bf16-dot (MXU-native) path; tolerance is the
    usual bf16 envelope vs the fp32 oracle."""
    rng = np.random.default_rng(8)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    sq = 8
    lengths = [200, 450]
    batch = len(lengths)
    q = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.bfloat16)
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    out = paged_chunk_attention(
        q.astype(jnp.bfloat16),
        k_pages.astype(jnp.bfloat16),
        v_pages.astype(jnp.bfloat16),
        jnp.asarray(lengths, jnp.int32), table,
    )
    assert out.dtype == jnp.bfloat16
    for b, ln in enumerate(lengths):
        ref = _oracle_rows(
            q[b].astype(jnp.float32), dense_k[b], dense_v[b], ln, sq, sq, 1
        )
        np.testing.assert_allclose(
            np.asarray(out[b], np.float32), np.asarray(ref),
            atol=2e-2, rtol=2e-2, err_msg=f"b={b}",
        )


def test_chunk_sq1_equals_decode():
    """A 1-token chunk is exactly a decode step."""
    rng = np.random.default_rng(1)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    group = 2
    lengths = [100, 512, 1]
    batch, n_q = len(lengths), n_kv * group
    q = jnp.asarray(rng.standard_normal((batch, 1, n_q, d)), jnp.float32)
    k_pages, v_pages, table, _, _ = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    ln = jnp.asarray(lengths, jnp.int32)
    out = paged_chunk_attention(q, k_pages, v_pages, ln, table)
    dec = paged_decode_attention(q[:, 0], k_pages, v_pages, ln, table)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(dec), atol=2e-5, rtol=1e-4
    )


def test_chunk_ragged_lens():
    """Per-sequence chunk lengths: padding rows produce zeros and valid
    rows use their own tail positions."""
    rng = np.random.default_rng(2)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    sq = 16
    lengths = [200, 450]
    chunks = [16, 5]
    batch = len(lengths)
    q = jnp.asarray(
        rng.standard_normal((batch, sq, n_kv, d)), jnp.float32
    )
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    out = paged_chunk_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table,
        chunk_lens=jnp.asarray(chunks, jnp.int32),
    )
    for b, (ln, ch) in enumerate(zip(lengths, chunks)):
        ref = _oracle_rows(q[b], dense_k[b], dense_v[b], ln, ch, sq, 1)
        np.testing.assert_allclose(
            np.asarray(out[b, :ch]), np.asarray(ref[:ch]),
            atol=2e-5, rtol=1e-4, err_msg=f"b={b}",
        )
        np.testing.assert_array_equal(np.asarray(out[b, ch:]), 0.0)


def test_chunk_window_softcap_alibi():
    """Feature combos ride the same positions as decode."""
    from flash_attn_tpu.ops.attention import alibi_slopes

    rng = np.random.default_rng(3)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    sq, win, cap = 8, 150, 12.0
    lengths = [300, 450]
    batch = len(lengths)
    slopes = alibi_slopes(n_kv)
    q = jnp.asarray(
        rng.standard_normal((batch, sq, n_kv, d)) * 3.0, jnp.float32
    )
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    out = paged_chunk_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table,
        window_left=win, softcap=cap, alibi_slopes=slopes,
    )
    for b, ln in enumerate(lengths):
        t = jnp.arange(sq)[:, None]
        j = jnp.arange(ln)[None, :]
        qpos = ln - sq + t
        mask = (j <= qpos) & (j >= qpos - win)
        for hqi in range(n_kv):
            bias = (
                float(slopes[hqi]) * (j - qpos).astype(jnp.float32)
            )[None, None]
            ref = attention_ref(
                q[b, :, hqi][None, None],
                dense_k[b][hqi][None, None, :ln],
                dense_v[b][hqi][None, None, :ln],
                mask=mask[None, None], softcap=cap, bias=bias,
            )
            np.testing.assert_allclose(
                np.asarray(out[b, :, hqi]), np.asarray(ref[0, 0]),
                atol=2e-5, rtol=1e-4, err_msg=f"b={b} h={hqi}",
            )


def test_chunk_window_multiblock_liveness():
    """Regression: block liveness must use the FIRST chunk row's band
    floor. Shapes chosen so the first and last rows' band floors fall in
    DIFFERENT kv blocks (bk=1024 here): with the last-row bound the
    earlier block was skipped and early rows lost part of their band."""
    rng = np.random.default_rng(10)
    n_kv, d, page_size = 2, 64, 128
    num_pages, pages_per_seq = 32, 17
    sq, ln, win = 8, 2060, 1034  # floors: first 1018 (blk 0), last 1025 (blk 1)
    q = jnp.asarray(rng.standard_normal((1, sq, n_kv, d)), jnp.float32)
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, 1, [ln], pages_per_seq
    )
    out = paged_chunk_attention(
        q, k_pages, v_pages, jnp.asarray([ln], jnp.int32), table,
        window_left=win,
    )
    t = jnp.arange(sq)[:, None]
    j = jnp.arange(ln)[None, :]
    qpos = ln - sq + t
    mask = (j <= qpos) & (j >= qpos - win)
    for h in range(n_kv):
        ref = attention_ref(
            q[0, :, h][None, None],
            dense_k[0][h][None, None, :ln],
            dense_v[0][h][None, None, :ln],
            mask=mask[None, None],
        )
        np.testing.assert_allclose(
            np.asarray(out[0, :, h]), np.asarray(ref[0, 0]),
            atol=2e-5, rtol=1e-4, err_msg=f"h={h}",
        )


def test_chunk_quantized_int8():
    rng = np.random.default_rng(4)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 8, 4
    sq = 8
    lengths = [200, 400]
    batch = len(lengths)
    q = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    k_pages, v_pages, table, _, _ = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    kq, ks = qz.quantize_pages(k_pages, "int8")
    vq, vs = qz.quantize_pages(v_pages, "int8")
    out = paged_chunk_attention(
        q, kq, vq, jnp.asarray(lengths, jnp.int32), table, ks, vs
    )
    # Oracle: dense attention over the DEQUANTIZED pages.
    kd = qz.dequantize_pages(kq, ks)
    vd = qz.dequantize_pages(vq, vs)
    for b, ln in enumerate(lengths):
        ids = np.asarray(table[b])[: (ln + page_size - 1) // page_size]
        dk = jnp.concatenate([kd[:, i] for i in ids], axis=1)[:, :ln]
        dv = jnp.concatenate([vd[:, i] for i in ids], axis=1)[:, :ln]
        ref = _oracle_rows(q[b], dk, dv, ln, sq, sq, 1)
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), atol=5e-4, rtol=1e-3,
            err_msg=f"b={b}",
        )


def test_chunk_qk_int8_on_quantized_cache():
    """qk_quant='int8': q quantized per token, dotted int8-vs-int8
    against the cache payload. Oracle: dense attention over the
    DEQUANTIZED pages (q quantization adds its own ~1% error)."""
    rng = np.random.default_rng(9)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 8, 4
    sq = 8
    lengths = [200, 400]
    batch = len(lengths)
    q = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    k_pages, v_pages, table, _, _ = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    kq, ks = qz.quantize_pages(k_pages, "int8")
    vq, vs = qz.quantize_pages(v_pages, "int8")
    out = paged_chunk_attention(
        q, kq, vq, jnp.asarray(lengths, jnp.int32), table, ks, vs,
        qk_quant="int8",
    )
    kd = qz.dequantize_pages(kq, ks)
    vd = qz.dequantize_pages(vq, vs)
    for b, ln in enumerate(lengths):
        ids = np.asarray(table[b])[: (ln + page_size - 1) // page_size]
        dk = jnp.concatenate([kd[:, i] for i in ids], axis=1)[:, :ln]
        dv = jnp.concatenate([vd[:, i] for i in ids], axis=1)[:, :ln]
        ref = _oracle_rows(q[b], dk, dv, ln, sq, sq, 1)
        err = float(jnp.max(jnp.abs(out[b] - ref)))
        assert err < 0.06, (b, err)
    # Requires a quantized cache:
    with pytest.raises(ValueError, match="quantized"):
        paged_chunk_attention(
            q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table,
            qk_quant="int8",
        )


def test_flash_attn_with_kvcache_end_to_end():
    """Prefix in cache + new chunk appended: the chunk's rows must equal
    the last rows of full dense causal attention over prefix+chunk."""
    from flash_attn_tpu import flash_attention

    rng = np.random.default_rng(5)
    n_kv, d, page_size, num_pages = 2, 64, 128, 8
    prefix, sq = 150, 8
    batch = 2
    cache = init_cache(n_kv, num_pages, page_size, d, dtype=jnp.float32)
    table = jnp.asarray(
        [[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32
    )  # page 0 reserved scratch
    pk = jnp.asarray(
        rng.standard_normal((batch, prefix, n_kv, d)), jnp.float32
    )
    pv = jnp.asarray(
        rng.standard_normal((batch, prefix, n_kv, d)), jnp.float32
    )
    zero = jnp.zeros((batch,), jnp.int32)
    cache = append_chunk(cache, pk, pv, table, zero)

    q = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    nk = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    out, cache2 = flash_attn_with_kvcache(
        q, cache, table, jnp.full((batch,), prefix, jnp.int32), nk, nv
    )

    # Dense oracle: full causal attention where the chunk queries sit at
    # the tail of prefix+chunk. Queries before the chunk don't matter —
    # use the chunk q at rows [prefix, prefix+sq).
    full_k = jnp.concatenate([pk, nk], axis=1)
    full_v = jnp.concatenate([pv, nv], axis=1)
    qs = jnp.zeros((batch, prefix + sq, n_kv, d), jnp.float32)
    qs = qs.at[:, prefix:].set(q)
    ref = flash_attention(qs, full_k, full_v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[:, prefix:]), atol=2e-5, rtol=1e-4
    )

    # And the cache now holds the appended chunk: a follow-up 1-token
    # decode against cache2 equals the dense next-step attention.
    q1 = jnp.asarray(rng.standard_normal((batch, n_kv, d)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((batch, n_kv, d)), jnp.float32)
    v1 = jnp.asarray(rng.standard_normal((batch, n_kv, d)), jnp.float32)
    out1, cache3 = flash_attn_with_kvcache(
        q1[:, None], cache2, table,
        jnp.full((batch,), prefix + sq, jnp.int32),
        k1[:, None], v1[:, None],
    )
    full_k = jnp.concatenate([full_k, k1[:, None]], axis=1)
    full_v = jnp.concatenate([full_v, v1[:, None]], axis=1)
    qs = jnp.zeros((batch, prefix + sq + 1, n_kv, d), jnp.float32)
    qs = qs.at[:, -1:].set(q1[:, None])
    ref = flash_attention(qs, full_k, full_v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(ref[:, -1:]), atol=2e-5, rtol=1e-4
    )


def test_append_span_quantized_matches_token_appends():
    """append_span on an int8 cache: one RMW per touched page must leave
    the cache bit-identical to sequential per-token appends."""
    from flash_attn_tpu.serving.cache import append_token

    rng = np.random.default_rng(12)
    n_kv, d, page_size, num_pages = 2, 64, 128, 8
    batch, sq = 2, 20
    lengths = jnp.asarray([100, 250], jnp.int32)  # mid-page starts
    new_lens = jnp.asarray([20, 7], jnp.int32)  # ragged; row 0 crosses a page
    table = jnp.asarray([[1, 2, 0, 0], [3, 4, 5, 0]], jnp.int32)
    nk = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    cache0 = init_cache(
        n_kv, num_pages, page_size, d, quantization="int8"
    )
    got = append_chunk(cache0, nk, nv, table, lengths, new_lens)
    want = cache0
    for t in range(sq):
        eff = jnp.where(t < new_lens, lengths + t, -1)
        want = append_token(want, nk[:, t], nv[:, t], table, eff)
    # Page 0 is the reserved scratch page: per-token appends dump the
    # padding rows there while the span write (correctly) writes nothing
    # — compare the real pages only.
    np.testing.assert_array_equal(
        np.asarray(got.k_pages)[:, 1:], np.asarray(want.k_pages)[:, 1:]
    )
    np.testing.assert_array_equal(
        np.asarray(got.v_pages)[:, 1:], np.asarray(want.v_pages)[:, 1:]
    )
    np.testing.assert_allclose(
        np.asarray(got.k_scales)[:, 1:], np.asarray(want.k_scales)[:, 1:],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.v_scales)[:, 1:], np.asarray(want.v_scales)[:, 1:],
        rtol=1e-6,
    )


def test_flash_attn_with_kvcache_rotary():
    """apply_rotary=True rotates q and new k at their global cache
    positions — equivalent to pre-rotating by hand."""
    from flash_attn_tpu.ops.rotary import apply_rotary_at_positions

    rng = np.random.default_rng(7)
    n_kv, d, page_size, num_pages = 2, 64, 128, 8
    prefix, sq = 100, 8
    batch = 1
    cache = init_cache(n_kv, num_pages, page_size, d, dtype=jnp.float32)
    table = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    pk = jnp.asarray(
        rng.standard_normal((batch, prefix, n_kv, d)), jnp.float32
    )
    pv = jnp.asarray(
        rng.standard_normal((batch, prefix, n_kv, d)), jnp.float32
    )
    cache = append_chunk(cache, pk, pv, table, jnp.zeros((batch,), jnp.int32))

    q = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    nk = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((batch, sq, n_kv, d)), jnp.float32)
    seqlens = jnp.full((batch,), prefix, jnp.int32)

    cache_a = jax.tree_util.tree_map(lambda x: x, cache)
    out_rot, _ = flash_attn_with_kvcache(
        q, cache_a, table, seqlens, nk, nv, apply_rotary=True
    )
    # Manual: rotate at positions prefix..prefix+sq-1, then plain call.
    pos = (prefix + jnp.arange(sq, dtype=jnp.int32))[None, :, None]
    q_r = apply_rotary_at_positions(q, pos)
    k_r = apply_rotary_at_positions(nk, pos)
    cache_b = jax.tree_util.tree_map(lambda x: x, cache)
    out_ref, _ = flash_attn_with_kvcache(
        q_r, cache_b, table, seqlens, k_r, nv
    )
    np.testing.assert_allclose(
        np.asarray(out_rot), np.asarray(out_ref), atol=1e-6, rtol=1e-6
    )


def test_flash_attn_with_kvcache_no_append():
    """k/v omitted: the chunk's K/V must already be resident; positions
    tail-align to cache_seqlens."""
    rng = np.random.default_rng(6)
    n_kv, d, page_size, num_pages = 2, 64, 128, 8
    total, sq = 100, 8
    cache = init_cache(n_kv, num_pages, page_size, d, dtype=jnp.float32)
    table = jnp.asarray([[1, 0, 0, 0]], jnp.int32)
    ks = jnp.asarray(rng.standard_normal((1, total, n_kv, d)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((1, total, n_kv, d)), jnp.float32)
    cache = append_chunk(cache, ks, vs, table, jnp.zeros((1,), jnp.int32))
    q = jnp.asarray(rng.standard_normal((1, sq, n_kv, d)), jnp.float32)
    out, _ = flash_attn_with_kvcache(
        q, cache, table, jnp.asarray([total], jnp.int32)
    )
    mask = _tail_mask(total, sq, sq)[None, None]
    for h in range(n_kv):
        ref = attention_ref(
            q[0, :, h][None, None],
            jnp.transpose(ks[0, :, h][None], (0, 1, 2))[None],
            jnp.transpose(vs[0, :, h][None], (0, 1, 2))[None],
            mask=mask,
        )
        np.testing.assert_allclose(
            np.asarray(out[0, :, h]), np.asarray(ref[0, 0]),
            atol=2e-5, rtol=1e-4,
        )


def test_chunk_forced_head_slicing():
    """heads_per_slice < n_kv_heads: the sliced rsl/row-offset algebra,
    sliced alibi/qscale/ks indexing, and per-slice online-softmax updates
    never trigger at CI shapes via the auto-picker (every config fits one
    slice under the 2 MB budget) — force slicing and check (a) bitwise
    parity vs the unsliced kernel and (b) the dense oracle. Covers both
    the fp32 feature path (window+alibi+softcap+GQA) and the int8-QK
    quantized-cache path (qscale/ks slices)."""
    from flash_attn_tpu.ops.attention import alibi_slopes

    rng = np.random.default_rng(21)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    group, sq, win, cap = 2, 16, 150, 12.0
    lengths = [100, 512, 300]
    batch, n_q = len(lengths), n_kv * group
    slopes = alibi_slopes(n_q)
    q = jnp.asarray(
        rng.standard_normal((batch, sq, n_q, d)) * 2.0, jnp.float32
    )
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    lens = jnp.asarray(lengths, jnp.int32)
    kw = dict(window_left=win, softcap=cap, alibi_slopes=slopes)
    base = paged_chunk_attention(q, k_pages, v_pages, lens, table, **kw)
    sliced = paged_chunk_attention(
        q, k_pages, v_pages, lens, table, heads_per_slice=1, **kw
    )
    np.testing.assert_allclose(
        np.asarray(sliced), np.asarray(base), atol=1e-6, rtol=1e-6
    )
    for b, ln in enumerate(lengths):
        t = jnp.arange(sq)[:, None]
        j = jnp.arange(ln)[None, :]
        qpos = ln - sq + t
        mask = (j <= qpos) & (j >= qpos - win)
        for hqi in range(n_q):
            bias = (
                float(slopes[hqi]) * (j - qpos).astype(jnp.float32)
            )[None, None]
            ref = attention_ref(
                q[b, :, hqi][None, None],
                dense_k[b][hqi // group][None, None, :ln],
                dense_v[b][hqi // group][None, None, :ln],
                mask=mask[None, None], softcap=cap, bias=bias,
            )
            np.testing.assert_allclose(
                np.asarray(sliced[b, :, hqi]), np.asarray(ref[0, 0]),
                atol=2e-5, rtol=1e-4, err_msg=f"b={b} h={hqi}",
            )

    # int8-QK path: forced slicing must also slice qscale/ks correctly.
    kq, ksc = qz.quantize_pages(k_pages, "int8")
    vq, vsc = qz.quantize_pages(v_pages, "int8")
    base8 = paged_chunk_attention(
        q, kq, vq, lens, table, ksc, vsc, qk_quant="int8"
    )
    sliced8 = paged_chunk_attention(
        q, kq, vq, lens, table, ksc, vsc, qk_quant="int8",
        heads_per_slice=1,
    )
    np.testing.assert_allclose(
        np.asarray(sliced8), np.asarray(base8), atol=1e-6, rtol=1e-6
    )

    with pytest.raises(ValueError, match="heads_per_slice"):
        paged_chunk_attention(
            q, k_pages, v_pages, lens, table, heads_per_slice=3
        )


def test_chunk_kv_block_shrink_and_oversize_error():
    """VMEM-budget fallbacks in the launcher (kernels/chunk.py): when even
    heads_per_slice=1 exceeds the ~2 MB score-tile budget, pages_per_block
    halves instead of compiling toward a Mosaic VMEM OOM (here
    group*sq=2048 rows at page_size=128 forces bk 512 -> 256); past 4x the
    budget at pages_per_block=1 the launcher must raise, not compile."""
    rng = np.random.default_rng(33)
    n_kv, d, page_size = 1, 64, 128
    sq = 2048
    lengths = [sq]
    pages_per_seq = sq // page_size
    num_pages = pages_per_seq + 1
    q = jnp.asarray(
        rng.standard_normal((1, sq, n_kv, d)), jnp.float32
    )
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, 1, lengths, pages_per_seq
    )
    lens = jnp.asarray(lengths, jnp.int32)
    out = paged_chunk_attention(q, k_pages, v_pages, lens, table)
    # Whole cache = the chunk itself => plain causal attention.
    t = jnp.arange(sq)
    mask = (t[None, :] <= t[:, None])[None, None]
    ref = attention_ref(
        q[0, :, 0][None, None],
        dense_k[0][0][None, None],
        dense_v[0][0][None, None],
        mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(out[0, :, 0]), np.asarray(ref[0, 0]),
        atol=2e-5, rtol=1e-4,
    )

    # group=8 at sq=4096: one head slice needs 16 MB of score tile even at
    # pages_per_block=1 — must be a clear error, not a compile attempt.
    q_big = jnp.zeros((1, 4096, 8, d), jnp.float32)
    with pytest.raises(ValueError, match="chunk too large"):
        paged_chunk_attention(
            q_big, k_pages, v_pages,
            jnp.asarray([4096], jnp.int32),
            jnp.zeros((1, 32), jnp.int32),
        )
