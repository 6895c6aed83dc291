"""Paged decode attention + quantized KV cache tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.decode import paged_decode_attention
from flash_attn_tpu.reference import attention_ref
from flash_attn_tpu.serving import quantization as qz
from flash_attn_tpu.serving.cache import (
    PageAllocator,
    append_token,
    init_cache,
    write_prompt,
)


def _build_paged(rng, n_kv_heads, num_pages, page_size, d, batch, lengths,
                 pages_per_seq):
    """Random paged cache + the dense per-sequence K/V it represents."""
    k_pages = jnp.asarray(
        rng.standard_normal((n_kv_heads, num_pages, page_size, d)),
        jnp.float32,
    )
    v_pages = jnp.asarray(
        rng.standard_normal((n_kv_heads, num_pages, page_size, d)),
        jnp.float32,
    )
    table = np.zeros((batch, pages_per_seq), np.int32)
    used = iter(rng.permutation(num_pages))
    dense_k, dense_v = [], []
    for b, ln in enumerate(lengths):
        n = (ln + page_size - 1) // page_size
        ids = [next(used) for _ in range(n)]
        table[b, :n] = ids
        kk = jnp.concatenate([k_pages[:, i] for i in ids], axis=1)[:, :ln]
        vv = jnp.concatenate([v_pages[:, i] for i in ids], axis=1)[:, :ln]
        dense_k.append(kk)  # (h, ln, d)
        dense_v.append(vv)
    return k_pages, v_pages, jnp.asarray(table), dense_k, dense_v


@pytest.mark.parametrize("group", [1, 4])
def test_paged_decode_matches_oracle(group):
    rng = np.random.default_rng(0)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    lengths = [100, 512, 1]
    batch = len(lengths)
    n_q = n_kv * group
    q = jnp.asarray(rng.standard_normal((batch, n_q, d)), jnp.float32)
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    out = paged_decode_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table
    )
    assert out.shape == (batch, n_q, d)
    for b, ln in enumerate(lengths):
        for hq in range(n_q):
            hk = hq // group
            ref = attention_ref(
                q[b, hq][None, None, None],  # (1,1,1,d)
                dense_k[b][hk][None, None],
                dense_v[b][hk][None, None],
            )
            np.testing.assert_allclose(
                np.asarray(out[b, hq]), np.asarray(ref[0, 0, 0]),
                atol=2e-5, rtol=1e-4, err_msg=f"b={b} hq={hq}",
            )


@pytest.mark.parametrize("method", ["int8", "fp8_e4m3", "fp8_e5m2"])
def test_paged_decode_quantized(method):
    rng = np.random.default_rng(1)
    n_kv, d, page_size, num_pages = 2, 64, 128, 8
    lengths = [200, 384]
    batch = len(lengths)
    q = jnp.asarray(rng.standard_normal((batch, n_kv, d)), jnp.float32)
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, 3
    )
    kq, ks = qz.quantize_pages(k_pages, method)
    vq, vs = qz.quantize_pages(v_pages, method)
    out = paged_decode_attention(
        q, kq, vq, jnp.asarray(lengths, jnp.int32), table,
        k_scales=ks, v_scales=vs,
    )
    # reference on the DEQUANTIZED cache (isolates kernel error from
    # quantization error)
    kd = qz.dequantize_pages(kq, ks)
    vd = qz.dequantize_pages(vq, vs)
    out_deq = paged_decode_attention(
        q, kd, vd, jnp.asarray(lengths, jnp.int32), table
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_deq), atol=2e-4, rtol=1e-3
    )
    # and quantization error itself is bounded
    out_exact = paged_decode_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table
    )
    err = float(jnp.max(jnp.abs(out - out_exact)))
    assert err < (0.1 if method == "int8" else 0.2), err


def test_write_prompt_and_append_roundtrip():
    rng = np.random.default_rng(2)
    n_kv, d, page_size, num_pages = 2, 32, 128, 8
    cache = init_cache(n_kv, num_pages, page_size, d, dtype=jnp.float32)
    prompt_len = 150
    k = jnp.asarray(rng.standard_normal((prompt_len, n_kv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((prompt_len, n_kv, d)), jnp.float32)
    page_ids = jnp.asarray([3, 5], jnp.int32)
    cache = write_prompt(cache, k, v, page_ids)
    got = jnp.concatenate([cache.k_pages[:, 3], cache.k_pages[:, 5]], axis=1)
    np.testing.assert_allclose(
        np.asarray(got[:, :prompt_len]),
        np.asarray(jnp.transpose(k, (1, 0, 2))),
        atol=1e-6,
    )
    # append two tokens
    table = jnp.asarray([[3, 5, 0]], jnp.int32)
    for i in range(2):
        nk = jnp.asarray(rng.standard_normal((1, n_kv, d)), jnp.float32)
        nv = jnp.asarray(rng.standard_normal((1, n_kv, d)), jnp.float32)
        cache = append_token(
            cache, nk, nv, table, jnp.asarray([prompt_len + i], jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(cache.k_pages[:, 5, (prompt_len + i) % page_size]),
            np.asarray(nk[0]),
            atol=1e-6,
        )


def test_append_quantized_consistency():
    """Token-wise appends must match whole-prompt quantized writes."""
    rng = np.random.default_rng(3)
    n_kv, d, page_size = 1, 32, 128
    cache_a = init_cache(n_kv, 4, page_size, d, quantization="int8")
    cache_b = init_cache(n_kv, 4, page_size, d, quantization="int8")
    n = 128
    k = jnp.asarray(rng.standard_normal((n, n_kv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, n_kv, d)), jnp.float32)
    cache_a = write_prompt(cache_a, k, v, jnp.asarray([1], jnp.int32))
    table = jnp.asarray([[1]], jnp.int32)
    for i in range(n):
        cache_b = append_token(
            cache_b, k[i][None], v[i][None], table,
            jnp.asarray([i], jnp.int32),
        )
    np.testing.assert_array_equal(
        np.asarray(cache_a.k_pages[:, 1]), np.asarray(cache_b.k_pages[:, 1])
    )
    np.testing.assert_allclose(
        np.asarray(cache_a.k_scales[:, 1]),
        np.asarray(cache_b.k_scales[:, 1]),
        rtol=1e-6,
    )


def test_page_allocator():
    # num_pages=7 with the default reserved=1 -> 6 allocatable pages;
    # page 0 is append_token's inactive-slot scratch and never handed out.
    alloc = PageAllocator(num_pages=7, page_size=128, pages_per_seq=3)
    p0 = alloc.alloc(0, 200)  # 2 pages
    assert len(p0) == 2 and alloc.free_pages == 4
    assert 0 not in p0
    p1 = alloc.alloc(1, 100)
    assert len(p1) == 1 and 0 not in p1
    new = alloc.extend(0, 300)  # needs a 3rd page
    assert new is not None
    assert alloc.extend(0, 300) is None  # already covered
    row = alloc.table_row(0)
    assert len(row) == 3
    alloc.release(0)
    assert alloc.free_pages == 5
    assert alloc.can_admit(600)  # 5 pages free
    # but 600 tokens need 5 pages > pages_per_seq=3 -> alloc refuses
    import pytest as _pytest

    with _pytest.raises(ValueError):
        alloc.alloc(2, 600)


def test_page_allocator_release_range():
    # Streaming-window reclamation: free a live sequence's dead logical
    # pages; placeholders keep logical indexing stable.
    alloc = PageAllocator(num_pages=9, page_size=128, pages_per_seq=4)
    pages = alloc.alloc(0, 450)  # 4 pages
    assert alloc.free_pages == 4
    assert alloc.release_range(0, 1, 3) == 2  # free logical pages 1, 2
    assert alloc.free_pages == 6
    row = alloc.table_row(0)
    assert row[0] == pages[0] and row[3] == pages[3]
    assert row[1] == 0 and row[2] == 0  # placeholders
    # idempotent: already-freed slots are skipped
    assert alloc.release_range(0, 0, 3) == 1  # only page 0 left to free
    assert alloc.free_pages == 7
    # extend still counts logical pages: 500 tokens need 4 pages and the
    # placeholder slots still count, so no new page is assigned
    assert alloc.extend(0, 500) is None
    # release at retirement must not double-free placeholders
    alloc.release(0)
    assert alloc.free_pages == 8


@pytest.mark.parametrize("window", [0, 64, 150, 2000])
def test_paged_decode_window(window):
    # Rolling-KV decode: the query at position ln-1 attends only keys at
    # pos >= ln-1-window; oracle = dense attention over the band slice.
    rng = np.random.default_rng(4)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    group = 2
    lengths = [100, 512, 1, 300]
    batch = len(lengths)
    n_q = n_kv * group
    q = jnp.asarray(rng.standard_normal((batch, n_q, d)), jnp.float32)
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    out = paged_decode_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table,
        window_left=window,
    )
    for b, ln in enumerate(lengths):
        lo = max(0, ln - 1 - window)
        for hq in range(n_q):
            hk = hq // group
            ref = attention_ref(
                q[b, hq][None, None, None],
                dense_k[b][hk][None, None, lo:ln],
                dense_v[b][hk][None, None, lo:ln],
            )
            np.testing.assert_allclose(
                np.asarray(out[b, hq]), np.asarray(ref[0, 0, 0]),
                atol=2e-5, rtol=1e-4, err_msg=f"b={b} hq={hq} w={window}",
            )


@pytest.mark.parametrize("window,sinks", [
    (64, 4),        # sinks well below the band
    (64, 130),      # sink region spans a block boundary (page_size=128)
    (400, 64),      # band overlaps the sink region for short seqs
    (64, 0),        # degenerate: sinks disabled
])
def test_paged_decode_window_sinks(window, sinks):
    # StreamingLLM attention sinks: visible keys are the first `sinks`
    # positions PLUS the rolling band; oracle = dense attention over the
    # gathered visible slice.
    rng = np.random.default_rng(10)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    group = 2
    lengths = [100, 512, 1, 300]
    batch = len(lengths)
    n_q = n_kv * group
    q = jnp.asarray(rng.standard_normal((batch, n_q, d)), jnp.float32)
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    out = paged_decode_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table,
        window_left=window, num_sinks=sinks,
    )
    for b, ln in enumerate(lengths):
        lo = max(0, ln - 1 - window)
        vis = np.asarray(
            [p for p in range(ln) if p < sinks or p >= lo], np.int32
        )
        for hq in range(n_q):
            hk = hq // group
            ref = attention_ref(
                q[b, hq][None, None, None],
                dense_k[b][hk][None, None, vis],
                dense_v[b][hk][None, None, vis],
            )
            np.testing.assert_allclose(
                np.asarray(out[b, hq]), np.asarray(ref[0, 0, 0]),
                atol=2e-5, rtol=1e-4,
                err_msg=f"b={b} hq={hq} w={window} sinks={sinks}",
            )


def test_paged_decode_alibi():
    """ALiBi decode: bias -slope*(q_pos - key_pos) with the query at
    position length-1; oracle = biased dense attention on the slice."""
    from flash_attn_tpu.ops.attention import alibi_slopes

    rng = np.random.default_rng(11)
    n_kv, d, page_size, num_pages, pages_per_seq = 2, 64, 128, 16, 4
    group = 2
    lengths = [100, 512, 1, 300]
    batch = len(lengths)
    n_q = n_kv * group
    slopes = alibi_slopes(n_q)
    q = jnp.asarray(rng.standard_normal((batch, n_q, d)), jnp.float32)
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, pages_per_seq
    )
    out = paged_decode_attention(
        q, k_pages, v_pages, jnp.asarray(lengths, jnp.int32), table,
        alibi_slopes=slopes,
    )
    for b, ln in enumerate(lengths):
        for hq in range(n_q):
            hk = hq // group
            bias = (
                -float(slopes[hq])
                * (ln - 1 - jnp.arange(ln, dtype=jnp.float32))
            )[None, None, None, :]  # (1,1,1,ln) broadcasting over sq=1
            ref = attention_ref(
                q[b, hq][None, None, None],
                dense_k[b][hk][None, None, :ln],
                dense_v[b][hk][None, None, :ln],
                bias=bias,
            )
            np.testing.assert_allclose(
                np.asarray(out[b, hq]), np.asarray(ref[0, 0, 0]),
                atol=2e-5, rtol=1e-4, err_msg=f"b={b} hq={hq}",
            )


def test_paged_decode_window_quantized():
    rng = np.random.default_rng(5)
    n_kv, d, page_size, num_pages = 2, 64, 128, 8
    lengths = [200, 384]
    window = 96
    batch = len(lengths)
    q = jnp.asarray(rng.standard_normal((batch, n_kv, d)), jnp.float32)
    k_pages, v_pages, table, dense_k, dense_v = _build_paged(
        rng, n_kv, num_pages, page_size, d, batch, lengths, 3
    )
    kq, ks = qz.quantize_pages(k_pages, "int8")
    vq, vs = qz.quantize_pages(v_pages, "int8")
    out = paged_decode_attention(
        q, kq, vq, jnp.asarray(lengths, jnp.int32), table,
        k_scales=ks, v_scales=vs, window_left=window,
    )
    kd = qz.dequantize_pages(kq, ks)
    vd = qz.dequantize_pages(vq, vs)
    for b, ln in enumerate(lengths):
        lo = max(0, ln - 1 - window)
        ids = np.asarray(table[b])
        kk = jnp.concatenate([kd[:, i] for i in ids], axis=1)[:, :ln]
        vv = jnp.concatenate([vd[:, i] for i in ids], axis=1)[:, :ln]
        for h in range(n_kv):
            ref = attention_ref(
                q[b, h][None, None, None],
                kk[h][None, None, lo:ln],
                vv[h][None, None, lo:ln],
            )
            np.testing.assert_allclose(
                np.asarray(out[b, h]), np.asarray(ref[0, 0, 0]),
                atol=3e-5, rtol=1e-4, err_msg=f"b={b} h={h}",
            )
