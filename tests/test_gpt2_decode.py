"""GPT-2 decode path: teacher-forcing equality, serving engine, FP8-KV
perplexity delta (north-star numerics bar)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from flash_attn_tpu.models.gpt2_decode import decode_step, prefill
from flash_attn_tpu.serving.cache import init_cache, write_prompt
from flash_attn_tpu.serving.engine import ServingEngine


def _setup(dtype=jnp.float32):
    cfg = GPT2Config.tiny(dtype=dtype)
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    return cfg, model, params


def test_prefill_matches_forward():
    cfg, model, params = _setup()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 48)), jnp.int32)
    logits_full = model.apply(params, ids)
    logits_pre, ks, vs = prefill(params, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, -1]),
        atol=2e-4, rtol=1e-4,
    )
    assert len(ks) == cfg.n_layer and ks[0].shape == (2, 48, cfg.n_head,
                                                      cfg.n_embd // cfg.n_head)


@pytest.mark.parametrize("quantization", [None, "fp8_e4m3"])
def test_decode_matches_forward_teacher_forcing(quantization):
    """prefill + N decode steps must reproduce the full forward's logits."""
    cfg, model, params = _setup()
    rng = np.random.default_rng(2)
    prompt_len, n_decode = 40, 8
    total = prompt_len + n_decode
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, total)), jnp.int32)
    logits_full = model.apply(params, ids)  # (1, total, vocab)

    hd = cfg.n_embd // cfg.n_head
    page_size, pages = 128, 4
    caches = [
        init_cache(cfg.n_head, pages, page_size, hd, dtype=jnp.float32,
                   quantization=quantization)
        for _ in range(cfg.n_layer)
    ]
    logits_pre, ks, vs = prefill(params, cfg, ids[:, :prompt_len])
    page_ids = jnp.asarray([1], jnp.int32)
    for li in range(cfg.n_layer):
        caches[li] = write_prompt(caches[li], ks[li][0], vs[li][0], page_ids)
    table = jnp.asarray([[1, 2, 0, 0]], jnp.int32)

    tol = 2e-3 if quantization is None else 0.15
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, prompt_len - 1]),
        atol=2e-3, rtol=1e-3,
    )
    lengths = jnp.asarray([prompt_len], jnp.int32)
    for t in range(n_decode):
        logits, caches = decode_step(
            params, cfg, caches, table, lengths, ids[:, prompt_len + t]
        )
        ref = logits_full[:, prompt_len + t]
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref), atol=tol, rtol=tol,
            err_msg=f"decode step {t}",
        )
        lengths = lengths + 1


def test_fp8_kv_perplexity_delta():
    """North-star bar: FP8-KV decode perplexity within 0.05 of bf16
    (BASELINE.json), measured by teacher-forcing NLL over decode steps."""
    cfg, model, params = _setup()
    rng = np.random.default_rng(3)
    prompt_len, n_decode = 32, 32
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (1, prompt_len + n_decode)), jnp.int32
    )
    hd = cfg.n_embd // cfg.n_head

    def run(quantization):
        caches = [
            init_cache(cfg.n_head, 4, 128, hd, dtype=jnp.float32,
                       quantization=quantization)
            for _ in range(cfg.n_layer)
        ]
        _, ks, vs = prefill(params, cfg, ids[:, :prompt_len])
        for li in range(cfg.n_layer):
            caches[li] = write_prompt(
                caches[li], ks[li][0], vs[li][0], jnp.asarray([1], jnp.int32)
            )
        table = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
        lengths = jnp.asarray([prompt_len], jnp.int32)
        nll = 0.0
        for t in range(n_decode - 1):
            logits, caches = decode_step(
                params, cfg, caches, table, lengths, ids[:, prompt_len + t]
            )
            logp = jax.nn.log_softmax(logits[0])
            nll -= float(logp[int(ids[0, prompt_len + t + 1])])
            lengths = lengths + 1
        return nll / (n_decode - 1)

    ppl_ref = float(np.exp(run(None)))
    ppl_fp8 = float(np.exp(run("fp8_e4m3")))
    assert abs(ppl_fp8 - ppl_ref) < 0.05 * ppl_ref + 0.05, (ppl_ref, ppl_fp8)


def test_serving_engine_continuous_batching():
    cfg, model, params = _setup()
    engine = ServingEngine(
        params, cfg, max_batch=3, num_pages=32, page_size=128,
        pages_per_seq=2,
    )
    rng = np.random.default_rng(4)
    ids = [
        list(rng.integers(0, cfg.vocab_size, size=n))
        for n in (20, 35, 11, 28, 5)
    ]
    for p in ids:
        engine.submit(p, max_new_tokens=6)
    finished = engine.run(max_steps=200)
    assert len(finished) == 5
    for req in finished:
        assert len(req.generated) == 6
        assert all(0 <= t < cfg.vocab_size for t in req.generated)

    # engine generations must match a straight-line reference decode
    req = finished[0]
    full = list(ids[0])
    model_ids = jnp.asarray(full, jnp.int32)[None]
    gen_ref = []
    for _ in range(6):
        logits = model.apply(params, model_ids)
        tok = int(jnp.argmax(logits[0, -1]))
        gen_ref.append(tok)
        model_ids = jnp.concatenate(
            [model_ids, jnp.asarray([[tok]], jnp.int32)], axis=1
        )
    assert req.generated == gen_ref, (req.generated, gen_ref)


def test_serving_engine_sampling():
    """Temperature/top-k sampling: valid tokens, deterministic per engine
    seed, different across seeds."""
    cfg, model, params = _setup()
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (12, 30)]

    def run(seed):
        engine = ServingEngine(
            params, cfg, max_batch=2, num_pages=16, page_size=128,
            pages_per_seq=2, temperature=0.8, top_k=20, sample_seed=seed,
        )
        for p in prompts:
            engine.submit(p, max_new_tokens=5)
        return [r.generated for r in engine.run(max_steps=50)]

    a, b = run(0), run(0)
    assert a == b  # deterministic for a fixed seed
    c = run(1)
    assert a != c  # seed changes the samples
    for gens in a:
        assert len(gens) == 5
        assert all(0 <= t < cfg.vocab_size for t in gens)


def test_serving_engine_batched_admission_matches_reference():
    """Several prompts admitted in ONE bucketed prefill batch must still
    reproduce the straight-line greedy decode per request."""
    cfg, model, params = _setup()
    rng = np.random.default_rng(8)
    prompts = [
        list(rng.integers(0, cfg.vocab_size, size=n)) for n in (9, 25, 17)
    ]
    engine = ServingEngine(
        params, cfg, max_batch=4, num_pages=32, page_size=128,
        pages_per_seq=2,
    )
    for p in prompts:
        engine.submit(p, max_new_tokens=4)
    finished = engine.run(max_steps=60)
    assert len(finished) == 3
    by_id = {r.seq_id: r for r in finished}
    for i, prompt in enumerate(prompts):
        model_ids = jnp.asarray(prompt, jnp.int32)[None]
        gen_ref = []
        for _ in range(4):
            logits = model.apply(params, model_ids)
            tok = int(jnp.argmax(logits[0, -1]))
            gen_ref.append(tok)
            model_ids = jnp.concatenate(
                [model_ids, jnp.asarray([[tok]], jnp.int32)], axis=1
            )
        assert by_id[i].generated == gen_ref, (i, by_id[i].generated, gen_ref)


def test_serving_engine_chunked_prefill_matches_reference():
    """prefill_chunk=128: prompts longer than one chunk are admitted in
    page-aligned chunks through the multi-token paged kernel, and greedy
    generations must still match the straight-line decode exactly."""
    cfg, model, params = _setup()
    rng = np.random.default_rng(9)
    # Spans 1, 2, and 2 chunks; one prompt ends exactly on a chunk edge.
    prompts = [
        list(rng.integers(0, cfg.vocab_size, size=n))
        for n in (40, 150, 128)
    ]
    engine = ServingEngine(
        params, cfg, max_batch=4, num_pages=32, page_size=128,
        pages_per_seq=2, prefill_chunk=128,
    )
    for p in prompts:
        engine.submit(p, max_new_tokens=4)
    finished = engine.run(max_steps=60)
    assert len(finished) == 3
    by_id = {r.seq_id: r for r in finished}
    for i, prompt in enumerate(prompts):
        model_ids = jnp.asarray(prompt, jnp.int32)[None]
        gen_ref = []
        for _ in range(4):
            logits = model.apply(params, model_ids)
            tok = int(jnp.argmax(logits[0, -1]))
            gen_ref.append(tok)
            model_ids = jnp.concatenate(
                [model_ids, jnp.asarray([[tok]], jnp.int32)], axis=1
            )
        assert by_id[i].generated == gen_ref, (i, by_id[i].generated, gen_ref)


def test_serving_engine_chunked_prefill_windowed():
    """Chunked prefill composes with sliding-window configs: the chunk
    kernel's window masks on global positions, so generations match the
    single-shot windowed engine token-for-token."""
    cfg = GPT2Config.tiny(dtype=jnp.float32, window=96)
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(10)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    prompt = list(rng.integers(0, cfg.vocab_size, size=180))

    def run(chunk):
        eng = ServingEngine(
            params, cfg, max_batch=2, num_pages=16, page_size=128,
            pages_per_seq=2, prefill_chunk=chunk,
            stream_free_pages=False,
        )
        eng.submit(prompt, max_new_tokens=4)
        return eng.run(max_steps=20)[0].generated

    assert run(None) == run(128)


def test_engine_bucket_clamped_to_max_positions():
    """A 128-rounded prefill bucket must clamp to max_position_embeddings
    (e.g. max_pos=192 with a 150-token prompt must not build a 256 bucket)."""
    cfg = GPT2Config.tiny(max_position_embeddings=192)
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 32)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    engine = ServingEngine(
        params, cfg, max_batch=2, num_pages=8, page_size=128, pages_per_seq=2,
    )
    prompt = list(rng.integers(0, cfg.vocab_size, size=150))
    engine.submit(prompt, max_new_tokens=2)
    finished = engine.run(max_steps=10)
    assert len(finished) == 1 and len(finished[0].generated) == 2


def test_serving_engine_quantized_kv():
    """Continuous batching with an fp8 KV cache through the batched
    admission path (quantized write_prompt inside the fused _write_all)."""
    cfg, model, params = _setup()
    engine = ServingEngine(
        params, cfg, max_batch=2, num_pages=16, page_size=128,
        pages_per_seq=2, kv_quantization="fp8_e4m3",
    )
    rng = np.random.default_rng(12)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (18, 40)]
    for p in prompts:
        engine.submit(p, max_new_tokens=4)
    finished = engine.run(max_steps=40)
    assert len(finished) == 2
    # fp8 logits drift slightly; tokens must at least be valid and the
    # FIRST token (computed from the exact prefill) must match greedy ref.
    for req, prompt in zip(sorted(finished, key=lambda r: r.seq_id), prompts):
        assert len(req.generated) == 4
        assert all(0 <= t < cfg.vocab_size for t in req.generated)
        logits = model.apply(params, jnp.asarray(prompt, jnp.int32)[None])
        assert req.generated[0] == int(jnp.argmax(logits[0, -1]))


def test_engine_submit_rejects_oversized_prompt():
    """Capacity validation happens in submit(), BEFORE any allocator
    state changes: a mid-_admit failure would leak peers' pages and lose
    requests (advisor finding r2)."""
    import pytest

    cfg, model, params = _setup()
    engine = ServingEngine(
        params, cfg, max_batch=2, num_pages=32, page_size=128,
        pages_per_seq=2,  # capacity = 256 tokens (incl. generated)
    )
    rng = np.random.default_rng(9)
    ok = list(rng.integers(0, cfg.vocab_size, size=10))
    with pytest.raises(ValueError, match="exceeds engine capacity"):
        engine.submit(list(rng.integers(0, cfg.vocab_size, size=256)))
    with pytest.raises(ValueError, match="empty prompt"):
        engine.submit([])
    # A rejected submit must not poison the engine: normal requests
    # still admit and run through the same batch.
    engine.submit(ok, max_new_tokens=3)
    finished = engine.run(max_steps=50)
    assert len(finished) == 1 and len(finished[0].generated) == 3


def test_engine_preempts_on_page_exhaustion():
    """Decode-time page growth under a tight pool: the engine preempts
    the youngest sequence (recompute on re-admission) instead of
    crashing, and greedy outputs still match the straight-line decode."""
    cfg, model, params = _setup()
    rng = np.random.default_rng(11)
    prompts = [
        list(rng.integers(0, cfg.vocab_size, size=120)) for _ in range(2)
    ]
    # capacity 3 pages: both prompts fit (1 page each) but both crossing
    # the 128 boundary needs 4 pages total -> one preemption must occur.
    engine = ServingEngine(
        params, cfg, max_batch=2, num_pages=4, page_size=128,
        pages_per_seq=2,
    )
    for p in prompts:
        engine.submit(p, max_new_tokens=16)
    finished = engine.run(max_steps=200)
    assert len(finished) == 2
    by_id = {r.seq_id: r for r in finished}
    for i, prompt in enumerate(prompts):
        model_ids = jnp.asarray(prompt, jnp.int32)[None]
        gen_ref = []
        for _ in range(16):
            logits = model.apply(params, model_ids)
            tok = int(jnp.argmax(logits[0, -1]))
            gen_ref.append(tok)
            model_ids = jnp.concatenate(
                [model_ids, jnp.asarray([[tok]], jnp.int32)], axis=1
            )
        assert by_id[i].generated == gen_ref, (
            i, by_id[i].generated, gen_ref,
        )


def test_engine_rejects_pool_below_one_sequence():
    """The __init__ capacity invariant: a pool that cannot hold even one
    full sequence would let decode-time growth deadlock — reject it."""
    cfg, _, params = _setup()
    cfg = GPT2Config.tiny(dtype=jnp.float32, max_position_embeddings=1024)
    model = GPT2LMHeadModel(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 64)),
        jnp.int32,
    )
    params = model.init(jax.random.PRNGKey(0), ids)
    with pytest.raises(ValueError, match="cannot hold even one"):
        ServingEngine(
            params, cfg, max_batch=2, num_pages=4, page_size=128,
            pages_per_seq=8,
        )


def test_engine_streaming_window_frees_pages():
    """Streaming sliding-window serving: with cfg.window, pages that fell
    out of the band return to the pool MID-FLIGHT, and freeing must not
    change any generated token (dead pages are fully masked in decode)."""
    cfg = GPT2Config.tiny(dtype=jnp.float32, window=32)
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(13)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    prompt = list(rng.integers(0, cfg.vocab_size, size=200))

    results = {}
    for free in (False, True):
        engine = ServingEngine(
            params, cfg, max_batch=2, num_pages=16, page_size=128,
            pages_per_seq=2, stream_free_pages=free,
        )
        engine.submit(prompt, max_new_tokens=12)
        engine.step()  # admit + first decode
        mid_free = engine.alloc.free_pages
        finished = engine.run(max_steps=40)
        assert len(finished) == 1 and len(finished[0].generated) == 12
        results[free] = (mid_free, finished[0].generated)

    # Prompt of 200 @ window 32: page 0 (positions 0..127) is dead from
    # the first decode, so the streaming engine holds one page fewer.
    assert results[True][0] == results[False][0] + 1
    # ...without changing a single token.
    assert results[True][1] == results[False][1]


def test_windowed_decode_matches_forward_teacher_forcing():
    """cfg.window threads through FlashMHA (full forward), prefill, and
    the paged rolling-KV decode — all three must agree."""
    cfg = GPT2Config.tiny(dtype=jnp.float32, window=16)
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(6)
    prompt_len, n_decode = 40, 8
    total = prompt_len + n_decode
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, total)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits_full = model.apply(params, ids)

    hd = cfg.n_embd // cfg.n_head
    page_size, pages = 128, 4
    caches = [
        init_cache(cfg.n_head, pages, page_size, hd, dtype=jnp.float32)
        for _ in range(cfg.n_layer)
    ]
    logits_pre, ks, vs = prefill(params, cfg, ids[:, :prompt_len])
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, prompt_len - 1]),
        atol=2e-3, rtol=1e-3,
    )
    page_ids = jnp.asarray([1], jnp.int32)
    for li in range(cfg.n_layer):
        caches[li] = write_prompt(caches[li], ks[li][0], vs[li][0], page_ids)
    table = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    lengths = jnp.asarray([prompt_len], jnp.int32)
    for t in range(n_decode):
        logits, caches = decode_step(
            params, cfg, caches, table, lengths, ids[:, prompt_len + t]
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_full[:, prompt_len + t]),
            atol=2e-3, rtol=1e-3, err_msg=f"windowed decode step {t}",
        )
        lengths = lengths + 1
