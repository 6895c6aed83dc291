"""Continuous-batching serving engine for GPT-2 (north-star config #5).

Host-side scheduler + device-side jitted steps:

  - requests queue; admission whenever a batch slot AND enough cache pages
    are free (paged allocator, serving/cache.py)
  - prefill: BATCHED — every admissible pending request in one bucketed
    call (prompts padded to a shared 128-multiple bucket, batch padded to
    a power of two so jit variants stay bounded); K/V written into each
    request's pages with the page-granular aliased kernel
    (serving/cache.py write_prompt)
  - decode: ALL active slots advance one token per engine step through the
    paged decode kernel (inactive slots are masked and pointed at the
    reserved scratch page 0)
  - sampling: greedy (temperature=0), or temperature softmax sampling with
    optional top-k truncation; deterministic per (engine seed, step)
  - sequences retire on EOS / max tokens

The KV cache is bf16 or quantized (int8 / fp8_e4m3) — the decode kernel
dequantizes in-kernel (BASELINE north star: FP8 KV-cache serving).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt2 import GPT2Config
from flash_attn_tpu.serving.cache import (
    PageAllocator,
    init_cache,
    write_prompt,
)


@dataclasses.dataclass
class Request:
    seq_id: int
    prompt: list[int]
    max_new_tokens: int
    generated: list[int] = dataclasses.field(default_factory=list)
    done: bool = False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _next_pow2(x):
    n = 1
    while n < x:
        n *= 2
    return n


class ServingEngine:
    def __init__(
        self,
        params,
        cfg: GPT2Config,
        *,
        max_batch: int = 8,
        num_pages: int = 128,
        page_size: int = 128,
        pages_per_seq: int = 16,
        kv_quantization: Optional[str] = None,  # None | 'int8' | 'fp8_e4m3'
        eos_token: Optional[int] = None,
        temperature: float = 0.0,  # 0 = greedy argmax
        top_k: Optional[int] = None,  # with temperature > 0
        sample_seed: int = 0,
        stream_free_pages: bool = True,
        prefill_chunk: Optional[int] = None,
        model_fns=None,
    ):
        # Model adapter: any module/namespace exposing the three serving-
        # phase functions with gpt2_decode's signatures — prefill(p, cfg,
        # ids, lens), decode_step(p, cfg, caches, tbl, lens, toks), and
        # chunk_prefill_step(...). Defaults to GPT-2; pass
        # flash_attn_tpu.models.llama_decode (with a LlamaConfig) for the
        # Llama/Mistral family.
        if model_fns is None:
            from flash_attn_tpu.models import gpt2_decode as model_fns
        self.model_fns = model_fns
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        self.eos_token = eos_token
        self.temperature = float(temperature)
        self.top_k = top_k
        # Streaming sliding-window serving: with cfg.window set, KV pages
        # that fell out of the band (and are not sink pages) are returned
        # to the shared pool mid-flight — per-sequence live memory is
        # O(window + sinks), not O(context), raising effective capacity.
        self._stream_free = bool(stream_free_pages) and cfg.window is not None
        # Chunked prefill: admit prompts in fixed page-aligned chunks
        # through the multi-token paged kernel (kernels/chunk.py) instead
        # of one monolithic bucketed dispatch — bounds the jit-variant
        # count to ONE shape per batch bucket and caps per-dispatch
        # activation memory at O(batch * chunk) for arbitrarily long
        # prompts. None = single-shot prefill.
        if prefill_chunk is not None:
            if prefill_chunk <= 0 or prefill_chunk % page_size != 0:
                raise ValueError(
                    f"prefill_chunk must be a positive multiple of "
                    f"page_size={page_size}, got {prefill_chunk}"
                )
        self.prefill_chunk = prefill_chunk
        hd = getattr(cfg, "head_dim", cfg.n_embd // cfg.n_head)
        kv_heads = getattr(cfg, "n_kv_heads", cfg.n_head)
        self.caches = [
            init_cache(
                kv_heads, num_pages, page_size, hd,
                dtype=cfg.dtype, quantization=kv_quantization,
            )
            for _ in range(cfg.n_layer)
        ]
        self.alloc = PageAllocator(
            num_pages, page_size, pages_per_seq, reserved=1
        )
        # With the pool at least one full sequence deep, decode-time
        # growth always succeeds after preempting every other sequence —
        # the invariant the preemption path (step()) relies on.
        if self.alloc.capacity < min(
            pages_per_seq,
            -(-cfg.max_position_embeddings // page_size),
        ):
            raise ValueError(
                f"num_pages={num_pages} (capacity {self.alloc.capacity} "
                "after the reserved scratch page) cannot hold even one "
                f"full sequence (min(pages_per_seq={pages_per_seq}, "
                "ceil(max_position_embeddings/page_size)="
                f"{-(-cfg.max_position_embeddings // page_size)}) pages)"
            )
        self.page_table = np.zeros((max_batch, pages_per_seq), np.int32)
        self.lengths = np.full((max_batch,), -1, np.int32)  # -1 = free slot
        self.next_token = np.zeros((max_batch,), np.int32)
        self.slot_req: dict[int, Request] = {}
        self.pending: list[Request] = []
        self.finished: list[Request] = []
        self._next_id = 0
        self._base_key = jax.random.PRNGKey(sample_seed)
        self._step_count = 0

        # params must be a jit *argument*, not a closure constant:
        # jit inlines closure constants into the HLO (hundreds of MB for a
        # real model, which overflows compile-request limits and bloats the
        # executable).
        cfg_ = self.cfg
        mfns = self.model_fns
        self._prefill = functools.partial(
            jax.jit(
                lambda p, ids, lens: mfns.prefill(p, cfg_, ids, lens)
            ),
            self.params,
        )
        self._decode = functools.partial(
            jax.jit(
                lambda p, caches, tbl, lens, toks: mfns.decode_step(
                    p, cfg_, caches, tbl, lens, toks
                ),
                # Donate the caches: the scatter appends update the pages
                # in place instead of copying the whole KV cache per step.
                donate_argnums=(1,),
            ),
            self.params,
        )
        n_layer = cfg.n_layer

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _write_all(caches, ks, vs, page_tbl):
            """All admitted sequences' pages for ALL layers in one
            dispatch (each eager write_prompt call through the tunnel
            costs an RTT; 12 layers x batch would multiply TTFT ~100x).
            page_tbl rows are padded with the reserved scratch page 0, so
            full-bucket writes are safe for short prompts / padding rows."""
            caches = list(caches)
            rows = page_tbl.shape[0]
            for li in range(n_layer):
                for i in range(rows):
                    caches[li] = write_prompt(
                        caches[li], ks[li][i], vs[li][i], page_tbl[i]
                    )
            return caches

        self._write_all = _write_all

        self._chunk_prefill = functools.partial(
            jax.jit(
                lambda p, caches, ids, pos0, cl, wtbl, tbl: (
                    mfns.chunk_prefill_step(
                        p, cfg_, caches, ids, pos0, cl, wtbl, tbl
                    )
                ),
                donate_argnums=(1,),
            ),
            self.params,
        )
        temp, tk = self.temperature, self.top_k

        @jax.jit
        def _sample(logits, key):
            if temp <= 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            scaled = logits.astype(jnp.float32) / temp
            if tk is not None:
                kth = jax.lax.top_k(scaled, tk)[0][..., -1:]
                scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
            return jax.random.categorical(key, scaled, axis=-1).astype(
                jnp.int32
            )

        self._sample = _sample

    # -- public API ---------------------------------------------------------

    def submit(self, prompt: list[int], max_new_tokens: int = 32) -> int:
        # Validate capacity HERE, before any allocator state changes: a
        # reject mid-_admit would leak peers' already-allocated pages.
        limit = min(
            self.cfg.max_position_embeddings,
            self.pages_per_seq * self.page_size,
        )
        if not prompt:
            raise ValueError("empty prompt")
        # +1: room for at least the first generated token's KV slot.
        if len(prompt) + 1 > limit:
            raise ValueError(
                f"prompt of {len(prompt)} tokens exceeds engine capacity "
                f"{limit - 1} (min of max_position_embeddings="
                f"{self.cfg.max_position_embeddings} and pages_per_seq*"
                f"page_size={self.pages_per_seq * self.page_size}, less "
                "one generated-token slot)"
            )
        # NB: no pool-size check is needed here — the __init__ capacity
        # invariant (pool >= one full sequence) plus this per-sequence
        # limit already guarantee any accepted prompt can be admitted
        # once it reaches the queue head.
        req = Request(self._next_id, list(prompt), max_new_tokens)
        self._next_id += 1
        self.pending.append(req)
        return req.seq_id

    def has_work(self) -> bool:
        return bool(self.pending or self.slot_req)

    def run(self, max_steps: int = 10_000) -> list[Request]:
        steps = 0
        while self.has_work() and steps < max_steps:
            self.step()
            steps += 1
        return self.finished

    # -- internals ----------------------------------------------------------

    def _next_key(self):
        key = jax.random.fold_in(self._base_key, self._step_count)
        self._step_count += 1
        return key

    def _free_slots(self) -> list[int]:
        return [i for i in range(self.max_batch) if self.lengths[i] < 0]

    def _reclaim_dead_pages(self, slot: int, req: Request) -> int:
        """Free this sequence's pages that are forever below the decode
        band: page p is dead once (p+1)*page_size <= length-1-window (the
        band floor only moves forward) and p holds no sink positions.
        Safe mid-flight — the decode kernel masks every out-of-band
        position, even on fetched band-edge blocks."""
        if not self._stream_free:
            return 0
        win_lo = int(self.lengths[slot]) - 1 - self.cfg.window
        end = max(0, win_lo) // self.page_size
        sinks = getattr(self.cfg, "window_sinks", 0) or 0
        start = -(-sinks // self.page_size)
        if end <= start:
            return 0
        return self.alloc.release_range(req.seq_id, start, end)

    def _admit(self) -> None:
        """Admit every pending request that fits (slot + pages) in ONE
        batched, bucketed prefill call.

        The effective prompt is ``req.prompt + req.generated``: for fresh
        requests that is just the prompt; for requests PREEMPTED mid-
        decode (pool pressure, see step()) it recomputes the whole
        context so generation continues where it left off (greedy
        continuation is exact; sampled continuation re-draws from the
        same distribution with a fresh step key)."""
        slots = self._free_slots()
        batch: list[tuple[int, Request, list[int]]] = []
        while self.pending and slots:
            req = self.pending[0]
            eff_len = len(req.prompt) + len(req.generated)
            if not self.alloc.can_admit(eff_len + 1):
                break
            self.pending.pop(0)
            pages = self.alloc.alloc(req.seq_id, eff_len + 1)
            batch.append((slots.pop(0), req, pages))
        if not batch:
            return

        if self.prefill_chunk is not None:
            first = self._prefill_chunked(batch)
        else:
            first = self._prefill_single_shot(batch)
        for i, (slot, req, pages) in enumerate(batch):
            n = len(req.prompt) + len(req.generated)
            self.lengths[slot] = n
            # Long prompts: pages already below the band are dead from the
            # very first decode — reclaim before building the table row.
            self._reclaim_dead_pages(slot, req)
            self.page_table[slot] = self.alloc.table_row(req.seq_id)
            self.next_token[slot] = int(first[i])
            self.slot_req[slot] = req
            req.generated.append(int(first[i]))
            # The prefill token may already complete the request
            # (max_new_tokens=1 or immediate EOS).
            self._maybe_retire(slot, req, int(first[i]))

    def _prefill_single_shot(self, batch) -> np.ndarray:
        """Whole prompts in one bucketed dispatch (dense self-attention);
        K/V written to pages afterwards. Returns first sampled tokens."""
        prompts = [req.prompt + req.generated for _, req, _ in batch]
        max_len = max(len(p) for p in prompts)
        # Clamp to the position-embedding table: a 128-rounded bucket may
        # exceed it (e.g. max_pos=1000, prompt 950 -> bucket 1024 would
        # crash the wpe broadcast); prefill handles any bucket length.
        bucket = min(_round_up(max_len, 128),
                     self.cfg.max_position_embeddings)
        assert bucket >= max_len, (max_len, bucket)
        rows = _next_pow2(len(batch))
        ids = np.zeros((rows, bucket), np.int32)
        lens = np.zeros((rows,), np.int32)
        for i, p in enumerate(prompts):
            ids[i, : len(p)] = p
            lens[i] = len(p)
        logits, ks, vs = self._prefill(
            jnp.asarray(ids), jnp.asarray(lens)
        )
        first = np.asarray(
            self._sample(logits, self._next_key()), np.int32
        )
        # One fused dispatch writes every admitted sequence's pages for
        # every layer; rows beyond a prompt's pages target the reserved
        # scratch page 0. Ceil: the clamped bucket need not be a
        # page_size multiple (write_prompt zero-pads the tail page).
        pages_per_bucket = -(-bucket // self.page_size)
        tbl = np.zeros((rows, pages_per_bucket), np.int32)
        for i, (_, req, pages) in enumerate(batch):
            tbl[i, : len(pages[:pages_per_bucket])] = pages[:pages_per_bucket]
        self.caches = list(
            self._write_all(self.caches, ks, vs, jnp.asarray(tbl))
        )
        return first

    def _prefill_chunked(self, batch) -> np.ndarray:
        """Chunked prefill: walk the admitted prompts in fixed
        page-aligned chunks of ``prefill_chunk`` tokens — each chunk's
        K/V is written to its page span and attended against the cache
        (earlier chunks included) by the multi-token paged kernel, so
        dispatch shapes never depend on prompt length. Returns the first
        sampled token per admitted row (sampled from the chunk where
        each prompt ends)."""
        C = self.prefill_chunk
        ps = self.page_size
        rows = _next_pow2(len(batch))
        prompts = [req.prompt + req.generated for _, req, _ in batch]
        lens = [len(p) for p in prompts]
        max_len = max(lens)
        pages_per_chunk = C // ps
        tbl = np.zeros((rows, self.pages_per_seq), np.int32)
        for i, (_, req, pages) in enumerate(batch):
            tbl[i, : len(pages)] = pages
        tbl_j = jnp.asarray(tbl)
        row_tokens = [None] * len(batch)  # sampled tokens per finish chunk
        key = self._next_key()
        for off in range(0, max_len, C):
            ids = np.zeros((rows, C), np.int32)
            pos0 = np.zeros((rows,), np.int32)
            cl = np.zeros((rows,), np.int32)
            wtbl = np.zeros((rows, pages_per_chunk), np.int32)
            for i, (_, req, pages) in enumerate(batch):
                n = lens[i]
                pos0[i] = min(n, off)
                c = max(0, min(n - off, C))
                cl[i] = c
                if c > 0:
                    ids[i, :c] = prompts[i][off : off + c]
                    span = pages[off // ps : off // ps + pages_per_chunk]
                    wtbl[i, : len(span)] = span
            logits, new_caches = self._chunk_prefill(
                self.caches, jnp.asarray(ids), jnp.asarray(pos0),
                jnp.asarray(cl), jnp.asarray(wtbl), tbl_j,
            )
            self.caches = list(new_caches)
            sampled = None
            for i in range(len(batch)):
                if off < lens[i] <= off + C:
                    if sampled is None:
                        sampled = self._sample(logits, key)
                    row_tokens[i] = sampled
        # Sampling ran per finishing chunk with one shared key; gather
        # each row's token from the chunk where its prompt ended.
        first = np.zeros((len(batch),), np.int32)
        for i in range(len(batch)):
            first[i] = int(np.asarray(row_tokens[i])[i])
        return first

    def _preempt_youngest(self, exclude_slot: int) -> bool:
        """Evict the most recently submitted active sequence back to the
        pending queue (vLLM-style recompute preemption): its pages go to
        the pool now; on re-admission the whole context (prompt +
        generated so far) is re-prefilled and generation continues."""
        cands = [
            (r.seq_id, s)
            for s, r in self.slot_req.items()
            if s != exclude_slot
        ]
        if not cands:
            return False
        _, victim = max(cands)
        vreq = self.slot_req.pop(victim)
        self.alloc.release(vreq.seq_id)
        self.lengths[victim] = -1
        self.page_table[victim] = 0
        self.pending.insert(0, vreq)
        return True

    def step(self) -> None:
        """Admit what fits, then advance every active slot by one token."""
        self._admit()
        if not self.slot_req:
            return
        # Reclaim out-of-band sliding-window pages FIRST (all slots), so
        # the growth pass below sees every reclaimable page in the pool.
        for slot, req in list(self.slot_req.items()):
            if self._reclaim_dead_pages(slot, req):
                self.page_table[slot] = self.alloc.table_row(req.seq_id)
        # Grow page tables where the next token crosses a page boundary.
        # On pool exhaustion, preempt the youngest peer and retry — the
        # __init__ capacity invariant guarantees a lone sequence can
        # always grow to its retire cap.
        for slot, req in list(self.slot_req.items()):
            if slot not in self.slot_req:  # preempted by an earlier grow
                continue
            new_len = int(self.lengths[slot]) + 1
            while True:
                try:
                    page = self.alloc.extend(req.seq_id, new_len + 1)
                    break
                except RuntimeError as e:
                    if "out of KV-cache pages" not in str(e):
                        raise
                    if not self._preempt_youngest(slot):
                        raise
            if page is not None:
                self.page_table[slot] = self.alloc.table_row(req.seq_id)
        active = np.asarray(
            [s in self.slot_req for s in range(self.max_batch)]
        )
        lengths = jnp.asarray(np.where(active, self.lengths, -1), jnp.int32)
        logits, new_caches = self._decode(
            self.caches,
            jnp.asarray(self.page_table),
            lengths,
            jnp.asarray(self.next_token),
        )
        self.caches = list(new_caches)
        next_tok = np.asarray(
            self._sample(logits, self._next_key()), np.int32
        )
        for slot, req in list(self.slot_req.items()):
            self.lengths[slot] += 1
            tok = int(next_tok[slot])
            req.generated.append(tok)
            self.next_token[slot] = tok
            self._maybe_retire(slot, req, tok)

    def _maybe_retire(self, slot: int, req: Request, tok: int) -> None:
        if (
            len(req.generated) >= req.max_new_tokens
            or (self.eos_token is not None and tok == self.eos_token)
            or self.lengths[slot] + 1
            >= min(
                self.cfg.max_position_embeddings,
                self.pages_per_seq * self.page_size,
            )
        ):
            req.done = True
            self.finished.append(req)
            self.alloc.release(req.seq_id)
            self.lengths[slot] = -1
            self.page_table[slot] = 0
            del self.slot_req[slot]
