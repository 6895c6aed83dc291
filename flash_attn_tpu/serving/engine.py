"""Continuous-batching serving engine for GPT-2 (north-star config #5).

Host-side scheduler + device-side jitted steps:

  - requests queue; admission whenever a batch slot AND enough cache pages
    are free (paged allocator, serving/cache.py)
  - prefill: one request at a time through the fused flash-attention
    forward; K/V written into its assigned pages
  - decode: ALL active slots advance one token per engine step through the
    paged decode kernel (inactive slots are masked and pointed at the
    reserved scratch page 0)
  - greedy or temperature sampling; sequences retire on EOS / max tokens

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
from flash_attn_tpu.models.gpt2_decode import decode_step, prefill
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
    ):
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        self.eos_token = eos_token
        hd = cfg.n_embd // cfg.n_head
        self.caches = [
            init_cache(
                cfg.n_head, num_pages, page_size, hd,
                dtype=cfg.dtype, quantization=kv_quantization,
            )
            for _ in range(cfg.n_layer)
        ]
        self.alloc = PageAllocator(
            num_pages, page_size, pages_per_seq, reserved=1
        )
        self.page_table = np.zeros((max_batch, pages_per_seq), np.int32)
        self.lengths = np.full((max_batch,), -1, np.int32)  # -1 = free slot
        self.next_token = np.zeros((max_batch,), np.int32)
        self.slot_req: dict[int, Request] = {}
        self.pending: list[Request] = []
        self.finished: list[Request] = []
        self._next_id = 0

        # params must be a jit *argument*, not a closure constant:
        # jit inlines closure constants into the HLO (hundreds of MB for a
        # real model, which overflows compile-request limits and bloats the
        # executable).
        cfg_ = self.cfg
        self._prefill = functools.partial(
            jax.jit(lambda p, ids: prefill(p, cfg_, ids)), self.params
        )
        self._decode = functools.partial(
            jax.jit(
                lambda p, caches, tbl, lens, toks: decode_step(
                    p, cfg_, caches, tbl, lens, toks
                ),
                # Donate the caches: the scatter appends update the pages
                # in place instead of copying the whole KV cache per step.
                donate_argnums=(1,),
            ),
            self.params,
        )

    # -- public API ---------------------------------------------------------

    def submit(self, prompt: list[int], max_new_tokens: int = 32) -> int:
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

    def _free_slot(self) -> int | None:
        for i in range(self.max_batch):
            if self.lengths[i] < 0:
                return i
        return None

    def _admit(self) -> None:
        while self.pending:
            slot = self._free_slot()
            req = self.pending[0]
            if slot is None or not self.alloc.can_admit(len(req.prompt) + 1):
                return
            self.pending.pop(0)
            pages = self.alloc.alloc(req.seq_id, len(req.prompt) + 1)
            row = self.alloc.table_row(req.seq_id)
            self.page_table[slot] = row
            # prefill on device
            ids = jnp.asarray(req.prompt, jnp.int32)[None]
            logits, ks, vs = self._prefill(ids)
            page_ids = jnp.asarray(pages, jnp.int32)
            for li in range(self.cfg.n_layer):
                self.caches[li] = write_prompt(
                    self.caches[li], ks[li][0], vs[li][0], page_ids
                )
            self.lengths[slot] = len(req.prompt)
            self.next_token[slot] = int(jnp.argmax(logits[0]))
            self.slot_req[slot] = req
            req.generated.append(int(self.next_token[slot]))

    def step(self) -> None:
        """Admit what fits, then advance every active slot by one token."""
        self._admit()
        if not self.slot_req:
            return
        # grow page tables where the next token crosses a page boundary
        for slot, req in list(self.slot_req.items()):
            new_len = int(self.lengths[slot]) + 1
            page = self.alloc.extend(req.seq_id, new_len + 1)
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
        next_tok = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        for slot, req in list(self.slot_req.items()):
            self.lengths[slot] += 1
            tok = int(next_tok[slot])
            req.generated.append(tok)
            self.next_token[slot] = tok
            total_new = len(req.generated)
            if (
                total_new >= req.max_new_tokens
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
