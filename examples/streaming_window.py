"""Streaming sliding-window serving (StreamingLLM-style).

GPT-2 with ``window=N`` local causal attention serves with bounded
per-sequence memory: the paged decode kernel fetches only the pages in
the attention band (plus optional attention-sink pages), and the engine
returns out-of-band pages to the shared pool mid-flight — live KV memory
per sequence is O(window + sinks), not O(context).

Works on TPU or CPU.

    python examples/streaming_window.py [--window 128] [--sinks 4]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from flash_attn_tpu.serving.engine import ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=128)
    ap.add_argument("--sinks", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=400)
    ap.add_argument("--new-tokens", type=int, default=48)
    args = ap.parse_args()

    # window=N: each token attends the last N tokens (training, prefill
    # and decode agree). window_sinks keeps the first few positions
    # visible at DECODE time only — the StreamingLLM softmax anchor.
    cfg = GPT2Config.tiny(
        dtype=jnp.float32,
        max_position_embeddings=1024,
        window=args.window,
        window_sinks=args.sinks,
    )
    model = GPT2LMHeadModel(cfg)
    rng = np.random.default_rng(0)
    dummy = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy)

    engine = ServingEngine(
        params,
        cfg,
        max_batch=2,
        num_pages=32,
        page_size=128,
        pages_per_seq=8,
        stream_free_pages=True,  # default; shown for clarity
    )
    prompt = list(rng.integers(0, cfg.vocab_size, size=args.prompt_len))
    engine.submit(prompt, max_new_tokens=args.new_tokens)

    base_free = engine.alloc.free_pages
    min_free = base_free
    while engine.has_work():
        engine.step()
        min_free = min(min_free, engine.alloc.free_pages)
    req = engine.finished[0]

    held_peak = base_free - min_free
    band_pages = -(-(args.window + args.sinks + engine.page_size)
                   // engine.page_size)
    print(f"generated {len(req.generated)} tokens at context "
          f"{args.prompt_len + args.new_tokens}")
    print(f"peak pages held: {held_peak} "
          f"(window+sinks needs ~{band_pages}; full context would need "
          f"{-(-(args.prompt_len + args.new_tokens) // engine.page_size)})")


if __name__ == "__main__":
    main()
