"""GPT-2 flagship model built on the fused flash-attention stack.

The reference README positions flash-attention as the attention layer for
BERT/GPT2/ViT (reference README.md:145); this module is the framework's
end-to-end GPT-2: embeddings -> N x (LN -> FlashMHA -> LN -> MLP) -> LM
head (weight-tied), with a training step (AdamW) and mesh-sharded variants
(data parallel x head/feature tensor parallel) for multi-chip runs.

Tensor-parallel layout (Megatron-style):
  - Wqkv kernel   (e, 3e): P(None, 'model')   -> heads sharded
  - out_proj      (e, e):  P('model', None)   -> psum by GSPMD
  - MLP c_fc      (e, 4e): P(None, 'model')
  - MLP c_proj    (4e, e): P('model', None)
  - embeddings / layernorms: replicated
Attention itself runs under shard_map (parallel/sharding.py) since Pallas
kernels do not auto-partition under pjit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.models.modules import FlashMHA, _seed_from_rng_key
from flash_attn_tpu.ops.attention import flash_attention
from flash_attn_tpu.parallel.sharding import make_sharded_flash_attention


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    max_position_embeddings: int = 1024
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    dropout: float = 0.0
    # HF GPT-2's epsilon (torch default would be 1e-5 too; flax's is
    # 1e-6) — config-surfaced so converted checkpoints (convert.py)
    # reproduce the source model exactly.
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # Sliding-window (local causal) attention: each token attends the last
    # `window` tokens only (None = full causal; GPT-2 checkpoints use
    # None). Honored by training (FlashMHA window_size), prefill, and
    # paged decode (rolling-KV band skip).
    window: Any = None
    # StreamingLLM attention sinks, DECODE-ONLY: with a window, keep the
    # first `window_sinks` positions visible during paged decode (softmax
    # anchor for long rolling generation). Inference technique — training
    # and prefill keep the pure band mask, so outputs intentionally
    # diverge from teacher forcing when nonzero.
    window_sinks: int = 0
    # Per-block rematerialization (jax.checkpoint): trade ~1/3 extra
    # fwd flops for O(n_layer) -> O(1) saved block activations. Required
    # for long-context training on one chip (b=8 x S=4K blows HBM with
    # all 12 layers' attention temporaries live through the backward).
    remat: bool = False
    # Remat offloading policy (only meaningful with remat=True):
    #   None          — recompute everything (minimum memory, ~4/3 flops;
    #                   the flash fwd kernel runs twice, so attention pays
    #                   9/7 of its no-remat dot count).
    #   "dots"        — jax.checkpoint_policies.dots_saveable: save every
    #                   dot_general output (Wqkv, out_proj, MLP fc/proj);
    #                   elementwise (LN, gelu, residual) recomputes. The
    #                   flash kernel output is NOT a dot_general, so it
    #                   still recomputes.
    #   "dots_flash"  — "dots" plus the flash attention output (tagged
    #                   with checkpoint_name 'flash_out'): near-zero
    #                   recompute flops, ~10*n_embd*tokens bytes of saved
    #                   activations per layer — the long-context MFU
    #                   setting when it fits HBM.
    remat_policy: str | None = None

    # Engine-facing geometry (shared contract with LlamaConfig): GPT-2
    # has no GQA, so the KV-cache head count equals n_head.
    @property
    def n_kv_heads(self) -> int:
        return self.n_head

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @classmethod
    def small(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw):
        d = dict(
            vocab_size=512, max_position_embeddings=256, n_layer=2,
            n_head=8, n_embd=128,
        )
        d.update(kw)
        return cls(**d)


class Mlp(nn.Module):
    config: GPT2Config

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        x = nn.Dense(
            4 * cfg.n_embd, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="c_fc",
        )(x)
        x = nn.gelu(x)
        x = nn.Dense(
            cfg.n_embd, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="c_proj",
        )(x)
        if cfg.dropout > 0.0:
            x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return x


def _resolve_remat_policy(name: str | None):
    """GPT2Config.remat_policy -> jax.checkpoint policy callable."""
    if name is None:
        return None
    cp = jax.checkpoint_policies
    if name == "dots":
        return cp.dots_saveable
    if name == "dots_flash":
        return cp.save_from_both_policies(
            cp.dots_saveable, cp.save_only_these_names("flash_out")
        )
    raise ValueError(
        f"remat_policy must be None, 'dots', or 'dots_flash'; got {name!r}"
    )


class Block(nn.Module):
    config: GPT2Config
    attn_impl: Optional[Callable] = None  # sharded attention override

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_epsilon, dtype=cfg.dtype, name=name
        )
        h = ln("ln_1")(x)
        if self.attn_impl is None:
            attn_out = FlashMHA(
                embed_dim=cfg.n_embd,
                num_heads=cfg.n_head,
                causal=True,
                attention_dropout=cfg.dropout,
                dtype=cfg.dtype,
                param_dtype=cfg.param_dtype,
                window_size=(
                    None if cfg.window is None else (cfg.window, 0)
                ),
                name="attn",
            )(h, deterministic=deterministic)
        else:
            attn_out = _MhaWithImpl(
                config=cfg, attn_impl=self.attn_impl, name="attn"
            )(h, deterministic=deterministic)
        # Identity outside jax.checkpoint; under remat_policy="dots_flash"
        # this names the flash kernel's output as saveable so the S^2 fwd
        # kernel does not re-run in the backward.
        attn_out = _checkpoint_name(attn_out, "flash_out")
        x = x + attn_out
        h = ln("ln_2")(x)
        x = x + Mlp(cfg, name="mlp")(h, deterministic=deterministic)
        return x


class _MhaWithImpl(nn.Module):
    """FlashMHA-shaped block whose attention op is injected (used for the
    shard_map-wrapped multi-device attention). Parameter tree is identical
    to FlashMHA (Wqkv / out_proj)."""

    config: GPT2Config
    attn_impl: Callable = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        b, s, e = x.shape
        hd = cfg.n_embd // cfg.n_head
        qkv = nn.Dense(
            3 * e, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="Wqkv"
        )(x)
        qkv = qkv.reshape(b, s, 3, cfg.n_head, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        seed = None
        if cfg.dropout > 0.0 and not deterministic:
            seed = _seed_from_rng_key(self.make_rng("dropout"))
        ctx = self.attn_impl(q, k, v, dropout_seed=seed)
        ctx = ctx.reshape(b, s, e)
        return nn.Dense(
            e, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="out_proj"
        )(ctx)


class GPT2LMHeadModel(nn.Module):
    config: GPT2Config
    attn_impl: Optional[Callable] = None

    @nn.compact
    def __call__(self, input_ids, deterministic=True, positions=None,
                 return_hidden=False):
        cfg = self.config
        b, s = input_ids.shape
        wte = self.param(
            "wte",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.n_embd),
            cfg.param_dtype,
        )
        wpe = self.param(
            "wpe",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.n_embd),
            cfg.param_dtype,
        )
        if positions is None:
            pos_emb = wpe[None, :s]
        else:
            # Explicit (possibly permuted) positions — used by the
            # zigzag sequence-parallel layout, where the global sequence
            # is reordered before sharding (parallel/ring.py).
            pos_emb = wpe[positions]
        x = wte[input_ids] + pos_emb
        x = x.astype(cfg.dtype)
        if cfg.dropout > 0.0:
            x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        block_cls = Block
        if cfg.remat:
            # Recompute each block in the backward instead of saving its
            # activations (deterministic is static arg 2; arg 0 = module).
            block_cls = nn.remat(
                Block, static_argnums=(2,),
                policy=_resolve_remat_policy(cfg.remat_policy),
            )
        for i in range(cfg.n_layer):
            x = block_cls(cfg, attn_impl=self.attn_impl, name=f"h_{i}")(
                x, deterministic
            )
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_epsilon, dtype=cfg.dtype, name="ln_f"
        )(x)
        if return_hidden:
            # For chunked_lm_loss: the (b, s, vocab) logits of a long
            # sequence dwarf everything else in HBM (fp32 logits at
            # b=8/S=4K are 6.1 GiB, plus a bf16 bwd temp) — the caller
            # streams the LM head + CE over sequence chunks instead.
            return x, wte
        # Tied LM head on the MXU's native bf16 x bf16 -> fp32 path: the
        # (tokens, 768) x (768, 50257) projection is ~30% of step matmul
        # flops, and an fp32 matmul runs at ~1/8 MXU peak on v5e — the
        # dominant MFU loss in round 2's 37% train-step figure. fp32
        # *accumulation* keeps the logits exact enough for CE (measured
        # loss delta < 1e-3 vs fp32 compute).
        logits = jax.lax.dot_general(
            x.astype(cfg.dtype),
            wte.astype(cfg.dtype),
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return logits


def cross_entropy_loss(logits, labels):
    """Next-token CE; labels == -100 are ignored."""
    logits = logits[:, :-1]
    labels = labels[:, 1:]
    valid = labels != -100
    labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.sum(ll * valid) / jnp.maximum(jnp.sum(valid), 1)


def chunked_lm_loss(x, wte, labels, *, chunk=512, dtype=jnp.bfloat16):
    """Next-token CE that never materializes the (b, s, vocab) logits.

    Streams the tied LM head + log-softmax + gather over sequence chunks
    with ``lax.scan`` + ``jax.checkpoint``: the forward keeps only the
    scalar (sum, count) carry, and the backward recomputes each chunk's
    logits on the fly — peak extra HBM is ONE chunk's fp32 logits
    (b * chunk * vocab * 4 bytes) instead of the full sequence's
    (measured: the full logits + their log_softmax bwd temp were 9.2 GiB
    of the b=8/S=4K GPT-2 train step's OOM — benchmarks/
    benchmark_gpt2_train.py). Matches ``cross_entropy_loss(logits, labels)``
    on the same ``preferred_element_type=f32`` LM-head dot.
    """
    b, s, e = x.shape
    x = x[:, :-1]
    labels = labels[:, 1:]
    n = s - 1
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
        labels = jnp.pad(labels, [(0, 0), (0, pad)], constant_values=-100)
    n_chunks = (n + pad) // chunk
    xc = x.reshape(b, n_chunks, chunk, e).swapaxes(0, 1)
    lc = labels.reshape(b, n_chunks, chunk).swapaxes(0, 1)

    def body(carry, xs):
        tot, cnt = carry
        x_c, lab_c = xs  # (b, chunk, e), (b, chunk)
        logits = jax.lax.dot_general(
            x_c.astype(dtype), wte.astype(dtype),
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        valid = lab_c != -100
        lab = jnp.where(valid, lab_c, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
        tot = tot + jnp.sum(ll * valid)
        cnt = cnt + jnp.sum(valid)
        return (tot, cnt), None

    (tot, cnt), _ = jax.lax.scan(
        jax.checkpoint(body), (jnp.float32(0.0), jnp.float32(0.0)), (xc, lc)
    )
    return -tot / jnp.maximum(cnt, 1)


def make_train_step(model: GPT2LMHeadModel, optimizer: optax.GradientTransformation,
                    lm_loss_chunk: Optional[int] = None):
    """Returns train_step(params, opt_state, batch, dropout_key) ->
    (params, opt_state, loss).

    ``lm_loss_chunk``: stream the LM head + CE over sequence chunks of
    this many tokens (``chunked_lm_loss``) instead of materializing the
    full (b, s, vocab) logits — required to fit long-sequence training
    steps in HBM (the logits dominate the step's memory beyond S~2K).
    """

    def loss_fn(params, batch, dropout_key):
        rngs = {"dropout": dropout_key} if model.config.dropout > 0 else {}
        if lm_loss_chunk is not None:
            x, wte = model.apply(
                params, batch["input_ids"], deterministic=not rngs,
                rngs=rngs, return_hidden=True,
            )
            return chunked_lm_loss(
                x, wte, batch["labels"], chunk=lm_loss_chunk,
                dtype=model.config.dtype,
            )
        logits = model.apply(
            params, batch["input_ids"], deterministic=not rngs, rngs=rngs
        )
        return cross_entropy_loss(logits, batch["labels"])

    def train_step(params, opt_state, batch, dropout_key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, dropout_key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def param_shardings(params, mesh: Mesh):
    """Megatron-style NamedShardings for the GPT-2 parameter tree."""

    def rule(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(n) for n in names)
        if x.ndim == 2:
            if "Wqkv" in joined or "c_fc" in joined:
                return NamedSharding(mesh, P(None, "model"))
            if "out_proj" in joined or "c_proj" in joined:
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def make_sharded_model(cfg: GPT2Config, mesh: Mesh, interpret=None):
    """GPT-2 whose attention runs under shard_map on the given mesh.

    ``cfg.window`` is honored: head-TP/DP sharding keeps the full
    sequence on every shard, so the sliding-window band applies on
    global positions unchanged."""
    win = None if cfg.window is None else (cfg.window, 0)
    attn_eval = make_sharded_flash_attention(
        mesh, causal=True, dropout_p=0.0, window_size=win,
        interpret=interpret,
    )
    attn_train = (
        make_sharded_flash_attention(
            mesh, causal=True, dropout_p=cfg.dropout, window_size=win,
            interpret=interpret,
        )
        if cfg.dropout > 0.0
        else attn_eval
    )

    def attn_impl(q, k, v, dropout_seed=None):
        if dropout_seed is None:
            return attn_eval(q, k, v)
        return attn_train(q, k, v, dropout_seed=dropout_seed)

    return GPT2LMHeadModel(cfg, attn_impl=attn_impl)


def cross_entropy_positionwise(logits, labels):
    """Positionwise CE (labels already shifted by the caller; -100 =
    ignore). Used by the zigzag sequence-parallel path, where the
    sequence order is permuted so the in-model shift of
    ``cross_entropy_loss`` would pair wrong positions."""
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return -jnp.sum(ll * valid) / jnp.maximum(jnp.sum(valid), 1)


def zigzag_batch(input_ids, n_seq: int, pad_label: int = -100):
    """Prepare a (input_ids, shifted labels, positions) triple in the
    ZIGZAG layout for sequence-parallel training: labels are next-token
    shifted in the ORIGINAL order first, then ids/labels/positions are
    all permuted together, so the positionwise loss is exact."""
    import numpy as np

    from flash_attn_tpu.parallel.ring import zigzag_permutation

    ids = jnp.asarray(input_ids)
    b, s = ids.shape
    perm = jnp.asarray(zigzag_permutation(s, n_seq))
    labels = jnp.concatenate(
        [ids[:, 1:], jnp.full((b, 1), pad_label, ids.dtype)], axis=1
    )
    positions = jnp.broadcast_to(perm[None], (b, s))
    return ids[:, perm], labels[:, perm], positions


def make_seq_parallel_model(
    cfg: GPT2Config,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    data_axis: str | None = "data",
    interpret=None,
):
    """GPT-2 whose attention is ZIGZAG ring sequence parallelism over
    ``seq_axis`` (activations sharded on the sequence dimension; the
    position-wise layers partition under GSPMD automatically). Feed it
    batches prepared with ``zigzag_batch`` and train with
    ``cross_entropy_positionwise`` via ``make_seq_parallel_train_step``.
    Composes with data parallelism over ``data_axis`` and multi-host
    meshes (parallel/multihost.py) — a ring laid across hosts crosses
    DCN on 2 hops per rotation.
    """
    from jax import shard_map

    from flash_attn_tpu.parallel.ring import ring_flash_attention

    qkv_spec = P(data_axis, seq_axis, None, None)
    # The ring masks on GLOBAL positions, so the sliding-window band is
    # exact under the zigzag permutation too.
    win = None if cfg.window is None else (cfg.window, 0)

    def _ring(q, k, v, seed):
        out, _ = ring_flash_attention(
            q, k, v, axis_name=seq_axis, causal=True, zigzag=True,
            dropout_p=cfg.dropout, dropout_seed=seed, window_size=win,
            interpret=interpret,
        )
        return out

    def _ring_nodrop(q, k, v, seed):
        del seed
        out, _ = ring_flash_attention(
            q, k, v, axis_name=seq_axis, causal=True, zigzag=True,
            window_size=win, interpret=interpret,
        )
        return out

    def _wrap(fn):
        return shard_map(
            fn,
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, P()),
            out_specs=qkv_spec,
            check_vma=False,
        )

    ring_train = _wrap(_ring)
    ring_eval = _wrap(_ring_nodrop)

    def attn_impl(q, k, v, dropout_seed=None):
        if dropout_seed is None or cfg.dropout == 0.0:
            return ring_eval(q, k, v, jnp.zeros((), jnp.uint32))
        return ring_train(q, k, v, dropout_seed)

    return GPT2LMHeadModel(cfg, attn_impl=attn_impl)


def make_seq_parallel_train_step(
    model: GPT2LMHeadModel, optimizer: optax.GradientTransformation
):
    """Train step for the zigzag sequence-parallel model: the batch must
    carry pre-shifted, pre-permuted ids/labels/positions (zigzag_batch)."""

    def loss_fn(params, batch, dropout_key):
        rngs = {"dropout": dropout_key} if model.config.dropout > 0 else {}
        logits = model.apply(
            params, batch["input_ids"], deterministic=not rngs, rngs=rngs,
            positions=batch["positions"],
        )
        return cross_entropy_positionwise(logits, batch["labels"])

    def train_step(params, opt_state, batch, dropout_key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, dropout_key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
