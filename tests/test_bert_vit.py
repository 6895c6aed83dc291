"""BERT and ViT integration tests (the reference's named model families,
reference README.md:145; BERT is its MLPerf headline, README.md:9)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flash_attn_tpu.models.bert import (
    BertConfig,
    BertForMaskedLM,
    BertModel,
    make_train_step as make_bert_step,
)
from flash_attn_tpu.models.vit import (
    ViTClassifier,
    ViTConfig,
    make_train_step as make_vit_step,
)


def _bert_inputs(cfg, batch=2, seq=192, pad_from=160, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(
        rng.integers(3, cfg.vocab_size, size=(batch, seq)), jnp.int32
    )
    mask = (jnp.arange(seq)[None] < pad_from).astype(jnp.int32)
    mask = jnp.broadcast_to(mask, (batch, seq))
    return ids, mask


def test_bert_forward_shapes_and_finite():
    cfg = BertConfig.tiny()
    model = BertModel(cfg)
    ids, mask = _bert_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    seq_out, pooled = model.apply(params, ids, mask)
    assert seq_out.shape == (*ids.shape, cfg.n_embd)
    assert pooled.shape == (ids.shape[0], cfg.n_embd)
    assert bool(jnp.all(jnp.isfinite(seq_out)))


def test_bert_padding_invariance():
    """Padded positions must not influence valid-token outputs: the
    in-kernel segment masking replaces the reference's unpad/re-pad round
    trip (reference flash_attn/bert_padding.py), so a batch padded to a
    longer length must agree with the unpadded computation."""
    cfg = BertConfig.tiny(dropout=0.0)
    model = BertModel(cfg)
    valid = 128
    ids, mask = _bert_inputs(cfg, batch=2, seq=192, pad_from=valid)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out_padded, _ = model.apply(params, ids, mask)
    out_short, _ = model.apply(
        params, ids[:, :valid], jnp.ones((2, valid), jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out_padded[:, :valid]), np.asarray(out_short),
        rtol=0, atol=2e-5,
    )


def test_bert_mlm_train_step_reduces_loss():
    cfg = BertConfig.tiny()
    model = BertForMaskedLM(cfg)
    ids, mask = _bert_inputs(cfg, batch=2, seq=128, pad_from=128)
    labels = ids
    label_mask = (jnp.arange(128)[None] % 7 == 0).astype(jnp.int32)
    label_mask = jnp.broadcast_to(label_mask, ids.shape)
    batch = {
        "input_ids": ids,
        "attention_mask": mask,
        "labels": labels,
        "label_mask": label_mask,
    }
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_bert_step(model, optimizer))
    losses = []
    for i in range(4):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("use_rotary", [True, False])
def test_vit_forward_and_train(use_rotary):
    cfg = ViTConfig.tiny(use_rotary=use_rotary, dropout=0.1)
    model = ViTClassifier(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    labels = jnp.asarray([1, 3], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), images)
    logits = model.apply(params, images)
    assert logits.shape == (2, cfg.num_classes)
    assert bool(jnp.all(jnp.isfinite(logits)))

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_vit_step(model, optimizer))
    batch = {"images": images, "labels": labels}
    losses = []
    for i in range(4):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
