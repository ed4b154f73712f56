"""DPO: loss math vs hand calc; a step improves preference accuracy."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vila_tpu.data.collate import Collator
from vila_tpu.models import projector, qwen2, siglip, vlm
from vila_tpu.train.dpo import (
    DPOCollator,
    DPOConfig,
    dpo_loss,
    dpo_step_fn,
    sequence_logp,
)


def tiny_cfg():
    llm = qwen2.LLMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    vis = siglip.SigLIPConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    proj = projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=24, hidden_size=32
    )
    return vlm.VLMConfig(llm=llm, vision=vis, projector=proj)


def test_dpo_loss_matches_manual():
    pc = jnp.asarray([-5.0, -3.0])
    pr = jnp.asarray([-6.0, -2.0])
    rc = jnp.asarray([-5.5, -3.5])
    rr = jnp.asarray([-5.5, -2.5])
    dcfg = DPOConfig(beta=0.1)
    loss, metrics = dpo_loss(pc, pr, rc, rr, dcfg)
    h = (pc - pr) - (rc - rr)
    expect = -np.mean(np.log(1.0 / (1.0 + np.exp(-0.1 * np.asarray(h)))))
    np.testing.assert_allclose(float(loss), expect, rtol=1e-6)
    assert 0.0 <= float(metrics["reward_accuracy"]) <= 1.0


@pytest.mark.slow
def test_dpo_step_improves_margin():
    cfg = tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ref_params = jax.tree.map(lambda x: x, params)

    rng = np.random.default_rng(0)

    def ex(seed):
        r = np.random.default_rng(seed)
        ids = r.integers(2, 64, 16).astype(np.int32)
        return {
            "input_ids": ids,
            "labels": ids.copy(),
            "tiles": np.zeros((0, 28, 28, 3), np.uint8),
            "media_positions": np.zeros((0,), np.int32),
        }

    pairs = [{"chosen": ex(1), "rejected": ex(2)} for _ in range(2)]
    collator = DPOCollator(Collator(seq_len=16, tile_size=28))
    batch = collator(pairs)

    dcfg = DPOConfig(beta=0.5)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    margins = []
    for _ in range(5):
        params, opt_state, metrics = dpo_step_fn(
            params, ref_params, batch,
            cfg=cfg, dcfg=dcfg, optimizer=optimizer, opt_state=opt_state,
        )
        margins.append(float(metrics["reward_margin"]))
    assert margins[-1] > margins[0]
    assert float(metrics["reward_accuracy"]) == 1.0


def test_sequence_logp_chunked_matches_full():
    cfg = tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ids = np.arange(2, 18).astype(np.int32)
    ex = {
        "input_ids": ids,
        "labels": ids.copy(),
        "tiles": np.zeros((0, 28, 28, 3), np.uint8),
        "media_positions": np.zeros((0,), np.int32),
    }
    batch = Collator(seq_len=16, tile_size=28)([ex])
    batch["labels"][:, :4] = -100
    full = sequence_logp(params, cfg, batch, chunk_size=None)
    chunked = sequence_logp(params, cfg, batch, chunk_size=5)  # pad path too
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_dpo_chunked_realistic_vocab():
    """DPO grad at S=4096 / V=152k: the chunked path keeps peak logits at
    (B, chunk, V) by construction (scan + jax.checkpoint) — this exercises
    the real-vocab shape end-to-end (r2 weak #6)."""
    llm = qwen2.LLMConfig(
        vocab_size=151936, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    vis = siglip.SigLIPConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    proj = projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=24, hidden_size=32
    )
    cfg = vlm.VLMConfig(llm=llm, vision=vis, projector=proj)
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ref_params = jax.tree.map(lambda x: x, params)

    s = 4096
    ids = np.random.default_rng(0).integers(2, 64, s).astype(np.int32)
    ex = {
        "input_ids": ids,
        "labels": ids.copy(),
        "tiles": np.zeros((0, 28, 28, 3), np.uint8),
        "media_positions": np.zeros((0,), np.int32),
    }
    collator = DPOCollator(Collator(seq_len=s, tile_size=28))
    batch = collator([{"chosen": ex, "rejected": ex}])
    dcfg = DPOConfig(beta=0.1, chunk_size=512)
    optimizer = optax.sgd(1e-4)
    opt_state = optimizer.init(params)
    params, opt_state, metrics = dpo_step_fn(
        params, ref_params, batch,
        cfg=cfg, dcfg=dcfg, optimizer=optimizer, opt_state=opt_state,
    )
    assert np.isfinite(float(metrics["loss"]))


def test_sequence_logp_masks_ignore():
    cfg = tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ids = np.arange(2, 12).astype(np.int32)
    ex = {
        "input_ids": ids,
        "labels": ids.copy(),
        "tiles": np.zeros((0, 28, 28, 3), np.uint8),
        "media_positions": np.zeros((0,), np.int32),
    }
    batch = Collator(seq_len=10, tile_size=28)([ex])
    full = sequence_logp(params, cfg, batch)
    batch2 = {k: v.copy() for k, v in batch.items()}
    batch2["labels"][:, :5] = -100
    part = sequence_logp(params, cfg, batch2)
    assert float(part[0]) > float(full[0])  # fewer (negative) terms
