"""PS3 / VILA-HD: selective multi-scale encode, gt teacher forcing,
top-down prompts, BCE+dice selection loss, train step, and the two-pass
generation (reference: llava_arch.py:966-1685, llava_trainer.py:859-998)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.models import projector, ps3, qwen2, siglip, vlm
from vila_tpu.train.losses import token_selection_loss


def ps3_cfg(prompt_dim=0, k=3, nlc=1):
    vit = siglip.SigLIPConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    )
    return ps3.PS3Config(
        vit=vit, s3_scales=(28, 56), num_hires_select=k,
        num_look_close=nlc, prompt_dim=prompt_dim,
    )


def test_forward_shapes_and_selection_count():
    cfg = ps3_cfg()
    assert cfg.low_grid == 2 and cfg.hi_grid(1) == 4
    assert cfg.n_output_tokens == 4 + 3
    params = ps3.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    low = rng.integers(0, 255, (2, 28, 28, 3)).astype(np.uint8)
    high = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)

    feats, probs, maps = ps3.forward(
        params, cfg, jnp.asarray(low), [jnp.asarray(high)]
    )
    assert feats.shape == (2, 7, 32)
    assert probs[0].shape == (2, 4, 4)
    assert np.all((np.asarray(probs[0]) >= 0) & (np.asarray(probs[0]) <= 1))
    # exactly K patches selected per instance
    assert np.asarray(maps[0]).reshape(2, -1).sum(-1).tolist() == [3, 3]

    # num_look_close=0: low-res-only pass (prompt pass), no selection
    feats0, probs0, maps0 = ps3.forward(
        params, cfg, jnp.asarray(low), None, num_look_close=0
    )
    assert feats0.shape == (2, 4, 32)
    assert np.asarray(maps0[0]).sum() == 0


def test_gt_selection_teacher_forcing():
    cfg = ps3_cfg(k=2)
    params = ps3.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    low = rng.integers(0, 255, (1, 28, 28, 3)).astype(np.uint8)
    high = rng.integers(0, 255, (1, 56, 56, 3)).astype(np.uint8)
    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, 1, 2] = 1.0
    gt[0, 3, 0] = 1.0

    _, _, maps = ps3.forward(
        params, cfg, jnp.asarray(low), [jnp.asarray(high)],
        gt_selection_maps=jnp.asarray(gt),
    )
    np.testing.assert_array_equal(np.asarray(maps[0][0]), gt[0] > 0)


def test_top_down_prompt_steers_selection():
    cfg = ps3_cfg(prompt_dim=16)
    params = ps3.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    low = rng.integers(0, 255, (1, 28, 28, 3)).astype(np.uint8)
    high = rng.integers(0, 255, (1, 56, 56, 3)).astype(np.uint8)
    p1 = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    p2 = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))

    _, probs1, _ = ps3.forward(params, cfg, jnp.asarray(low), [jnp.asarray(high)], prompt=p1)
    _, probs2, _ = ps3.forward(params, cfg, jnp.asarray(low), [jnp.asarray(high)], prompt=p2)
    assert np.abs(np.asarray(probs1[0]) - np.asarray(probs2[0])).max() > 1e-6


def test_token_selection_loss_ordering():
    gt = jnp.asarray(np.eye(4, dtype=np.float32)[None])  # (1, 4, 4)
    good = [jnp.clip(gt, 0.02, 0.98)]
    bad = [jnp.clip(1.0 - gt, 0.02, 0.98)]
    l_good = float(token_selection_loss(good, gt))
    l_bad = float(token_selection_loss(bad, gt))
    assert l_good < l_bad
    # all-zero gt masks the instance out entirely
    l_none = float(token_selection_loss(bad, jnp.zeros_like(gt)))
    assert l_none == pytest.approx(
        float(token_selection_loss(good, jnp.zeros_like(gt))), abs=1e-6
    )


def _vlm_cfg():
    return vlm.VLMConfig(
        llm=qwen2.LLMConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2,
        ),
        vision=ps3_cfg(prompt_dim=64, k=3),
        projector=projector.ProjectorConfig(
            projector_type="mlp2x_gelu", mm_hidden_size=32, hidden_size=64
        ),
        vision_tower_type="ps3",
    )


@pytest.mark.slow
def test_ps3_train_step_with_selection_loss():
    from vila_tpu.parallel import mesh as mesh_lib
    from vila_tpu.train.optimizer import OptimizerConfig, make_optimizer
    from vila_tpu.train.step import make_sharded_train_step

    cfg = _vlm_cfg()
    t = cfg.tokens_per_image  # 4 + 3
    assert t == 7
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, s = 2, 32
    ids = rng.integers(1, 120, (b, s)).astype(np.int32)
    gt = np.zeros((b, 1, 4, 4), np.float32)
    gt[:, 0, 0, 0] = 1.0
    batch = {
        "input_ids": ids,
        "labels": ids.copy(),
        "positions": np.broadcast_to(np.arange(s, dtype=np.int32), (b, s)).copy(),
        "segment_ids": np.ones((b, s), np.int32),
        "pixel_values": rng.integers(0, 255, (b, 1, 28, 28, 3)).astype(np.uint8),
        "pixel_values_high": rng.integers(0, 255, (b, 1, 56, 56, 3)).astype(np.uint8),
        "gt_selection_maps": gt,
        "media_positions": np.broadcast_to(
            np.arange(2, 2 + t, dtype=np.int32), (b, t)
        ).copy(),
    }
    mesh = mesh_lib.make_mesh(dp=2)
    opt = make_optimizer(OptimizerConfig(
        learning_rate=1e-3, total_steps=20, schedule="constant",
        warmup_ratio=0.0,
    ))
    step, p, st, bsh = make_sharded_train_step(cfg, params, opt, mesh)
    dbatch = {
        k: jax.device_put(jnp.asarray(v), bsh.get(k)) for k, v in batch.items()
    }
    losses, sel_losses = [], []
    for _ in range(6):
        p, st, m = step(p, st, dbatch)
        losses.append(float(m["loss"]))
        sel_losses.append(float(m["token_selection_loss"]))
    assert losses[-1] < losses[0], losses
    assert sel_losses[-1] < sel_losses[0], sel_losses


def test_ps3_two_pass_generation():
    """Two-pass top-down generation through the public GenerationEngine."""
    from helpers import make_tiny_tokenizer

    from vila_tpu.data.tokenizer_utils import add_media_tokens
    from vila_tpu.inference.generate import GenerationConfig, GenerationEngine

    import dataclasses

    cfg = dataclasses.replace(_vlm_cfg(), ps3_look_close_mode="after_prompt")
    tokenizer = make_tiny_tokenizer()
    add_media_tokens(tokenizer)
    llm = dataclasses.replace(cfg.llm, vocab_size=len(tokenizer))
    cfg = dataclasses.replace(cfg, llm=llm)
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)

    engine = GenerationEngine(params, cfg, tokenizer)
    from PIL import Image as PILImage

    img = PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    )
    import vila_tpu

    out = engine.generate_content(
        [vila_tpu.Image(img), "what is this?"],
        GenerationConfig(max_new_tokens=4),
    )
    assert isinstance(out, str)
