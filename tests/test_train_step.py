"""Training: sharded train step runs on an 8-device mesh and the loss
decreases on a memorization task; per-module freezing works."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.constants import IGNORE_INDEX
from vila_tpu.models import projector, qwen2, siglip, vlm
from vila_tpu.parallel import mesh as mesh_lib
from vila_tpu.train.losses import causal_lm_loss, soft_cross_entropy
from vila_tpu.train.optimizer import OptimizerConfig, make_optimizer
from vila_tpu.train.step import make_sharded_train_step


def tiny_cfg():
    return vlm.VLMConfig(
        llm=qwen2.LLMConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        ),
        vision=siglip.SigLIPConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        projector=projector.ProjectorConfig(
            projector_type="mlp_downsample", mm_hidden_size=32, hidden_size=64
        ),
    )


def make_batch(cfg, b=4, s=32, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 120, size=(b, s)).astype(np.int32)
    labels = ids.copy()
    return {
        "input_ids": ids,
        "labels": labels,
        "positions": np.broadcast_to(np.arange(s, dtype=np.int32), (b, s)).copy(),
        "segment_ids": np.ones((b, s), np.int32),
        "pixel_values": rng.integers(0, 255, size=(b, 1, 28, 28, 3)).astype(np.uint8),
        "media_positions": np.full((b, 1), 2, np.int32),
    }


@pytest.mark.slow
def test_loss_decreases_on_mesh():
    cfg = tiny_cfg()
    mesh = mesh_lib.make_mesh(dp=2, sp=2, tp=2)
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=30, schedule="constant",
                        warmup_ratio=0.0)
    )
    step, params, opt_state, batch_sh = make_sharded_train_step(
        cfg, params, opt, mesh
    )
    batch = {
        k: jax.device_put(jnp.asarray(v), batch_sh[k])
        for k, v in make_batch(cfg).items()
    }
    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.3, losses
    assert all(b <= a for a, b in zip(losses, losses[1:])), losses


@pytest.mark.slow
def test_frozen_components_do_not_move():
    cfg = tiny_cfg()
    mesh = mesh_lib.make_mesh(dp=1, sp=1, tp=1, devices=jax.devices()[:1])
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(
        OptimizerConfig(
            learning_rate=1e-3, total_steps=10, schedule="constant",
            warmup_ratio=0.0,
            tune_vision_tower=False, tune_mm_projector=True,
        )
    )
    step, params, opt_state, batch_sh = make_sharded_train_step(
        cfg, params, opt, mesh
    )
    before_vt = np.asarray(params["vision_tower"]["patch_embedding"]["kernel"])
    before_proj = np.asarray(params["mm_projector"]["2"]["kernel"])
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    params, opt_state, _ = step(params, opt_state, batch)
    after_vt = np.asarray(params["vision_tower"]["patch_embedding"]["kernel"])
    after_proj = np.asarray(params["mm_projector"]["2"]["kernel"])
    np.testing.assert_array_equal(before_vt, after_vt)
    assert np.abs(after_proj - before_proj).max() > 0


def test_causal_lm_loss_masking():
    logits = jnp.zeros((1, 5, 10), jnp.float32)
    labels = jnp.asarray([[1, 2, IGNORE_INDEX, 3, IGNORE_INDEX]])
    loss, n = causal_lm_loss(logits, labels)
    # targets = labels[1:]: [2, IGN, 3, IGN] -> 2 valid
    assert int(n) == 2
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)


def test_soft_cross_entropy_peak():
    # Time-token soft CE: exact-peak prediction should beat off-peak.
    v = 16
    soft = jnp.asarray([10, 11, 12, 13])
    labels = jnp.asarray([[0, 12]])  # target = labels[1:] = [12]
    good = jnp.zeros((1, 2, v)).at[0, 0, 12].set(8.0)
    bad = jnp.zeros((1, 2, v)).at[0, 0, 10].set(8.0)
    l_good = float(soft_cross_entropy(good, labels, soft, std=1.0))
    l_bad = float(soft_cross_entropy(bad, labels, soft, std=1.0))
    assert l_good < l_bad
