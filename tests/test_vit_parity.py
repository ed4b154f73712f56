"""CLIP tower parity vs HF CLIPVisionModel (tiny random weights)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vila_tpu.models import vit
from vila_tpu.utils import hf_import


@pytest.fixture(scope="module")
def clip_pair():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    )
    with torch.no_grad():
        model = CLIPVisionModel(hf_cfg).eval()
    cfg = vit.ViTConfig.from_hf_config(hf_cfg.to_dict())
    params = hf_import.convert_vit_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    return model, cfg, params


def test_clip_feature_parity(clip_pair):
    model, cfg, params = clip_pair
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)

    got = vit.forward(
        params, cfg, jnp.asarray(px), feature_layer=-2, select="patch"
    )

    with torch.no_grad():
        out = model(
            torch.tensor(px.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
        ref = out.hidden_states[-2][:, 1:]  # drop CLS (select="patch")
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3
    )


def test_clip_full_depth_parity(clip_pair):
    model, cfg, params = clip_pair
    rng = np.random.default_rng(1)
    px = rng.normal(size=(1, 56, 56, 3)).astype(np.float32)
    got = vit.forward(
        params, cfg, jnp.asarray(px), feature_layer=-1, select="cls_patch"
    )
    with torch.no_grad():
        ref = model(
            torch.tensor(px.transpose(0, 3, 1, 2))
        ).last_hidden_state
    # HF applies post_layernorm only to pooled output; last_hidden_state is
    # pre-post_layernorm. Compare against our pre-norm run instead:
    got2 = vit.forward(
        params, cfg, jnp.asarray(px), feature_layer=-1, select="cls_patch"
    )
    # ours applies post_layernorm at full depth; apply HF post_layernorm too
    with torch.no_grad():
        ref_pn = model.vision_model.post_layernorm(ref).numpy()
    np.testing.assert_allclose(np.asarray(got2), ref_pn, atol=3e-4, rtol=1e-3)


def test_internvit_shapes():
    cfg = vit.ViTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="gelu", layer_scale=True, qk_norm=True,
        pre_layernorm=False,
    )
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    px = jnp.zeros((2, 28, 28, 3), jnp.float32)
    out = vit.forward(params, cfg, px, feature_layer=-2, select="patch")
    assert out.shape == (2, 4, 32)
    out2 = vit.forward(params, cfg, px, feature_layer=-2, select="cls_patch")
    assert out2.shape == (2, 5, 32)
