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


def test_internvit_numeric_parity():
    """Numerics vs an independent torch forward of the InternViT layout
    (fused qkv, full-hidden RMS qk-norm, layer scale — intern_encoder.py)."""
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    # feature_layer=-2 (the reference's select layer for every tower —
    # vision_encoder.py:44): run L-1 of L layers, no final norm.
    L, d, mlp, heads, patch = 3, 32, 64, 4, 14

    def t(*shape):
        return torch.tensor(rng.normal(scale=0.05, size=shape).astype(np.float32))

    sd = {
        "vision_model.embeddings.patch_embedding.weight": t(d, 3, patch, patch),
        "vision_model.embeddings.class_embedding": t(1, 1, d),
        "vision_model.embeddings.position_embedding": t(1, 17, d),
    }
    for i in range(L):
        p = f"vision_model.encoder.layers.{i}."
        sd[p + "norm1.weight"] = 1.0 + 0.1 * t(d)
        sd[p + "norm1.bias"] = t(d)
        sd[p + "attn.qkv.weight"] = t(3 * d, d)
        sd[p + "attn.qkv.bias"] = t(3 * d)
        sd[p + "attn.q_norm.weight"] = 1.0 + 0.1 * t(d)
        sd[p + "attn.k_norm.weight"] = 1.0 + 0.1 * t(d)
        sd[p + "attn.proj.weight"] = t(d, d)
        sd[p + "attn.proj.bias"] = t(d)
        sd[p + "norm2.weight"] = 1.0 + 0.1 * t(d)
        sd[p + "norm2.bias"] = t(d)
        sd[p + "mlp.fc1.weight"] = t(mlp, d)
        sd[p + "mlp.fc1.bias"] = t(mlp)
        sd[p + "mlp.fc2.weight"] = t(d, mlp)
        sd[p + "mlp.fc2.bias"] = t(d)
        sd[p + "ls1"] = 0.1 + 0.01 * t(d)
        sd[p + "ls2"] = 0.1 + 0.01 * t(d)

    cfg = vit.ViTConfig(
        hidden_size=d, intermediate_size=mlp, num_hidden_layers=L,
        num_attention_heads=heads, image_size=56, patch_size=patch,
        hidden_act="gelu", layer_scale=True, qk_norm=True,
        pre_layernorm=False, layer_norm_eps=1e-6,
    )
    params = hf_import.convert_vit_state_dict(sd, cfg)
    assert "q_norm" in params["layers"]  # converter imports qk-norm scales
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    px = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    got = vit.forward(
        params, cfg, jnp.asarray(px), feature_layer=-2, select="cls_patch"
    )

    # independent torch reference (L-1 layers, no final norm)
    def rms(x, w):
        return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + 1e-6) * w

    with torch.no_grad():
        x = torch.tensor(px.transpose(0, 3, 1, 2))
        h = F.conv2d(
            x, sd["vision_model.embeddings.patch_embedding.weight"],
            stride=patch,
        )
        b = h.shape[0]
        h = h.flatten(2).transpose(1, 2)
        cls = sd["vision_model.embeddings.class_embedding"].expand(b, -1, -1)
        h = torch.cat([cls, h], dim=1)
        h = h + sd["vision_model.embeddings.position_embedding"]
        s = h.shape[1]
        for i in range(L - 1):
            p = f"vision_model.encoder.layers.{i}."
            y = F.layer_norm(
                h, (d,), sd[p + "norm1.weight"], sd[p + "norm1.bias"], 1e-6
            )
            qkv = F.linear(y, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
            q, k, v = qkv.chunk(3, dim=-1)
            q = rms(q, sd[p + "attn.q_norm.weight"])
            k = rms(k, sd[p + "attn.k_norm.weight"])

            def split(z):
                return z.view(b, s, heads, d // heads).transpose(1, 2)

            attn = F.scaled_dot_product_attention(split(q), split(k), split(v))
            attn = attn.transpose(1, 2).reshape(b, s, d)
            attn = F.linear(
                attn, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"]
            )
            h = h + attn * sd[p + "ls1"]
            y = F.layer_norm(
                h, (d,), sd[p + "norm2.weight"], sd[p + "norm2.bias"], 1e-6
            )
            y = F.gelu(
                F.linear(y, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
            )
            y = F.linear(y, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
            h = h + y * sd[p + "ls2"]
    np.testing.assert_allclose(
        np.asarray(got), h.numpy(), atol=2e-4, rtol=1e-3
    )


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
