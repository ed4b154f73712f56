"""RADIO + PS3 loadability: timm-layout conversion parity and full
checkpoint-dir loading through `vila_tpu.load()` (r2 VERDICT missing #4/#5).

The torch reference below is an independent minimal timm-VisionTransformer
forward (blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}) — the
layout RADIO's torchhub/HF checkpoints and PS3's SigLIP trunk use
(llava/model/multimodal_encoder/radio_encoder.py:141,
radio_torchhub_encoder.py, ps3_encoder.py:35).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vila_tpu.models import ps3 as ps3_lib
from vila_tpu.models import vit
from vila_tpu.utils import hf_import


def make_timm_state_dict(
    rng, L, d, mlp, patch=14, n_pos=17, cls_token=True, prefix=""
):
    """Random timm-ViT state dict (torch tensors, timm key names)."""

    def t(*shape):
        return torch.tensor(
            rng.normal(scale=0.05, size=shape).astype(np.float32)
        )

    sd = {}
    sd["patch_embed.proj.weight"] = t(d, 3, patch, patch)
    sd["patch_embed.proj.bias"] = t(d)
    sd["pos_embed"] = t(1, n_pos, d)
    if cls_token:
        sd["cls_token"] = t(1, 1, d)
    for i in range(L):
        sd[f"blocks.{i}.norm1.weight"] = 1.0 + 0.1 * t(d)
        sd[f"blocks.{i}.norm1.bias"] = t(d)
        sd[f"blocks.{i}.attn.qkv.weight"] = t(3 * d, d)
        sd[f"blocks.{i}.attn.qkv.bias"] = t(3 * d)
        sd[f"blocks.{i}.attn.proj.weight"] = t(d, d)
        sd[f"blocks.{i}.attn.proj.bias"] = t(d)
        sd[f"blocks.{i}.norm2.weight"] = 1.0 + 0.1 * t(d)
        sd[f"blocks.{i}.norm2.bias"] = t(d)
        sd[f"blocks.{i}.mlp.fc1.weight"] = t(mlp, d)
        sd[f"blocks.{i}.mlp.fc1.bias"] = t(mlp)
        sd[f"blocks.{i}.mlp.fc2.weight"] = t(d, mlp)
        sd[f"blocks.{i}.mlp.fc2.bias"] = t(d)
    sd["norm.weight"] = 1.0 + 0.1 * t(d)
    sd["norm.bias"] = t(d)
    return {prefix + k: v for k, v in sd.items()}


def ref_timm_forward(sd, px, heads, n_layers, cls_token=True, final_norm=True):
    """Independent torch forward of the timm ViT layout. px: (B,H,W,3)."""
    import torch.nn.functional as F

    x = torch.tensor(px.transpose(0, 3, 1, 2))
    h = F.conv2d(
        x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
        stride=sd["patch_embed.proj.weight"].shape[-1],
    )
    b, d = h.shape[0], h.shape[1]
    h = h.flatten(2).transpose(1, 2)  # (B, N, D)
    if cls_token:
        cls = sd["cls_token"].expand(b, -1, -1)
        h = torch.cat([cls, h], dim=1)
    h = h + sd["pos_embed"]

    def ln(x, w, bias):
        return F.layer_norm(x, (d,), w, bias, eps=1e-6)

    for i in range(n_layers):
        p = f"blocks.{i}."
        y = ln(h, sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        qkv = F.linear(y, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        s = q.shape[1]

        def split(t):
            return t.view(b, s, heads, d // heads).transpose(1, 2)

        attn = F.scaled_dot_product_attention(split(q), split(k), split(v))
        attn = attn.transpose(1, 2).reshape(b, s, d)
        h = h + F.linear(
            attn, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"]
        )
        y = ln(h, sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        y = F.gelu(F.linear(y, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"]))
        h = h + F.linear(y, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
    if final_norm:
        h = ln(h, sd["norm.weight"], sd["norm.bias"])
    return h


RADIO_CFG = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=56, patch_size=14,
    hidden_act="gelu", pre_layernorm=False, layer_norm_eps=1e-6,
)


def test_radio_conversion_parity():
    rng = np.random.default_rng(0)
    sd = make_timm_state_dict(
        rng, L=2, d=32, mlp=64, n_pos=17, prefix="radio_model.model."
    )
    cfg = vit.ViTConfig(**RADIO_CFG)
    params = hf_import.convert_radio_state_dict(sd, cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    px = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    got = vit.forward(
        params, cfg, jnp.asarray(px), feature_layer=-1, select="cls_patch"
    )
    bare = {k.removeprefix("radio_model.model."): v for k, v in sd.items()}
    with torch.no_grad():
        ref = ref_timm_forward(bare, px, heads=4, n_layers=2)
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3
    )


def test_radio_cpe_conversion():
    """CPE checkpoints (patch_generator.*) convert: flat embedder weight,
    patch-only pos_embed zero-padded for the class slot."""
    rng = np.random.default_rng(1)
    d, patch = 32, 14
    sd = {
        "model.patch_generator.embedder.weight": torch.tensor(
            rng.normal(scale=0.05, size=(d, patch * patch * 3)).astype(
                np.float32
            )
        ),
        "model.patch_generator.pos_embed": torch.tensor(
            rng.normal(scale=0.05, size=(1, 16, d)).astype(np.float32)
        ),
        "model.patch_generator.cls_token.token": torch.tensor(
            rng.normal(scale=0.05, size=(1, 1, d)).astype(np.float32)
        ),
    }
    base = make_timm_state_dict(rng, L=2, d=d, mlp=64, prefix="model.")
    for k, v in base.items():
        if "patch_embed" not in k and "pos_embed" not in k and "cls" not in k:
            sd[k] = v
    cfg = vit.ViTConfig(**RADIO_CFG)
    params = hf_import.convert_radio_state_dict(sd, cfg)
    pos = params["position_embedding"]["embedding"]
    assert pos.shape == (17, d)
    np.testing.assert_array_equal(pos[0], np.zeros((d,), np.float32))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    out = vit.forward(
        params, cfg, jnp.zeros((1, 56, 56, 3), jnp.float32),
        feature_layer=-2, select="patch",
    )
    assert out.shape == (1, 16, d)


def test_radio_image_stats():
    sd = {
        "radio_model.input_conditioner.norm_mean": torch.tensor(
            [[[0.1]], [[0.2]], [[0.3]]]
        ),
        "radio_model.input_conditioner.norm_std": torch.tensor(
            [[[0.4]], [[0.5]], [[0.6]]]
        ),
    }
    mean, std = hf_import.radio_image_stats(sd)
    np.testing.assert_allclose(mean, (0.1, 0.2, 0.3), rtol=1e-6)
    np.testing.assert_allclose(std, (0.4, 0.5, 0.6), rtol=1e-6)


def test_ps3_trunk_parity():
    """The PS3 SigLIP trunk (vision_model.trunk.*, no class token) converts
    one-to-one; the low-res pass (num_look_close=0) matches the torch
    reference run to feature_layer=-2."""
    rng = np.random.default_rng(2)
    sd = make_timm_state_dict(
        rng, L=3, d=32, mlp=64, n_pos=16, cls_token=False,
        prefix="vision_model.trunk.",
    )
    cfg = ps3_lib.PS3Config(
        vit=__import__(
            "vila_tpu.models.siglip", fromlist=["siglip"]
        ).SigLIPConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=56, patch_size=14,
        ),
        s3_scales=(56, 112),
        num_hires_select=4,
    )
    params = hf_import.convert_ps3_state_dict(sd, cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    px = rng.normal(size=(1, 56, 56, 3)).astype(np.float32)
    feats, _, _ = ps3_lib.forward(
        params, cfg, jnp.asarray(px), num_look_close=0
    )
    bare = {k.removeprefix("vision_model.trunk."): v for k, v in sd.items()}
    with torch.no_grad():
        ref = ref_timm_forward(
            bare, px, heads=4, n_layers=2, cls_token=False, final_norm=False
        )
    np.testing.assert_allclose(
        np.asarray(feats), ref.numpy(), atol=2e-4, rtol=1e-3
    )


# ---------------------------------------------------------------------------
# entry.build_config / load dispatch on full checkpoint dirs
# ---------------------------------------------------------------------------


def _write_llm_and_projector(tmpdir, mm_hidden=32):
    """Reuse the tiny-vlm helper's llm + write a linear projector sized for
    a 32-dim tower."""
    import helpers
    from safetensors.torch import save_file

    llm, _, _, llm_hf, _, _ = helpers.make_tiny_vlm_torch(seed=0)
    llm_dir = os.path.join(tmpdir, "llm")
    os.makedirs(llm_dir, exist_ok=True)
    save_file(
        {k: v.contiguous() for k, v in llm.state_dict().items()},
        os.path.join(llm_dir, "model.safetensors"),
    )
    with open(os.path.join(llm_dir, "config.json"), "w") as f:
        json.dump(llm_hf.to_dict(), f)
    helpers.make_tiny_tokenizer().save_pretrained(llm_dir)

    proj_dir = os.path.join(tmpdir, "mm_projector")
    os.makedirs(proj_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    save_file(
        {
            "layers.0.weight": torch.tensor(
                rng.normal(scale=0.05, size=(64, mm_hidden)).astype(np.float32)
            ),
            "layers.0.bias": torch.zeros(64),
        },
        os.path.join(proj_dir, "model.safetensors"),
    )
    with open(os.path.join(proj_dir, "config.json"), "w") as f:
        json.dump({"mm_projector_type": "linear"}, f)


def test_load_radio_checkpoint_dir(tmp_path):
    from safetensors.torch import save_file

    import vila_tpu

    tmpdir = str(tmp_path)
    _write_llm_and_projector(tmpdir)

    rng = np.random.default_rng(3)
    sd = make_timm_state_dict(
        rng, L=2, d=32, mlp=64, n_pos=17, prefix="radio_model.model."
    )
    sd["radio_model.input_conditioner.norm_mean"] = torch.tensor([0.5, 0.5, 0.5])
    sd["radio_model.input_conditioner.norm_std"] = torch.tensor([0.25, 0.25, 0.25])
    vt_dir = os.path.join(tmpdir, "vision_tower")
    os.makedirs(vt_dir, exist_ok=True)
    save_file(
        {k: v.contiguous() for k, v in sd.items()},
        os.path.join(vt_dir, "model.safetensors"),
    )
    with open(os.path.join(vt_dir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "radio",
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "image_size": 56, "patch_size": 14,
            },
            f,
        )
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "llava",
                "image_aspect_ratio": "resize",
                "mm_vision_select_layer": -2,
                "mm_vision_select_feature": "patch",
                "mm_hidden_size": 32,
            },
            f,
        )

    engine = vila_tpu.load(tmpdir, dtype="float32")
    assert engine.cfg.vision_tower_type == "radio"
    assert engine.cfg.vision.image_mean == (0.5, 0.5, 0.5)
    from vila_tpu.inference.generate import GenerationConfig
    from vila_tpu.media import Image as VImage

    img = np.zeros((56, 56, 3), np.uint8)
    out = engine.generate_content(
        [VImage(img), "hi"],
        GenerationConfig(max_new_tokens=4),
    )
    assert isinstance(out, str)


def test_load_ps3_checkpoint_dir(tmp_path):
    from safetensors.torch import save_file

    import vila_tpu

    tmpdir = str(tmp_path)
    _write_llm_and_projector(tmpdir)

    rng = np.random.default_rng(4)
    sd = make_timm_state_dict(
        rng, L=2, d=32, mlp=64, n_pos=16, cls_token=False,
        prefix="vision_model.trunk.",
    )
    vt_dir = os.path.join(tmpdir, "vision_tower")
    os.makedirs(vt_dir, exist_ok=True)
    save_file(
        {k: v.contiguous() for k, v in sd.items()},
        os.path.join(vt_dir, "model.safetensors"),
    )
    with open(os.path.join(vt_dir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "ps3_vision_model",
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "patch_size": 14, "ps3_scales": [56, 112],
                "num_hires_select": 4,
            },
            f,
        )
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "llava",
                "image_aspect_ratio": "resize",
                "mm_vision_select_layer": -2,
                "mm_vision_select_feature": "patch",
                "mm_hidden_size": 32,
            },
            f,
        )

    engine = vila_tpu.load(tmpdir, dtype="float32")
    assert engine.cfg.vision_tower_type == "ps3"
    assert engine.cfg.vision.s3_scales == (56, 112)
    from vila_tpu.inference.generate import GenerationConfig
    from vila_tpu.media import Image as VImage

    img = np.zeros((56, 56, 3), np.uint8)
    out = engine.generate_content(
        [VImage(img), "hi"],
        GenerationConfig(max_new_tokens=4),
    )
    assert isinstance(out, str)
