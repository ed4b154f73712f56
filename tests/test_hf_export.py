"""HF single-repo export: `AutoModel.from_pretrained(out,
trust_remote_code=True)` reproduces vila_tpu logits (VERDICT r2 missing #2 /
next-step #3; capability of llava/remote_code/modeling_vila.py:506)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import helpers
from vila_tpu.data.tokenizer_utils import add_media_tokens
from vila_tpu.export import export_hf_repo
from vila_tpu.models import projector, qwen2, siglip, vlm


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    rng = jax.random.PRNGKey(0)
    tok = helpers.make_tiny_tokenizer()
    add_media_tokens(tok)
    llm = qwen2.LLMConfig(
        vocab_size=len(tok), hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    vis = siglip.SigLIPConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    proj = projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=48, hidden_size=64
    )
    cfg = vlm.VLMConfig(llm=llm, vision=vis, projector=proj)
    params = vlm.init_params(rng, cfg)
    out = str(tmp_path_factory.mktemp("hf_repo"))
    export_hf_repo(params, cfg, tok, out)
    return out, params, cfg, tok


def test_repo_contents(exported):
    out, *_ = exported
    for f in ("config.json", "model.safetensors", "modeling_vila.py"):
        assert os.path.exists(os.path.join(out, f)), f


def test_automodel_logit_parity(exported):
    out, params, cfg, tok = exported
    from transformers import AutoModel

    model = AutoModel.from_pretrained(
        out, trust_remote_code=True, dtype=torch.float32
    ).eval()

    # multimodal prompt through the vila_tpu host pipeline
    from vila_tpu.inference.generate import GenerationEngine
    from vila_tpu.media import Image

    engine = GenerationEngine(params, cfg, tok)
    img = np.random.default_rng(0).integers(0, 255, (70, 90, 3), np.uint8)
    inputs = engine.prepare_inputs([Image(img), "what is this?"])

    # vila_tpu logits
    ids = np.asarray(inputs["input_ids"], np.int32)[None]
    embeds = qwen2.embed_tokens(params["llm"], cfg.llm, jnp.asarray(ids))
    media_embeds = engine.encode_media(inputs["media"])
    mp = np.asarray(inputs["media_pos"], np.int32)
    embeds = vlm.splice_media(embeds, media_embeds, jnp.asarray(mp))
    vl, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=embeds)
    vl = np.asarray(vl[0], np.float32)

    # remote-code logits on the SAME tiles/ids
    tiles = np.concatenate([e["tiles"] for e in inputs["media"]])
    mean = np.asarray(cfg.vision.image_mean, np.float32) * 255.0
    std = np.asarray(cfg.vision.image_std, np.float32) * 255.0
    px = torch.tensor(
        ((tiles.astype(np.float32) - mean) / std).transpose(0, 3, 1, 2)
    )
    with torch.no_grad():
        th = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            pixel_values=px,
            media_positions=torch.tensor(mp.astype(np.int64)),
        ).logits[0].float().numpy()

    d = np.abs(vl - th)
    assert d.max() < 5e-4, d.max()
    assert (np.argmax(vl, -1) == np.argmax(th, -1)).all()


def test_remote_generate_and_processor(exported):
    out, params, cfg, tok = exported
    from transformers import AutoModel
    from transformers.dynamic_module_utils import get_class_from_dynamic_module

    model = AutoModel.from_pretrained(
        out, trust_remote_code=True, dtype=torch.float32
    ).eval()
    VILAProcessor = get_class_from_dynamic_module(
        "modeling_vila.VILAProcessor", out
    )
    processor = VILAProcessor.from_pretrained(out)

    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
    batch = processor("<image>\ndescribe", images=[img])
    assert batch["pixel_values"].shape[-1] == cfg.vision.image_size
    assert batch["media_positions"].shape[0] == cfg.tokens_per_image
    ids = model.generate(
        input_ids=batch["input_ids"],
        pixel_values=batch["pixel_values"],
        media_positions=batch["media_positions"],
        max_new_tokens=4,
        do_sample=False,
    )
    assert ids.shape[0] == 1 and ids.shape[1] >= 1


# ---------------------------------------------------------------------------
# Generic-ViT towers (InternViT flags exercise layer-scale + qk-norm; CLIP
# and RADIO share the same VILAGenericViT remote module) — VERDICT r3 #6.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def exported_vit(tmp_path_factory):
    from vila_tpu.models import vit

    rng = jax.random.PRNGKey(1)
    tok = helpers.make_tiny_tokenizer()
    add_media_tokens(tok)
    llm = qwen2.LLMConfig(
        vocab_size=len(tok), hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    vis = vit.ViTConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="gelu", pre_layernorm=False, layer_scale=True,
        qk_norm=True, class_token=True,
    )
    proj = projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=48, hidden_size=64
    )
    cfg = vlm.VLMConfig(
        llm=llm, vision=vis, projector=proj,
        vision_tower_type="internvit", vision_select="patch",
    )
    params = vlm.init_params(rng, cfg)
    out = str(tmp_path_factory.mktemp("hf_repo_vit"))
    export_hf_repo(params, cfg, tok, out)
    return out, params, cfg, tok


def test_vit_tower_logit_parity(exported_vit):
    out, params, cfg, tok = exported_vit
    from transformers import AutoModel

    model = AutoModel.from_pretrained(
        out, trust_remote_code=True, dtype=torch.float32
    ).eval()

    from vila_tpu.inference.generate import GenerationEngine
    from vila_tpu.media import Image

    engine = GenerationEngine(params, cfg, tok)
    img = np.random.default_rng(2).integers(0, 255, (70, 90, 3), np.uint8)
    inputs = engine.prepare_inputs([Image(img), "what is this?"])

    ids = np.asarray(inputs["input_ids"], np.int32)[None]
    embeds = qwen2.embed_tokens(params["llm"], cfg.llm, jnp.asarray(ids))
    media_embeds = engine.encode_media(inputs["media"])
    mp = np.asarray(inputs["media_pos"], np.int32)
    embeds = vlm.splice_media(embeds, media_embeds, jnp.asarray(mp))
    vl, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=embeds)
    vl = np.asarray(vl[0], np.float32)

    tiles = np.concatenate([e["tiles"] for e in inputs["media"]])
    mean = np.asarray(cfg.vision.image_mean, np.float32) * 255.0
    std = np.asarray(cfg.vision.image_std, np.float32) * 255.0
    px = torch.tensor(
        ((tiles.astype(np.float32) - mean) / std).transpose(0, 3, 1, 2)
    )
    with torch.no_grad():
        th = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            pixel_values=px,
            media_positions=torch.tensor(mp.astype(np.int64)),
        ).logits[0].float().numpy()

    d = np.abs(vl - th)
    assert d.max() < 5e-4, d.max()
    assert (np.argmax(vl, -1) == np.argmax(th, -1)).all()


def test_ps3_trunk_export_loads_and_generates(tmp_path):
    """PS3 exports its SigLIP trunk as a plain tower (top-down selection
    stays in vila_tpu — docs/PS3_COMPAT.md); the artifact must load and
    generate through stock transformers."""
    from vila_tpu.models import ps3

    tok = helpers.make_tiny_tokenizer()
    add_media_tokens(tok)
    llm = qwen2.LLMConfig(
        vocab_size=len(tok), hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    trunk = siglip.SigLIPConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    vis = ps3.PS3Config(vit=trunk, s3_scales=(56, 112), prompt_dim=64)
    # PS3 requires a non-downsampling projector (vlm.tokens_per_image)
    proj = projector.ProjectorConfig(
        projector_type="linear", mm_hidden_size=48, hidden_size=64
    )
    cfg = vlm.VLMConfig(
        llm=llm, vision=vis, projector=proj, vision_tower_type="ps3",
    )
    params = vlm.init_params(jax.random.PRNGKey(3), cfg)
    out = str(tmp_path / "hf_repo_ps3")
    export_hf_repo(params, cfg, tok, out)

    from transformers import AutoModel
    from transformers.dynamic_module_utils import get_class_from_dynamic_module

    model = AutoModel.from_pretrained(
        out, trust_remote_code=True, dtype=torch.float32
    ).eval()
    VILAProcessor = get_class_from_dynamic_module(
        "modeling_vila.VILAProcessor", out
    )
    processor = VILAProcessor.from_pretrained(out)
    img = np.random.default_rng(4).integers(0, 255, (64, 64, 3), np.uint8)
    batch = processor("<image>\ndescribe", images=[img])
    assert batch["media_positions"].shape[0] == cfg.ps3_tokens_low
    ids = model.generate(
        input_ids=batch["input_ids"],
        pixel_values=batch["pixel_values"],
        media_positions=batch["media_positions"],
        max_new_tokens=3,
        do_sample=False,
    )
    assert ids.shape[0] == 1
