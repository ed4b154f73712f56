"""Model loading/saving: VILA component-wise checkpoint layout.

Capability parity: `llava.load` (llava/entry.py:29-54) +
`load_pretrained_model` (llava/model/builder.py:27) + component-wise
`save_pretrained` (llava/model/llava_arch.py:158-204). Checkpoints are
directories with `llm/`, `vision_tower/`, `mm_projector/` subdirs, each an
HF model dir, plus a top-level config.json with the multimodal fields
(llava/model/configuration_llava.py:23).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vila_tpu.conversation import auto_set_conversation_mode
from vila_tpu.models import projector as projector_lib
from vila_tpu.models import qwen2, siglip, vlm
from vila_tpu.utils import hf_import


def _default_dtype() -> str:
    try:
        if jax.devices()[0].platform == "tpu":
            return "bfloat16"
    except Exception:
        pass
    return "float32"


def build_config(
    model_path: str, dtype: Optional[str] = None, **overrides
) -> vlm.VLMConfig:
    """Assemble a VLMConfig from a component checkpoint directory."""
    dtype = dtype or _default_dtype()
    top = hf_import.load_hf_config(model_path)

    llm_dir = os.path.join(model_path, "llm")
    vt_dir = os.path.join(model_path, "vision_tower")
    proj_dir = os.path.join(model_path, "mm_projector")

    llm_hf = hf_import.load_hf_config(llm_dir)
    vt_hf = hf_import.load_hf_config(vt_dir)
    if "vision_config" in vt_hf:
        vt_hf = vt_hf["vision_config"]
    proj_hf = hf_import.load_hf_config(proj_dir)

    llm_cfg = qwen2.LLMConfig.from_hf_config(llm_hf, dtype=dtype)
    vt_type = vt_hf.get("model_type", "siglip_vision_model")
    if "radio" in vt_type:
        from vila_tpu.models import vit

        tower_type = "radio"
        vis_cfg = vit.ViTConfig.from_radio_config(vt_hf, dtype=dtype)
        # input-conditioner normalization stats live in the weights
        # (radio_encoder.py's make_preprocessor_external)
        stats = hf_import.radio_image_stats(
            hf_import.peek_safetensors(
                vt_dir,
                [
                    "radio_model.input_conditioner.norm_mean",
                    "radio_model.input_conditioner.norm_std",
                    "input_conditioner.norm_mean",
                    "input_conditioner.norm_std",
                ],
            )
        )
        if stats is not None:
            vis_cfg = dataclasses_replace(
                vis_cfg, image_mean=stats[0], image_std=stats[1]
            )
    elif "ps3" in vt_type:
        from vila_tpu.models import ps3

        tower_type = "ps3"
        vis_cfg = ps3.PS3Config.from_hf_config(
            vt_hf, dtype=dtype, prompt_dim=llm_cfg.hidden_size
        )
    elif "clip" in vt_type:
        from vila_tpu.models import vit

        tower_type = "clip"
        vis_cfg = vit.ViTConfig.from_hf_config(vt_hf, dtype=dtype)
    elif "intern" in vt_type:
        from vila_tpu.models import vit

        tower_type = "internvit"
        vis_cfg = vit.ViTConfig.from_hf_config(vt_hf, dtype=dtype)
    else:
        tower_type = "siglip"
        vis_cfg = siglip.SigLIPConfig.from_hf_config(vt_hf, dtype=dtype)

    s2_scales = top.get("s2_scales") or (vis_cfg.image_size,)
    if isinstance(s2_scales, str):
        s2_scales = tuple(int(s) for s in s2_scales.split(","))
    else:
        s2_scales = tuple(s2_scales)

    num_scales = len(s2_scales) if top.get("dynamic_s2") else 1
    proj_cfg = projector_lib.ProjectorConfig(
        projector_type=proj_hf.get("mm_projector_type", "mlp_downsample"),
        mm_hidden_size=top.get("mm_hidden_size")
        or vis_cfg.hidden_size * num_scales,
        hidden_size=llm_cfg.hidden_size,
        dtype=dtype,
    )

    aspect = top.get("image_aspect_ratio") or "resize"
    if top.get("dynamic_s2") and "dynamic_s2" not in aspect:
        aspect = "dynamic_s2"

    cfg = vlm.VLMConfig(
        llm=llm_cfg,
        vision=vis_cfg,
        projector=proj_cfg,
        vision_tower_type=tower_type,
        vision_feature_layer=top.get("mm_vision_select_layer", -2),
        vision_select=top.get("mm_vision_select_feature", "cls_patch"),
        image_aspect_ratio=aspect,
        num_video_frames=top.get("num_video_frames") or 8,
        fps=top.get("fps") or 0.0,
        min_tiles=top.get("min_tiles") or 1,
        max_tiles=top.get("max_tiles") or 12,
        s2_scales=s2_scales,
        s2_resize_output_to_scale_idx=top.get("s2_resize_output_to_scale_idx", 0),
    )

    # video encoder selection: the reference stores a hydra _target_ dict
    # (configuration_llava.py:67-68); map it onto our config fields.
    venc = top.get("video_encoder")
    if isinstance(venc, dict):
        target = venc.get("_target_", "")
        if "TSP" in target:
            pool_sizes = tuple(
                tuple(p) for p in venc.get("pool_sizes", [(1, 1, 1)])
            )
            cfg = dataclasses_replace(
                cfg, video_encoder="tsp", tsp_pool_sizes=pool_sizes
            )
    return dataclasses_replace(cfg, **overrides) if overrides else cfg


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def load_params(
    model_path: str, cfg: vlm.VLMConfig, param_dtype=None
) -> Dict[str, Any]:
    """Load and convert all component weights to vila_tpu pytrees."""
    param_dtype = param_dtype or jnp.dtype(cfg.llm.dtype)

    llm_sd = hf_import.load_safetensors_dir(os.path.join(model_path, "llm"))
    vt_sd = hf_import.load_safetensors_dir(os.path.join(model_path, "vision_tower"))
    proj_sd = hf_import.load_safetensors_dir(os.path.join(model_path, "mm_projector"))

    if cfg.vision_tower_type == "radio":
        vt_params = hf_import.convert_radio_state_dict(vt_sd, cfg.vision)
    elif cfg.vision_tower_type == "ps3":
        vt_params = hf_import.convert_ps3_state_dict(vt_sd, cfg.vision)
    elif cfg.vision_tower_type in ("clip", "internvit"):
        vt_params = hf_import.convert_vit_state_dict(vt_sd, cfg.vision)
    else:
        vt_params = hf_import.convert_siglip_state_dict(vt_sd, cfg.vision)
    params = {
        "llm": hf_import.convert_llm_state_dict(llm_sd, cfg.llm),
        "vision_tower": vt_params,
        "mm_projector": hf_import.convert_projector_state_dict(proj_sd),
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=param_dtype), params)


def load_tokenizer(model_path: str):
    from transformers import AutoTokenizer

    from vila_tpu.data.tokenizer_utils import add_media_tokens

    tokenizer = AutoTokenizer.from_pretrained(os.path.join(model_path, "llm"))
    add_media_tokens(tokenizer)
    return tokenizer


def load(
    model_path: str,
    devices=None,
    dtype: Optional[str] = None,
    vision_int8: bool = False,
    **kwargs,
):
    """Load a checkpoint into a ready GenerationEngine (llava/entry.py:29).

    vision_int8: quantize the SigLIP tower to W8A8 (TinyChat's vision
    deployment recipe, README.md:87-88) — int8 MXU dots halve vision-encode
    time on v5e at negligible feature error."""
    from vila_tpu.inference.generate import GenerationEngine

    auto_set_conversation_mode(model_path)
    cfg = build_config(model_path, dtype=dtype)
    params = load_params(model_path, cfg)
    if vision_int8:
        from vila_tpu.models import siglip, vit

        if cfg.vision_tower_type in ("clip", "internvit", "radio"):
            params["vision_tower"] = vit.quantize_vit_w8a8(
                params["vision_tower"]
            )
        elif cfg.vision_tower_type == "siglip":
            params["vision_tower"] = siglip.quantize_siglip_w8a8(
                params["vision_tower"]
            )
        else:
            raise ValueError(
                f"vision_int8 unsupported for tower "
                f"{cfg.vision_tower_type!r}"
            )
    tokenizer = load_tokenizer(model_path)
    return GenerationEngine(params, cfg, tokenizer, **kwargs)


# --------------------------------------------------------------------------
# Saving (component-wise, HF-compatible layout)
# --------------------------------------------------------------------------


def _np32(x):
    return np.ascontiguousarray(np.asarray(jax.device_get(x), dtype=np.float32))


def _np32t(x):
    # safetensors silently mis-serializes non-contiguous views;
    # transposes must be materialized.
    return np.ascontiguousarray(_np32(x).T)


def llm_state_dict(params: Dict[str, Any], cfg: vlm.VLMConfig) -> Dict[str, np.ndarray]:
    """vila_tpu llm pytree → HF Qwen2/Llama state dict (numpy fp32)."""
    lp = params["llm"]
    sd = {"model.embed_tokens.weight": _np32(lp["embed_tokens"]["embedding"])}
    for i in range(cfg.llm.num_hidden_layers):
        pre = f"model.layers.{i}."
        L = lp["layers"]
        sd[pre + "input_layernorm.weight"] = _np32(L["input_layernorm"]["scale"][i])
        sd[pre + "post_attention_layernorm.weight"] = _np32(
            L["post_attention_layernorm"]["scale"][i]
        )
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[pre + f"self_attn.{name}.weight"] = _np32t(L[name]["kernel"][i])
            if "bias" in L[name]:
                sd[pre + f"self_attn.{name}.bias"] = _np32(L[name]["bias"][i])
        for name in ("gate_proj", "up_proj", "down_proj"):
            sd[pre + f"mlp.{name}.weight"] = _np32t(L[name]["kernel"][i])
    sd["model.norm.weight"] = _np32(lp["norm"]["scale"])
    if not cfg.llm.tie_word_embeddings:
        sd["lm_head.weight"] = _np32t(lp["lm_head"]["kernel"])
    return sd


def generic_vit_state_dict(
    vp: Dict[str, Any], num_layers: int
) -> Dict[str, np.ndarray]:
    """vila_tpu.models.vit tower pytree → the VILAGenericViT torch module's
    state dict (export/modeling_vila.py) — covers CLIP / InternViT / RADIO
    in the single-repo HF export (ref: remote_code/modeling_vila.py:506)."""
    vsd: Dict[str, np.ndarray] = {
        "patch_embed.weight": _np32t(vp["patch_embedding"]["kernel"]),
        "pos_embed": _np32(vp["position_embedding"]["embedding"]),
        "post_ln.weight": _np32(vp["post_layernorm"]["scale"]),
        "post_ln.bias": _np32(vp["post_layernorm"]["bias"]),
    }
    if "class_embedding" in vp:
        vsd["class_embedding"] = _np32(vp["class_embedding"])
    if "pre_layernorm" in vp:
        vsd["pre_ln.weight"] = _np32(vp["pre_layernorm"]["scale"])
        vsd["pre_ln.bias"] = _np32(vp["pre_layernorm"]["bias"])
    L = vp["layers"]
    for i in range(num_layers):
        pre = f"blocks.{i}."
        for src, dst in (
            ("layer_norm1", "ln1"), ("layer_norm2", "ln2"),
        ):
            vsd[pre + dst + ".weight"] = _np32(L[src]["scale"][i])
            vsd[pre + dst + ".bias"] = _np32(L[src]["bias"][i])
        for src, dst in (
            ("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
            ("out_proj", "out"), ("fc1", "fc1"), ("fc2", "fc2"),
        ):
            vsd[pre + dst + ".weight"] = _np32t(L[src]["kernel"][i])
            vsd[pre + dst + ".bias"] = _np32(L[src]["bias"][i])
        for opt in ("ls1", "ls2"):
            if opt in L:
                vsd[pre + opt] = _np32(L[opt]["scale"][i])
        for opt in ("q_norm", "k_norm"):
            if opt in L:
                vsd[pre + opt + ".weight"] = _np32(L[opt]["scale"][i])
    return vsd


def vision_state_dict(params: Dict[str, Any], cfg: vlm.VLMConfig) -> Dict[str, np.ndarray]:
    """Vision tower pytree → HF-consumable state dict.

    SigLIP towers map onto the stock `SiglipVisionModel`; PS3 exports its
    SigLIP TRUNK the same way (top-down selection stays in vila_tpu —
    docs/PS3_COMPAT.md); the generic ViT family (CLIP/InternViT/RADIO) maps
    onto the self-contained VILAGenericViT remote-code module."""
    if cfg.vision_tower_type in ("clip", "internvit", "radio"):
        return generic_vit_state_dict(
            params["vision_tower"], cfg.vision.num_hidden_layers
        )
    vp = params["vision_tower"]
    vcfg = cfg.vision
    if cfg.vision_tower_type == "ps3":
        vp = vp["vit"]
        vcfg = cfg.vision.vit
    vsd = {}
    pk = _np32(vp["patch_embedding"]["kernel"])  # (P*P*3, D)
    p, d = vcfg.patch_size, vcfg.hidden_size
    vsd["vision_model.embeddings.patch_embedding.weight"] = (
        np.ascontiguousarray(pk.reshape(p, p, 3, d).transpose(3, 2, 0, 1))
    )
    vsd["vision_model.embeddings.patch_embedding.bias"] = _np32(
        vp["patch_embedding"]["bias"]
    )
    vsd["vision_model.embeddings.position_embedding.weight"] = _np32(
        vp["position_embedding"]["embedding"]
    )
    for i in range(vcfg.num_hidden_layers):
        pre = f"vision_model.encoder.layers.{i}."
        L = vp["layers"]
        for ln in ("layer_norm1", "layer_norm2"):
            vsd[pre + f"{ln}.weight"] = _np32(L[ln]["scale"][i])
            vsd[pre + f"{ln}.bias"] = _np32(L[ln]["bias"][i])
        for name, hf in (
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("out_proj", "self_attn.out_proj"),
            ("fc1", "mlp.fc1"),
            ("fc2", "mlp.fc2"),
        ):
            vsd[pre + hf + ".weight"] = _np32t(L[name]["kernel"][i])
            vsd[pre + hf + ".bias"] = _np32(L[name]["bias"][i])
    vsd["vision_model.post_layernorm.weight"] = _np32(vp["post_layernorm"]["scale"])
    vsd["vision_model.post_layernorm.bias"] = _np32(vp["post_layernorm"]["bias"])
    return vsd


def projector_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """vila_tpu projector pytree → reference nn.Sequential state dict."""
    psd = {}
    for idx, slot in params["mm_projector"].items():
        if "kernel" in slot:
            psd[f"layers.{idx}.weight"] = _np32t(slot["kernel"])
        if "scale" in slot:
            psd[f"layers.{idx}.weight"] = _np32(slot["scale"])
        if "bias" in slot:
            psd[f"layers.{idx}.bias"] = _np32(slot["bias"])
    return psd


def save(params: Dict[str, Any], cfg: vlm.VLMConfig, tokenizer, out_dir: str):
    """Save in the reference's component layout (llava_arch.py:158-204) so
    checkpoints round-trip between vila_tpu and HF tooling."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)

    # --- llm ---
    llm_dir = os.path.join(out_dir, "llm")
    os.makedirs(llm_dir, exist_ok=True)
    sd = llm_state_dict(params, cfg)
    save_file(sd, os.path.join(llm_dir, "model.safetensors"))
    with open(os.path.join(llm_dir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "qwen2",
                "vocab_size": cfg.llm.vocab_size,
                "hidden_size": cfg.llm.hidden_size,
                "intermediate_size": cfg.llm.intermediate_size,
                "num_hidden_layers": cfg.llm.num_hidden_layers,
                "num_attention_heads": cfg.llm.num_attention_heads,
                "num_key_value_heads": cfg.llm.num_key_value_heads,
                "head_dim": cfg.llm.head_dim,
                "rope_theta": cfg.llm.rope_theta,
                "rms_norm_eps": cfg.llm.rms_norm_eps,
                "tie_word_embeddings": cfg.llm.tie_word_embeddings,
                "max_position_embeddings": cfg.llm.max_position_embeddings,
                "torch_dtype": "bfloat16",
            },
            f,
            indent=2,
        )
    if tokenizer is not None:
        tokenizer.save_pretrained(llm_dir)

    # --- vision tower ---
    vt_dir = os.path.join(out_dir, "vision_tower")
    os.makedirs(vt_dir, exist_ok=True)
    vsd = vision_state_dict(params, cfg)
    save_file(vsd, os.path.join(vt_dir, "model.safetensors"))
    with open(os.path.join(vt_dir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "siglip_vision_model",
                "hidden_size": cfg.vision.hidden_size,
                "intermediate_size": cfg.vision.intermediate_size,
                "num_hidden_layers": cfg.vision.num_hidden_layers,
                "num_attention_heads": cfg.vision.num_attention_heads,
                "image_size": cfg.vision.image_size,
                "patch_size": cfg.vision.patch_size,
                "layer_norm_eps": cfg.vision.layer_norm_eps,
            },
            f,
            indent=2,
        )

    # --- projector ---
    proj_dir = os.path.join(out_dir, "mm_projector")
    os.makedirs(proj_dir, exist_ok=True)
    psd = projector_state_dict(params)
    save_file(psd, os.path.join(proj_dir, "model.safetensors"))
    with open(os.path.join(proj_dir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "v2l_projector",
                "mm_projector_type": cfg.projector.projector_type,
            },
            f,
            indent=2,
        )

    # --- top-level config ---
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "llava",
                "image_aspect_ratio": cfg.image_aspect_ratio,
                "num_video_frames": cfg.num_video_frames,
                "fps": cfg.fps,
                "mm_hidden_size": cfg.projector.mm_hidden_size,
                "mm_vision_select_layer": cfg.vision_feature_layer,
                "mm_vision_select_feature": cfg.vision_select,
                "min_tiles": cfg.min_tiles,
                "max_tiles": cfg.max_tiles,
                "dynamic_s2": cfg.image_aspect_ratio == "dynamic_s2",
                "s2_scales": list(cfg.s2_scales),
                "s2_resize_output_to_scale_idx": cfg.s2_resize_output_to_scale_idx,
            },
            f,
            indent=2,
        )
