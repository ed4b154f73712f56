"""Single-repo HF export: one `trust_remote_code` artifact any transformers
consumer can load (capability of llava/remote_code/modeling_vila.py:229,506
and auto_processor.py:148, redesigned for the vila_tpu layout).

`export_hf_repo(params, cfg, tokenizer, out_dir)` writes:

  out_dir/
    config.json            model_type "vila" + auto_map + sub-configs +
                           projector spec (the Sequential as data)
    model.safetensors      llm.* / vision_tower.* / mm_projector.* weights
    modeling_vila.py       self-contained torch remote code (copied from
                           vila_tpu/export/modeling_vila.py)
    tokenizer files        incl. a jinja chat template

Then:

    from transformers import AutoModel
    model = AutoModel.from_pretrained(out_dir, trust_remote_code=True)
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict

from vila_tpu import entry
from vila_tpu.constants import MEDIA_TOKENS
from vila_tpu.models import projector as projector_lib
from vila_tpu.models import vlm

_REMOTE_CODE = os.path.join(os.path.dirname(__file__), "modeling_vila.py")


def _llm_config_dict(cfg: vlm.VLMConfig) -> Dict[str, Any]:
    llm = cfg.llm
    return {
        "model_type": "qwen2",
        "vocab_size": llm.vocab_size,
        "hidden_size": llm.hidden_size,
        "intermediate_size": llm.intermediate_size,
        "num_hidden_layers": llm.num_hidden_layers,
        "num_attention_heads": llm.num_attention_heads,
        "num_key_value_heads": llm.num_key_value_heads,
        "rope_theta": llm.rope_theta,
        "rms_norm_eps": llm.rms_norm_eps,
        "tie_word_embeddings": llm.tie_word_embeddings,
        "max_position_embeddings": llm.max_position_embeddings,
        "attn_implementation": "eager",
        **({"head_dim": llm.head_dim} if llm.head_dim else {}),
    }


def _vision_config_dict(cfg: vlm.VLMConfig) -> Dict[str, Any]:
    """Vision sub-config for the exported repo.

    SigLIP maps onto the stock `SiglipVisionModel`; PS3 exports its SigLIP
    TRUNK that way (the top-down selection heads stay in vila_tpu —
    docs/PS3_COMPAT.md); CLIP/InternViT/RADIO map onto the self-contained
    VILAGenericViT remote-code module (`model_type: "vila_vit"`), since
    those towers have no stock transformers class
    (ref: remote_code/modeling_vila.py:506 exports all towers)."""
    vis = cfg.vision
    if cfg.vision_tower_type in ("clip", "internvit", "radio"):
        return {
            "model_type": "vila_vit",
            "source_tower": cfg.vision_tower_type,
            "hidden_size": vis.hidden_size,
            "intermediate_size": vis.intermediate_size,
            "num_hidden_layers": vis.num_hidden_layers,
            "num_attention_heads": vis.num_attention_heads,
            "image_size": vis.image_size,
            "patch_size": vis.patch_size,
            "layer_norm_eps": vis.layer_norm_eps,
            "hidden_act": vis.hidden_act,
            "class_token": vis.class_token,
            "pre_layernorm": vis.pre_layernorm,
            "layer_scale": vis.layer_scale,
            "qk_norm": vis.qk_norm,
        }
    if cfg.vision_tower_type == "ps3":
        vis = cfg.vision.vit
    return {
        "model_type": "siglip_vision_model",
        # skip the SigLIP pooling head: features come from hidden_states
        "vision_use_head": False,
        **({"ps3_trunk_only": True}
           if cfg.vision_tower_type == "ps3" else {}),
        "hidden_size": vis.hidden_size,
        "intermediate_size": vis.intermediate_size,
        "num_hidden_layers": vis.num_hidden_layers,
        "num_attention_heads": vis.num_attention_heads,
        "image_size": (
            cfg.vision.s3_scales[0]
            if cfg.vision_tower_type == "ps3" else vis.image_size
        ),
        "patch_size": vis.patch_size,
        "layer_norm_eps": vis.layer_norm_eps,
        "attn_implementation": "eager",
    }


def _vis_stats(cfg: vlm.VLMConfig):
    """(image_mean, image_std) — PS3Config keeps them on its trunk."""
    vis = cfg.vision.vit if cfg.vision_tower_type == "ps3" else cfg.vision
    return vis.image_mean, vis.image_std


def export_hf_repo(
    params: Dict[str, Any], cfg: vlm.VLMConfig, tokenizer, out_dir: str
) -> str:
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)

    # --- weights: one flat state dict, module-prefixed ---
    sd = {}
    for k, v in entry.llm_state_dict(params, cfg).items():
        sd[f"llm.{k}"] = v
    for k, v in entry.vision_state_dict(params, cfg).items():
        sd[f"vision_tower.{k}"] = v
    for k, v in entry.projector_state_dict(params).items():
        sd[f"mm_projector.{k}"] = v
    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    # --- config ---
    spec = [list(row) for row in projector_lib.build_spec(cfg.projector)]
    config = {
        "model_type": "vila",
        "architectures": ["VILAForCausalLM"],
        "auto_map": {
            "AutoConfig": "modeling_vila.VILAConfig",
            "AutoModel": "modeling_vila.VILAForCausalLM",
            "AutoModelForCausalLM": "modeling_vila.VILAForCausalLM",
            "AutoProcessor": "modeling_vila.VILAProcessor",
        },
        "llm_config": _llm_config_dict(cfg),
        "vision_config": _vision_config_dict(cfg),
        "projector_spec": spec,
        "vision_feature_layer": cfg.vision_feature_layer,
        "vision_select": cfg.vision_select,
        # PS3 exports trunk-only: the image spends only its low-res tokens
        "tokens_per_image": (
            cfg.ps3_tokens_low
            if cfg.vision_tower_type == "ps3"
            else cfg.tokens_per_image
        ),
        "image_token": MEDIA_TOKENS["image"],
        "image_size": cfg.vision.image_size,
        "image_mean": list(_vis_stats(cfg)[0]),
        "image_std": list(_vis_stats(cfg)[1]),
        "torch_dtype": "bfloat16",
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)

    # --- remote code + tokenizer ---
    shutil.copy(_REMOTE_CODE, os.path.join(out_dir, "modeling_vila.py"))
    if tokenizer is not None:
        tokenizer.save_pretrained(out_dir)
    return out_dir
