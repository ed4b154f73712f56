"""HF checkpoint import: torch/safetensors state dicts → vila_tpu pytrees.

The reference saves checkpoints component-wise (`llm/`, `vision_tower/`,
`mm_projector/` subdirs — llava/model/llava_arch.py:158-204). This module
converts each component's HF state dict into the stacked-layer functional
pytrees used by vila_tpu. Works from either in-memory torch state dicts
(used by the parity tests) or safetensors files on disk.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy (bf16-safe)."""
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().to("cpu").float().numpy()


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors (or pytorch_model*.bin) under `path`."""
    state: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if files:
        from safetensors import safe_open

        for f in files:
            with safe_open(f, framework="np") as sf:
                for key in sf.keys():
                    state[key] = sf.get_tensor(key)
        return state
    files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if not files:
        raise FileNotFoundError(f"no weights found under {path}")
    import torch

    for f in files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for k, v in sd.items():
            state[k] = _np(v)
    return state


def load_hf_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


# --------------------------------------------------------------------------
# Qwen2 / Llama LLM
# --------------------------------------------------------------------------


def convert_llm_state_dict(state: Dict[str, Any], cfg) -> Dict[str, Any]:
    """HF Qwen2/Llama `model.*` state dict → vila_tpu.models.qwen2 pytree."""
    sd = {k.removeprefix("model."): _np(v) for k, v in state.items()}
    L = cfg.num_hidden_layers

    def stack(fmt: str, transpose: bool = False):
        mats = [sd[fmt.format(i)] for i in range(L)]
        out = np.stack([m.T if transpose else m for m in mats])
        return out

    layers = {
        "input_layernorm": {"scale": stack("layers.{}.input_layernorm.weight")},
        "q_proj": {"kernel": stack("layers.{}.self_attn.q_proj.weight", True)},
        "k_proj": {"kernel": stack("layers.{}.self_attn.k_proj.weight", True)},
        "v_proj": {"kernel": stack("layers.{}.self_attn.v_proj.weight", True)},
        "o_proj": {"kernel": stack("layers.{}.self_attn.o_proj.weight", True)},
        "post_attention_layernorm": {
            "scale": stack("layers.{}.post_attention_layernorm.weight")
        },
        "gate_proj": {"kernel": stack("layers.{}.mlp.gate_proj.weight", True)},
        "up_proj": {"kernel": stack("layers.{}.mlp.up_proj.weight", True)},
        "down_proj": {"kernel": stack("layers.{}.mlp.down_proj.weight", True)},
    }
    if cfg.qkv_bias and "layers.0.self_attn.q_proj.bias" in sd:
        layers["q_proj"]["bias"] = stack("layers.{}.self_attn.q_proj.bias")
        layers["k_proj"]["bias"] = stack("layers.{}.self_attn.k_proj.bias")
        layers["v_proj"]["bias"] = stack("layers.{}.self_attn.v_proj.bias")

    params = {
        "embed_tokens": {"embedding": sd["embed_tokens.weight"]},
        "layers": layers,
        "norm": {"scale": sd["norm.weight"]},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": sd["lm_head.weight"].T}
    return params


# --------------------------------------------------------------------------
# SigLIP vision tower
# --------------------------------------------------------------------------


def convert_siglip_state_dict(state: Dict[str, Any], cfg) -> Dict[str, Any]:
    """HF `SiglipVisionModel` state dict → vila_tpu.models.siglip pytree.

    The patch conv (stride == kernel == patch) is converted into a flat
    matmul weight of shape (patch*patch*3, D) so the embed runs on the MXU
    as a single GEMM (fused patch-embed).
    """
    sd = {
        k.removeprefix("vision_model."): _np(v)
        for k, v in state.items()
        if not k.startswith("vision_model.head")
    }
    L = cfg.num_hidden_layers

    # Conv (D, 3, P, P) -> (P, P, 3, D) -> (P*P*3, D); patch pixels are
    # flattened as (row, col, channel) to match the patchify reshape.
    conv_w = sd["embeddings.patch_embedding.weight"]
    d = conv_w.shape[0]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)

    def stack(fmt: str, transpose: bool = False):
        mats = [sd[fmt.format(i)] for i in range(L)]
        return np.stack([m.T if transpose else m for m in mats])

    layers = {
        "layer_norm1": {
            "scale": stack("encoder.layers.{}.layer_norm1.weight"),
            "bias": stack("encoder.layers.{}.layer_norm1.bias"),
        },
        "q_proj": {
            "kernel": stack("encoder.layers.{}.self_attn.q_proj.weight", True),
            "bias": stack("encoder.layers.{}.self_attn.q_proj.bias"),
        },
        "k_proj": {
            "kernel": stack("encoder.layers.{}.self_attn.k_proj.weight", True),
            "bias": stack("encoder.layers.{}.self_attn.k_proj.bias"),
        },
        "v_proj": {
            "kernel": stack("encoder.layers.{}.self_attn.v_proj.weight", True),
            "bias": stack("encoder.layers.{}.self_attn.v_proj.bias"),
        },
        "out_proj": {
            "kernel": stack("encoder.layers.{}.self_attn.out_proj.weight", True),
            "bias": stack("encoder.layers.{}.self_attn.out_proj.bias"),
        },
        "layer_norm2": {
            "scale": stack("encoder.layers.{}.layer_norm2.weight"),
            "bias": stack("encoder.layers.{}.layer_norm2.bias"),
        },
        "fc1": {
            "kernel": stack("encoder.layers.{}.mlp.fc1.weight", True),
            "bias": stack("encoder.layers.{}.mlp.fc1.bias"),
        },
        "fc2": {
            "kernel": stack("encoder.layers.{}.mlp.fc2.weight", True),
            "bias": stack("encoder.layers.{}.mlp.fc2.bias"),
        },
    }
    return {
        "patch_embedding": {
            "kernel": patch_kernel,
            "bias": sd["embeddings.patch_embedding.bias"],
        },
        "position_embedding": {
            "embedding": sd["embeddings.position_embedding.weight"]
        },
        "layers": layers,
        "post_layernorm": {
            "scale": sd["post_layernorm.weight"],
            "bias": sd["post_layernorm.bias"],
        },
    }


# --------------------------------------------------------------------------
# CLIP / InternViT vision towers
# --------------------------------------------------------------------------


def convert_vit_state_dict(state: Dict[str, Any], cfg) -> Dict[str, Any]:
    """HF `CLIPVisionModel` or InternViT state dict → vila_tpu.models.vit
    pytree (llava/model/multimodal_encoder/{clip,intern}_encoder.py)."""
    sd = {k.removeprefix("vision_model."): _np(v) for k, v in state.items()}
    L = cfg.num_hidden_layers

    def stack(fmt: str, transpose: bool = False):
        mats = [sd[fmt.format(i)] for i in range(L)]
        return np.stack([m.T if transpose else m for m in mats])

    if "embeddings.patch_embedding.weight" in sd:  # CLIP layout
        conv_w = sd["embeddings.patch_embedding.weight"]
        d = conv_w.shape[0]
        patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)
        layers = {
            "layer_norm1": {
                "scale": stack("encoder.layers.{}.layer_norm1.weight"),
                "bias": stack("encoder.layers.{}.layer_norm1.bias"),
            },
            "q_proj": {
                "kernel": stack("encoder.layers.{}.self_attn.q_proj.weight", True),
                "bias": stack("encoder.layers.{}.self_attn.q_proj.bias"),
            },
            "k_proj": {
                "kernel": stack("encoder.layers.{}.self_attn.k_proj.weight", True),
                "bias": stack("encoder.layers.{}.self_attn.k_proj.bias"),
            },
            "v_proj": {
                "kernel": stack("encoder.layers.{}.self_attn.v_proj.weight", True),
                "bias": stack("encoder.layers.{}.self_attn.v_proj.bias"),
            },
            "out_proj": {
                "kernel": stack("encoder.layers.{}.self_attn.out_proj.weight", True),
                "bias": stack("encoder.layers.{}.self_attn.out_proj.bias"),
            },
            "layer_norm2": {
                "scale": stack("encoder.layers.{}.layer_norm2.weight"),
                "bias": stack("encoder.layers.{}.layer_norm2.bias"),
            },
            "fc1": {
                "kernel": stack("encoder.layers.{}.mlp.fc1.weight", True),
                "bias": stack("encoder.layers.{}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": stack("encoder.layers.{}.mlp.fc2.weight", True),
                "bias": stack("encoder.layers.{}.mlp.fc2.bias"),
            },
        }
        params = {
            "patch_embedding": {"kernel": patch_kernel},
            "position_embedding": {
                "embedding": sd["embeddings.position_embedding.weight"]
            },
            "class_embedding": sd["embeddings.class_embedding"].reshape(-1),
            "layers": layers,
            "post_layernorm": {
                "scale": sd["post_layernorm.weight"],
                "bias": sd["post_layernorm.bias"],
            },
        }
        if "pre_layrnorm.weight" in sd:  # HF's misspelled CLIP pre-LN
            params["pre_layernorm"] = {
                "scale": sd["pre_layrnorm.weight"],
                "bias": sd["pre_layrnorm.bias"],
            }
        return params

    # InternViT layout: fused qkv, layer-scale, norm1/norm2
    conv_w = sd["embeddings.patch_embedding.weight"] if (
        "embeddings.patch_embedding.weight" in sd
    ) else sd["patch_embed.proj.weight"]
    d = conv_w.shape[0]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)

    def stack_qkv(part: str):
        outs = []
        for i in range(L):
            qkv = sd[f"encoder.layers.{i}.attn.qkv.weight"]
            q, k, v = np.split(qkv, 3, axis=0)
            outs.append({"q": q, "k": k, "v": v}[part].T)
        return np.stack(outs)

    def stack_qkv_bias(part: str):
        outs = []
        for i in range(L):
            qkv = sd[f"encoder.layers.{i}.attn.qkv.bias"]
            q, k, v = np.split(qkv, 3, axis=0)
            outs.append({"q": q, "k": k, "v": v}[part])
        return np.stack(outs)

    layers = {
        "layer_norm1": {
            "scale": stack("encoder.layers.{}.norm1.weight"),
            "bias": stack("encoder.layers.{}.norm1.bias"),
        },
        "q_proj": {"kernel": stack_qkv("q"), "bias": stack_qkv_bias("q")},
        "k_proj": {"kernel": stack_qkv("k"), "bias": stack_qkv_bias("k")},
        "v_proj": {"kernel": stack_qkv("v"), "bias": stack_qkv_bias("v")},
        "out_proj": {
            "kernel": stack("encoder.layers.{}.attn.proj.weight", True),
            "bias": stack("encoder.layers.{}.attn.proj.bias"),
        },
        "layer_norm2": {
            "scale": stack("encoder.layers.{}.norm2.weight"),
            "bias": stack("encoder.layers.{}.norm2.bias"),
        },
        "fc1": {
            "kernel": stack("encoder.layers.{}.mlp.fc1.weight", True),
            "bias": stack("encoder.layers.{}.mlp.fc1.bias"),
        },
        "fc2": {
            "kernel": stack("encoder.layers.{}.mlp.fc2.weight", True),
            "bias": stack("encoder.layers.{}.mlp.fc2.bias"),
        },
        "ls1": {"scale": stack("encoder.layers.{}.ls1")},
        "ls2": {"scale": stack("encoder.layers.{}.ls2")},
    }
    return {
        "patch_embedding": {"kernel": patch_kernel},
        "position_embedding": {
            "embedding": sd["embeddings.position_embedding"].reshape(
                -1, d
            )
        },
        "class_embedding": sd["embeddings.class_embedding"].reshape(-1),
        "layers": layers,
        "post_layernorm": {
            "scale": np.ones((d,), np.float32),
            "bias": np.zeros((d,), np.float32),
        },
    }


# --------------------------------------------------------------------------
# Multimodal projector
# --------------------------------------------------------------------------


def convert_projector_state_dict(state: Dict[str, Any]) -> Dict[str, Any]:
    """HF `MultimodalProjector` state dict → vila_tpu projector pytree.

    The reference stores the projector as `layers.{idx}.{weight,bias}` of an
    nn.Sequential (llava/model/multimodal_projector/base_projector.py:146).
    We keep the sequential indices; LayerNorms are detected by 1-D weights.
    """
    sd = {k: _np(v) for k, v in state.items()}
    out: Dict[str, Any] = {}
    pat = re.compile(r"^(?:mm_projector\.)?layers\.(\d+)\.(weight|bias)$")
    for key, val in sd.items():
        m = pat.match(key)
        if m is None:
            continue
        idx, kind = int(m.group(1)), m.group(2)
        slot = out.setdefault(str(idx), {})
        if kind == "weight":
            if val.ndim == 2:
                slot["kernel"] = val.T
            else:
                slot["scale"] = val
        else:
            slot["bias"] = val
    return out
