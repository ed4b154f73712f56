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


def peek_safetensors(path: str, names) -> Dict[str, np.ndarray]:
    """Load only the named tensors from *.safetensors under `path` (cheap:
    safetensors reads are lazy per-tensor)."""
    names = set(names)
    out: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        return out
    from safetensors import safe_open

    for f in files:
        with safe_open(f, framework="np") as sf:
            for key in sf.keys():
                if key in names:
                    out[key] = sf.get_tensor(key)
    return out


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

    # CLIP vs InternViT: both store embeddings.patch_embedding, but CLIP
    # names the block norms layer_norm1/2 while InternViT uses norm1/2
    # with fused attn.qkv.
    if "encoder.layers.0.layer_norm1.weight" in sd:  # CLIP layout
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
    if "encoder.layers.0.attn.q_norm.weight" in sd:
        layers["q_norm"] = {
            "scale": stack("encoder.layers.{}.attn.q_norm.weight")
        }
        layers["k_norm"] = {
            "scale": stack("encoder.layers.{}.attn.k_norm.weight")
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
# RADIO (timm ViT layout) and PS3 (SigLIP trunk in timm layout)
# --------------------------------------------------------------------------

_TIMM_PREFIX_CANDIDATES = (
    "radio_model.model.",  # HF-hub RADIO AutoModel (radio_encoder.py:141)
    "vision_model.trunk.",  # PS3VisionModel trunk (ps3_encoder.py:35)
    "model.",  # torchhub RADIO (radio_torchhub_encoder.py)
    "trunk.",
    "",
)


def _find_timm_prefix(state: Dict[str, Any]) -> str:
    for pre in _TIMM_PREFIX_CANDIDATES:
        if (
            f"{pre}blocks.0.norm1.weight" in state
            or f"{pre}patch_embed.proj.weight" in state
            or f"{pre}patch_generator.embedder.weight" in state
        ):
            return pre
    raise KeyError(
        "no timm-ViT key layout found (expected blocks.N.norm1.weight under "
        f"one of {_TIMM_PREFIX_CANDIDATES})"
    )


def _timm_layers(sd: Dict[str, np.ndarray], L: int) -> Dict[str, Any]:
    """Stack timm `blocks.{i}.*` keys (fused qkv, norm1/norm2, mlp.fc1/fc2)
    into the stacked-layer layout shared by vit.py and siglip.py."""

    def stack(fmt: str, transpose: bool = False):
        mats = [sd[fmt.format(i)] for i in range(L)]
        return np.stack([m.T if transpose else m for m in mats])

    def stack_qkv(part: str, kind: str):
        outs = []
        for i in range(L):
            qkv = sd[f"blocks.{i}.attn.qkv.{kind}"]
            q, k, v = np.split(qkv, 3, axis=0)
            m = {"q": q, "k": k, "v": v}[part]
            outs.append(m.T if kind == "weight" else m)
        return np.stack(outs)

    layers = {
        "layer_norm1": {
            "scale": stack("blocks.{}.norm1.weight"),
            "bias": stack("blocks.{}.norm1.bias"),
        },
        "q_proj": {
            "kernel": stack_qkv("q", "weight"),
            "bias": stack_qkv("q", "bias"),
        },
        "k_proj": {
            "kernel": stack_qkv("k", "weight"),
            "bias": stack_qkv("k", "bias"),
        },
        "v_proj": {
            "kernel": stack_qkv("v", "weight"),
            "bias": stack_qkv("v", "bias"),
        },
        "out_proj": {
            "kernel": stack("blocks.{}.attn.proj.weight", True),
            "bias": stack("blocks.{}.attn.proj.bias"),
        },
        "layer_norm2": {
            "scale": stack("blocks.{}.norm2.weight"),
            "bias": stack("blocks.{}.norm2.bias"),
        },
        "fc1": {
            "kernel": stack("blocks.{}.mlp.fc1.weight", True),
            "bias": stack("blocks.{}.mlp.fc1.bias"),
        },
        "fc2": {
            "kernel": stack("blocks.{}.mlp.fc2.weight", True),
            "bias": stack("blocks.{}.mlp.fc2.bias"),
        },
    }
    if "blocks.0.ls1.gamma" in sd:  # timm layer-scale variant
        layers["ls1"] = {"scale": stack("blocks.{}.ls1.gamma")}
        layers["ls2"] = {"scale": stack("blocks.{}.ls2.gamma")}
    return layers


def convert_radio_state_dict(state: Dict[str, Any], cfg) -> Dict[str, Any]:
    """RADIO checkpoint (timm VisionTransformer under `radio_model.model.`
    or torchhub `model.` — llava/model/multimodal_encoder/radio_encoder.py:
    141, radio_torchhub_encoder.py) → vila_tpu.models.vit pytree.

    Supports both the standard timm patch-embed conv and RADIO's Cropped
    Positional Embedding patch generator (already a flat linear; its
    pos_embed covers patch tokens only, so a zero row is prepended for the
    class token). Multi-register variants (num_cls_tokens > 1) are not
    supported — use a single-summary checkpoint.
    """
    pre = _find_timm_prefix({k: None for k in state})
    sd = {k.removeprefix(pre): _np(v) for k, v in state.items() if k.startswith(pre)}
    L = cfg.num_hidden_layers

    if "patch_generator.embedder.weight" in sd:  # CPE case
        w = sd["patch_generator.embedder.weight"]  # (D, P*P*3)
        d = w.shape[0]
        patch_kernel = w.T
        patch = {"kernel": patch_kernel}
        if "patch_generator.embedder.bias" in sd:
            patch["bias"] = sd["patch_generator.embedder.bias"]
        pos = sd["patch_generator.pos_embed"].reshape(-1, d)
        cls_tok = sd["patch_generator.cls_token.token"].reshape(-1, d)
        if cls_tok.shape[0] != 1:
            raise ValueError(
                f"RADIO checkpoint has {cls_tok.shape[0]} summary/register "
                "tokens; only num_cls_tokens=1 is supported"
            )
        cls = cls_tok[0]
        # CPE pos_embed has no class row; our tower adds pos to all tokens
        pos = np.concatenate([np.zeros((1, d), pos.dtype), pos])
    else:
        conv_w = sd["patch_embed.proj.weight"]  # (D, 3, P, P)
        d = conv_w.shape[0]
        patch = {"kernel": conv_w.transpose(2, 3, 1, 0).reshape(-1, d)}
        if "patch_embed.proj.bias" in sd:
            patch["bias"] = sd["patch_embed.proj.bias"]
        pos = sd["pos_embed"].reshape(-1, d)
        cls = sd["cls_token"].reshape(-1)
        if pos.shape[0] == cfg.num_patches:  # no class row stored
            pos = np.concatenate([np.zeros((1, d), pos.dtype), pos])

    params = {
        "patch_embedding": patch,
        "position_embedding": {"embedding": pos},
        "class_embedding": cls,
        "layers": _timm_layers(sd, L),
    }
    if "norm.weight" in sd:
        params["post_layernorm"] = {
            "scale": sd["norm.weight"],
            "bias": sd["norm.bias"],
        }
    else:  # skip_layer_norm / Identity norm (radio_encoder.py:178)
        params["post_layernorm"] = {
            "scale": np.ones((d,), np.float32),
            "bias": np.zeros((d,), np.float32),
        }
    return params


def radio_image_stats(state: Dict[str, Any]):
    """Input-conditioner normalization stats from a RADIO checkpoint
    (`radio_model.input_conditioner.norm_{mean,std}`), or None."""
    for pre in ("radio_model.", "", "model."):
        mk, sk = f"{pre}input_conditioner.norm_mean", f"{pre}input_conditioner.norm_std"
        if mk in state:
            return (
                tuple(float(x) for x in _np(state[mk]).reshape(-1)),
                tuple(float(x) for x in _np(state[sk]).reshape(-1)),
            )
    return None


def convert_ps3_state_dict(state: Dict[str, Any], cfg) -> Dict[str, Any]:
    """PS3 checkpoint (external `ps3` package, ps3_encoder.py:35) →
    vila_tpu.models.ps3 pytree.

    The SigLIP trunk (`vision_model.trunk.*`, timm layout) converts
    one-to-one into our shared-trunk params. PS3's selection machinery
    (low-res-KV cross attention, per-scale prompts) is architecturally
    different from our static top-k redesign, so those weights have no
    mapping: scale embeddings import when present, and the selection /
    top-down heads fall back to zeros (uniform selection) — see
    docs/PS3_COMPAT.md for the full analysis.
    """
    cfg_vit = cfg.vit
    pre = _find_timm_prefix({k: None for k in state})
    sd = {k.removeprefix(pre): _np(v) for k, v in state.items() if k.startswith(pre)}
    L = cfg_vit.num_hidden_layers

    conv_w = sd["patch_embed.proj.weight"]
    d = conv_w.shape[0]
    trunk = {
        "patch_embedding": {
            "kernel": conv_w.transpose(2, 3, 1, 0).reshape(-1, d),
            "bias": sd.get(
                "patch_embed.proj.bias", np.zeros((d,), np.float32)
            ),
        },
        "position_embedding": {"embedding": sd["pos_embed"].reshape(-1, d)},
        "layers": _timm_layers(sd, L),
        "post_layernorm": {
            "scale": sd.get("norm.weight", np.ones((d,), np.float32)),
            "bias": sd.get("norm.bias", np.zeros((d,), np.float32)),
        },
    }

    full = {k: _np(v) for k, v in state.items()}
    n_scales = len(cfg.s3_scales)
    scale_emb = np.zeros((n_scales, d), np.float32)
    for key in ("vision_model.scale_embed", "scale_embed", "scale_embedding"):
        if key in full:
            se = full[key].reshape(-1, d)[:n_scales]
            scale_emb[: se.shape[0]] = se
            break
    params = {
        "vit": trunk,
        "scale_embedding": scale_emb,
        "select_head": {
            "kernel": np.zeros((d, 1), np.float32),
            "bias": np.zeros((1,), np.float32),
        },
    }
    if cfg.prompt_dim:
        params["top_down_prompt_head"] = {
            "kernel": np.zeros((cfg.prompt_dim, d), np.float32),
            "bias": np.zeros((d,), np.float32),
        }
    return params


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
