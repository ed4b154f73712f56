"""Device mesh + GSPMD sharding rules.

The reference's parallel grid is DP × SP(Ulysses × Ring) on top of DeepSpeed
ZeRO-3 (SURVEY.md §2.3; llava/train/sequence_parallel/globals.py:58-147,
scripts/zero3.json). The TPU-native equivalent is a single
`jax.sharding.Mesh` with named axes and GSPMD sharding constraints:

  * dp    — data parallel (maps to DCN across slices, ICI within)
  * sp    — ring sequence parallel (outer sequence chunks; ppermute ring)
  * su    — Ulysses sequence parallel (inner; head-scatter all-to-all)
  * tp    — tensor parallel (not present in the reference; free win on TPU)

The reference's sp_degree = ring_degree × ulysses_degree
(sequence_parallel/globals.py:41-43) maps to sp × su here, ring major —
a contiguous global sequence slice lands on one ring shard, split among its
Ulysses group.

ZeRO-3 parameter sharding ≙ FSDP: every weight matrix is sharded over
(dp, sp, su) on one dimension ("fsdp" superaxis) and over tp on the other;
XLA inserts the all-gathers/reduce-scatters that DeepSpeed does by hand.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FSDP = ("dp", "sp", "su")  # superaxis used for ZeRO-3-style weight sharding
SEQ = ("sp", "su")  # superaxis the sequence dimension is sharded over


def make_mesh(
    dp: int = 1,
    sp: int = 1,
    tp: int = 1,
    su: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * sp * su * tp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, sp, su, tp)
    return Mesh(arr, axis_names=("dp", "sp", "su", "tp"))


def _div(n: int, mesh: Mesh, axes) -> bool:
    if axes is None:
        return True
    if isinstance(axes, str):
        axes = (axes,)
    size = 1
    for a in axes:
        size *= mesh.shape[a]
    return n % size == 0


def _spec(mesh: Mesh, shape: Tuple[int, ...], *axes) -> P:
    """PartitionSpec with divisibility guards (fall back to replication per
    dim when the dim doesn't divide the mesh axis)."""
    cleaned = []
    for dim, ax in zip(shape, axes):
        cleaned.append(ax if _div(dim, mesh, ax) else None)
    return P(*cleaned)


def llm_param_specs(cfg, mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec tree matching vila_tpu.models.qwen2 params."""
    D = cfg.hidden_size
    I = cfg.intermediate_size
    hd = cfg.head_dim_
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    V = cfg.vocab_size
    L = cfg.num_hidden_layers

    def s(shape, *axes):
        return _spec(mesh, shape, *axes)

    layers = {
        "input_layernorm": {"scale": s((L, D), None, None)},
        "q_proj": {"kernel": s((L, D, Hq * hd), None, FSDP, "tp")},
        "k_proj": {"kernel": s((L, D, Hkv * hd), None, FSDP, "tp")},
        "v_proj": {"kernel": s((L, D, Hkv * hd), None, FSDP, "tp")},
        "o_proj": {"kernel": s((L, Hq * hd, D), None, "tp", FSDP)},
        "post_attention_layernorm": {"scale": s((L, D), None, None)},
        "gate_proj": {"kernel": s((L, D, I), None, FSDP, "tp")},
        "up_proj": {"kernel": s((L, D, I), None, FSDP, "tp")},
        "down_proj": {"kernel": s((L, I, D), None, "tp", FSDP)},
    }
    if cfg.qkv_bias:
        layers["q_proj"]["bias"] = s((L, Hq * hd), None, "tp")
        layers["k_proj"]["bias"] = s((L, Hkv * hd), None, "tp")
        layers["v_proj"]["bias"] = s((L, Hkv * hd), None, "tp")
    specs = {
        "embed_tokens": {"embedding": s((V, D), "tp", FSDP)},
        "layers": layers,
        "norm": {"scale": s((D,), None)},
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = {"kernel": s((D, V), FSDP, "tp")}
    return specs


def siglip_param_specs(cfg, mesh: Mesh) -> Dict[str, Any]:
    D, I = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_hidden_layers
    pin = cfg.patch_size * cfg.patch_size * cfg.num_channels

    def s(shape, *axes):
        return _spec(mesh, shape, *axes)

    def proj(din, dout, din_ax, dout_ax):
        return {
            "kernel": s((L, din, dout), None, din_ax, dout_ax),
            "bias": s((L, dout), None, dout_ax),
        }

    def ln():
        return {"scale": s((L, D), None, None), "bias": s((L, D), None, None)}

    return {
        "patch_embedding": {
            "kernel": s((pin, D), None, FSDP),
            "bias": s((D,), None),
        },
        "position_embedding": {"embedding": s((cfg.num_patches, D), None, FSDP)},
        "layers": {
            "layer_norm1": ln(),
            "q_proj": proj(D, D, FSDP, "tp"),
            "k_proj": proj(D, D, FSDP, "tp"),
            "v_proj": proj(D, D, FSDP, "tp"),
            "out_proj": proj(D, D, "tp", FSDP),
            "layer_norm2": ln(),
            "fc1": proj(D, I, FSDP, "tp"),
            "fc2": proj(I, D, "tp", FSDP),
        },
        "post_layernorm": {"scale": s((D,), None), "bias": s((D,), None)},
    }


def projector_param_specs(proj_params, mesh: Mesh) -> Dict[str, Any]:
    """Shard projector linears over fsdp on the input dim."""

    def spec_for(slot):
        out = {}
        for k, v in slot.items():
            if k == "kernel":
                out[k] = _spec(mesh, v.shape, FSDP, "tp")
            else:
                out[k] = P(None)
        return out

    return {idx: spec_for(slot) for idx, slot in proj_params.items()}


def vlm_param_specs(cfg, params, mesh: Mesh) -> Dict[str, Any]:
    """Spec tree for a full VLM param pytree (vlm.init_params layout)."""
    if getattr(cfg, "vision_tower_type", "siglip") == "ps3":
        import dataclasses

        vit_cfg = dataclasses.replace(
            cfg.vision.vit, image_size=cfg.vision.s3_scales[0]
        )
        vision = {
            "vit": siglip_param_specs(vit_cfg, mesh),
            # selection heads / scale embeds are tiny — replicate
            "scale_embedding": P(),
            "select_head": {"kernel": P(), "bias": P()},
        }
        if "top_down_prompt_head" in params["vision_tower"]:
            vision["top_down_prompt_head"] = {"kernel": P(), "bias": P()}
    else:
        vision = siglip_param_specs(cfg.vision, mesh)
    return {
        "llm": llm_param_specs(cfg.llm, mesh),
        "vision_tower": vision,
        "mm_projector": projector_param_specs(params["mm_projector"], mesh),
    }


def to_shardings(specs, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, specs, mesh: Mesh):
    shardings = to_shardings(specs, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_specs(mesh: Mesh) -> Dict[str, P]:
    """Training batch sharding: batch over dp, sequence over sp×su."""
    return {
        "input_ids": P("dp", SEQ),
        "labels": P("dp", SEQ),
        "positions": P("dp", SEQ),
        "segment_ids": P("dp", SEQ),
        "pixel_values": P("dp"),
        "pixel_values_high": P("dp"),  # PS3 high-res scale
        "gt_selection_maps": P("dp"),  # PS3 selection supervision
        "media_positions": P("dp"),
    }
