"""Generic pre-norm ViT tower: CLIP and InternViT variants — functional JAX.

Capability parity: the reference's alternative vision towers —
`CLIPVisionTower` (llava/model/multimodal_encoder/clip_encoder.py) and
`InternVisionTower` (llava/model/multimodal_encoder/intern_encoder.py),
dispatched by `build_vision_tower`
(llava/model/multimodal_encoder/builder.py:30-68). Feature extraction
follows `VisionTower.feature_select` (vision_encoder.py:44-52).

One parameterized tower covers both:
  * CLIP: class token, learned pos embeds (N+1), pre-embed LayerNorm,
    quick_gelu MLP.
  * InternViT: class token, layer-scale residual weights (ls1/ls2),
    optional qk-normalization, gelu MLP.

Same TPU-first choices as the SigLIP tower: fused patch-embed GEMM,
scan-over-stacked-layers, intermediate features by not running the tail.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.ops.attention import multi_head_attention
from vila_tpu.ops.norms import layer_norm
from vila_tpu.models.siglip import patchify, resize_position_embedding

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # quick_gelu (CLIP) | gelu (InternViT)
    class_token: bool = True
    pre_layernorm: bool = True  # CLIP pre_layrnorm
    layer_scale: bool = False  # InternViT ls1/ls2
    qk_norm: bool = False  # InternViT qk normalization
    dtype: str = "float32"
    image_mean: Tuple[float, ...] = (0.48145466, 0.4578275, 0.40821073)
    image_std: Tuple[float, ...] = (0.26862954, 0.26130258, 0.27577711)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + (1 if self.class_token else 0)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf_config(cls, hf: dict, **overrides) -> "ViTConfig":
        model_type = hf.get("model_type", "clip_vision_model")
        kw = dict(
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            image_size=hf["image_size"],
            patch_size=hf["patch_size"],
            num_channels=hf.get("num_channels", 3),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
            hidden_act=hf.get("hidden_act", "quick_gelu"),
        )
        if "intern" in model_type:
            kw.update(
                hidden_act=hf.get("hidden_act", "gelu"),
                layer_scale=True,
                qk_norm=hf.get("qk_normalization", False),
                pre_layernorm=False,
                image_mean=(0.485, 0.456, 0.406),
                image_std=(0.229, 0.224, 0.225),
            )
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def from_radio_config(cls, hf: dict, **overrides) -> "ViTConfig":
        """Config for a RADIO tower (multimodal_encoder/radio_encoder.py).

        The HF-hub RADIO config carries a timm model name under
        `args.model`; dims come from the timm table below, or from direct
        `hidden_size`/... fields when present (our save path writes those).
        """
        args = hf.get("args") or {}
        name = args.get("model") or hf.get("model") or ""
        dims = None
        for timm_name, d in _TIMM_VIT_DIMS.items():
            if name.startswith(timm_name):
                dims = d
                break
        if dims is None and "hidden_size" not in hf:
            raise ValueError(
                f"unknown RADIO timm model {name!r} and no direct dims in config"
            )
        if dims is not None:
            hidden, inter, layers, heads = dims
        patch = hf.get("patch_size") or (14 if "patch14" in name else 16)
        pref = hf.get("preferred_resolution") or [432, 432]
        image_size = hf.get("image_size") or (
            pref[0] if isinstance(pref, (list, tuple)) else pref
        )
        kw = dict(
            hidden_size=hf.get("hidden_size", dims and hidden),
            intermediate_size=hf.get("intermediate_size", dims and inter),
            num_hidden_layers=hf.get("num_hidden_layers", dims and layers),
            num_attention_heads=hf.get("num_attention_heads", dims and heads),
            image_size=image_size,
            patch_size=patch,
            hidden_act="gelu",
            pre_layernorm=False,
            layer_norm_eps=hf.get("layer_norm_eps", 1e-6),
            image_mean=(0.485, 0.456, 0.406),
            image_std=(0.229, 0.224, 0.225),
        )
        kw.update(overrides)
        return cls(**kw)


# timm VisionTransformer dims: name prefix -> (hidden, mlp, layers, heads)
_TIMM_VIT_DIMS = {
    "vit_small_patch16": (384, 1536, 12, 6),
    "vit_base_patch16": (768, 3072, 12, 12),
    "vit_base_patch14": (768, 3072, 12, 12),
    "vit_large_patch16": (1024, 4096, 24, 16),
    "vit_large_patch14": (1024, 4096, 24, 16),
    "vit_huge_patch16": (1280, 5120, 32, 16),
    "vit_huge_patch14": (1280, 5120, 32, 16),
}


def init_params(rng: jax.Array, cfg: ViTConfig, param_dtype=jnp.float32) -> Params:
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    patch_in = cfg.patch_size * cfg.patch_size * cfg.num_channels
    keys = iter(jax.random.split(rng, 16))

    def dense(key, shape):
        return (0.02 * jax.random.normal(key, shape, jnp.float32)).astype(param_dtype)

    def ln(shape):
        return {
            "scale": jnp.ones(shape, param_dtype),
            "bias": jnp.zeros(shape, param_dtype),
        }

    def proj(key, din, dout):
        return {
            "kernel": dense(key, (L, din, dout)),
            "bias": jnp.zeros((L, dout), param_dtype),
        }

    layers = {
        "layer_norm1": ln((L, D)),
        "q_proj": proj(next(keys), D, D),
        "k_proj": proj(next(keys), D, D),
        "v_proj": proj(next(keys), D, D),
        "out_proj": proj(next(keys), D, D),
        "layer_norm2": ln((L, D)),
        "fc1": proj(next(keys), D, I),
        "fc2": proj(next(keys), I, D),
    }
    if cfg.layer_scale:
        layers["ls1"] = {"scale": jnp.ones((L, D), param_dtype) * 0.1}
        layers["ls2"] = {"scale": jnp.ones((L, D), param_dtype) * 0.1}
    if cfg.qk_norm:
        layers["q_norm"] = {"scale": jnp.ones((L, D), param_dtype)}
        layers["k_norm"] = {"scale": jnp.ones((L, D), param_dtype)}

    params: Params = {
        "patch_embedding": {"kernel": dense(next(keys), (patch_in, D))},
        "position_embedding": {
            "embedding": dense(next(keys), (cfg.num_positions, D))
        },
        "layers": layers,
    }
    if cfg.class_token:
        params["class_embedding"] = dense(next(keys), (D,))
    if cfg.pre_layernorm:
        params["pre_layernorm"] = ln((D,))
    params["post_layernorm"] = ln((D,))
    return params


def _linear(x, p, dtype):
    if "w8" in p:  # W8A8 slot (quantize_vit_w8a8)
        from vila_tpu.ops.quant import w8a8_linear

        return w8a8_linear(x, p, dtype)
    y = jnp.dot(x, p["kernel"].astype(dtype))
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def quantize_vit_w8a8(params: Params) -> Params:
    """W8A8 for the generic ViT towers (CLIP/InternViT/RADIO) — same
    TinyChat vision recipe as `siglip.quantize_siglip_w8a8`: int8 MXU dots
    on the stacked encoder projections; norms / patch embed / pos embed /
    CLS stay in the compute dtype."""
    from vila_tpu.ops.quant import quantize_w8a8

    src = params["layers"]
    layers: Params = dict(src)
    for name in ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"):
        slot = quantize_w8a8(src[name]["kernel"])
        if "bias" in src[name]:
            slot["bias"] = src[name]["bias"]
        layers[name] = slot
    return {**params, "layers": layers}


def _act(x, kind: str):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def forward(
    params: Params,
    cfg: ViTConfig,
    pixel_values: jnp.ndarray,  # (B, H, W, C)
    *,
    feature_layer: int = -2,
    select: str = "patch",
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Run to `feature_layer`, return selected tokens (vision_encoder.py:44)."""
    dtype = cfg.compute_dtype
    L = cfg.num_hidden_layers
    n_run = feature_layer + L + 1 if feature_layer < 0 else feature_layer
    assert 0 <= n_run <= L

    if pixel_values.dtype == jnp.uint8:
        mean = jnp.asarray(cfg.image_mean, dtype) * 255.0
        std = jnp.asarray(cfg.image_std, dtype) * 255.0
        pixel_values = (pixel_values.astype(dtype) - mean) / std

    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    h = _linear(x, params["patch_embedding"], dtype)
    if cfg.class_token:
        cls = jnp.broadcast_to(
            params["class_embedding"].astype(dtype)[None, None, :],
            (h.shape[0], 1, h.shape[2]),
        )
        h = jnp.concatenate([cls, h], axis=1)
    pos = params["position_embedding"]["embedding"]
    if pos.shape[0] != h.shape[1]:
        pos = resize_position_embedding(pos, h.shape[1])
    h = h + pos.astype(dtype)[None]
    if cfg.pre_layernorm and "pre_layernorm" in params:
        h = layer_norm(
            h,
            params["pre_layernorm"]["scale"],
            params["pre_layernorm"]["bias"],
            cfg.layer_norm_eps,
        )

    b, s, d = h.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def layer_fn(h, lp):
        from vila_tpu.ops.norms import rms_norm

        x = layer_norm(
            h, lp["layer_norm1"]["scale"], lp["layer_norm1"]["bias"],
            cfg.layer_norm_eps,
        )
        q = _linear(x, lp["q_proj"], dtype)
        k = _linear(x, lp["k_proj"], dtype)
        v = _linear(x, lp["v_proj"], dtype)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"]["scale"], cfg.layer_norm_eps)
            k = rms_norm(k, lp["k_norm"]["scale"], cfg.layer_norm_eps)
        attn = multi_head_attention(
            q.reshape(b, s, nh, hd),
            k.reshape(b, s, nh, hd),
            v.reshape(b, s, nh, hd),
            causal=False,
            impl=attn_impl,
        ).reshape(b, s, d)
        attn = _linear(attn, lp["out_proj"], dtype)
        if cfg.layer_scale:
            attn = attn * lp["ls1"]["scale"].astype(dtype)
        h = h + attn

        x = layer_norm(
            h, lp["layer_norm2"]["scale"], lp["layer_norm2"]["bias"],
            cfg.layer_norm_eps,
        )
        x = _linear(_act(_linear(x, lp["fc1"], dtype), cfg.hidden_act),
                    lp["fc2"], dtype)
        if cfg.layer_scale:
            x = x * lp["ls2"]["scale"].astype(dtype)
        h = h + x
        return h, None

    run_params = jax.tree.map(lambda p: p[:n_run], params["layers"])
    h, _ = jax.lax.scan(layer_fn, h, run_params)

    if n_run == L:
        h = layer_norm(
            h,
            params["post_layernorm"]["scale"],
            params["post_layernorm"]["bias"],
            cfg.layer_norm_eps,
        )

    if select == "patch" and cfg.class_token:
        h = h[:, 1:]
    elif select == "patch":
        h = h[:, 1:]  # reference drops token 0 regardless
    elif select != "cls_patch":
        raise ValueError(f"unknown select: {select}")
    return h
