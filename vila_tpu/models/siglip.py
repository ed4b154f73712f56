"""SigLIP vision tower — functional JAX, scan-over-layers, fused patch-embed.

Capability parity: the reference's default NVILA tower is a vendored
`SiglipVisionModel` with FlashAttention2
(llava/model/multimodal_encoder/siglip/modeling_siglip.py, selected by
llava/model/multimodal_encoder/siglip_encoder.py:25). Feature extraction
follows `VisionTower.feature_select`
(llava/model/multimodal_encoder/vision_encoder.py:44-52): hidden state of an
intermediate layer (default -2), `patch` or `cls_patch` token selection.

TPU-first choices:
  * The stride==kernel patch conv is a single GEMM on pre-patchified pixels
    (MXU-friendly fused patch-embed) instead of a convolution.
  * `feature_select(layer=-2)` is implemented by simply *not running* the
    final encoder layer(s) — no giant all-hidden-states tuple.
  * Encoder layers are stacked and scanned like the LLM.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.ops.attention import multi_head_attention
from vila_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    dtype: str = "float32"
    # Processor normalization, applied on-device when given uint8 pixels
    # (siglip processor: rescale 1/255, mean/std 0.5).
    image_mean: Tuple[float, ...] = (0.5, 0.5, 0.5)
    image_std: Tuple[float, ...] = (0.5, 0.5, 0.5)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf_config(cls, hf: dict, **overrides) -> "SigLIPConfig":
        kw = dict(
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            image_size=hf["image_size"],
            patch_size=hf["patch_size"],
            num_channels=hf.get("num_channels", 3),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-6),
        )
        kw.update(overrides)
        return cls(**kw)


def init_params(rng: jax.Array, cfg: SigLIPConfig, param_dtype=jnp.float32) -> Params:
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    patch_in = cfg.patch_size * cfg.patch_size * cfg.num_channels
    keys = iter(jax.random.split(rng, 16))

    def dense(key, shape):
        return (0.02 * jax.random.normal(key, shape, jnp.float32)).astype(param_dtype)

    def ln(shape):
        return {"scale": jnp.ones(shape, param_dtype), "bias": jnp.zeros(shape, param_dtype)}

    def proj(key, shape_in, shape_out):
        return {
            "kernel": dense(key, (L, shape_in, shape_out)),
            "bias": jnp.zeros((L, shape_out), param_dtype),
        }

    return {
        "patch_embedding": {
            "kernel": dense(next(keys), (patch_in, D)),
            "bias": jnp.zeros((D,), param_dtype),
        },
        "position_embedding": {
            "embedding": dense(next(keys), (cfg.num_patches, D))
        },
        "layers": {
            "layer_norm1": ln((L, D)),
            "q_proj": proj(next(keys), D, D),
            "k_proj": proj(next(keys), D, D),
            "v_proj": proj(next(keys), D, D),
            "out_proj": proj(next(keys), D, D),
            "layer_norm2": ln((L, D)),
            "fc1": proj(next(keys), D, I),
            "fc2": proj(next(keys), I, D),
        },
        "post_layernorm": ln((D,)),
    }


def patchify(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, patch*patch*C), pixels flattened (row, col, ch)."""
    b, h, w, c = pixel_values.shape
    gh, gw = h // patch, w // patch
    x = pixel_values.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def _linear(x, p, dtype):
    if "w8" in p:  # W8A8 slot (quantize_siglip_w8a8)
        from vila_tpu.ops.quant import w8a8_linear

        return w8a8_linear(x, p, dtype)
    y = jnp.dot(x, p["kernel"].astype(dtype))
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def quantize_siglip_w8a8(params: Params) -> Params:
    """Quantize the encoder's linear layers to W8A8 (int8 MXU dots) —
    TinyChat's vision-tower deployment recipe (README.md:87-88: "W4A16 LLM
    + W8A8 vision"). Norms, the patch GEMM (couples with the normalization
    constants), and position embeddings stay in the compute dtype; each
    stacked (L, din, dout) projection becomes {w8, w_scale[, bias]} and
    `_linear` dispatches on the slot contents."""
    from vila_tpu.ops.quant import quantize_w8a8

    src = params["layers"]
    layers: Params = {
        "layer_norm1": src["layer_norm1"],
        "layer_norm2": src["layer_norm2"],
    }
    for name in ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"):
        slot = quantize_w8a8(src[name]["kernel"])
        if "bias" in src[name]:
            slot["bias"] = src[name]["bias"]
        layers[name] = slot
    return {**params, "layers": layers}


def resize_position_embedding(pos_embed: jnp.ndarray, num_new: int) -> jnp.ndarray:
    """1-D linear interpolation of position embeddings for resolution
    elevation (reference: vision_encoder.py:54-131 `_maybe_resize_pos_embeds`,
    interpolate_mode='linear')."""
    old = pos_embed.shape[0]
    if old == num_new:
        return pos_embed
    mapped = jnp.arange(num_new, dtype=jnp.float32) / (num_new - 1) * (old - 1)
    lo = jnp.clip(jnp.floor(mapped).astype(jnp.int32), 0, old - 1)
    hi = jnp.clip(jnp.ceil(mapped).astype(jnp.int32), 0, old - 1)
    frac = mapped - lo.astype(jnp.float32)
    return (
        pos_embed[hi] * frac[:, None] + pos_embed[lo] * (1.0 - frac[:, None])
    ).astype(pos_embed.dtype)


def embed_pixels(
    params: Params, cfg: SigLIPConfig, pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """(B, H, W, C) pixels -> (B, N, D) patch embeddings + position embeds.

    uint8 input is rescaled/normalized on-device (the processor math fuses
    into the patch GEMM); position embeddings resize for off-native
    resolutions (vision_encoder.py:54-131)."""
    dtype = cfg.compute_dtype
    if pixel_values.dtype == jnp.uint8:
        mean = jnp.asarray(cfg.image_mean, dtype) * 255.0
        std = jnp.asarray(cfg.image_std, dtype) * 255.0
        pixel_values = (pixel_values.astype(dtype) - mean) / std
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    h = _linear(x, params["patch_embedding"], dtype)
    pos = params["position_embedding"]["embedding"]
    if pos.shape[0] != h.shape[1]:
        pos = resize_position_embedding(pos, h.shape[1])
    return h + pos.astype(dtype)[None]


def encode_tokens(
    params: Params,
    cfg: SigLIPConfig,
    h: jnp.ndarray,  # (B, S, D) embedded tokens (any composition)
    *,
    feature_layer: int = -2,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Run the encoder trunk over an arbitrary token sequence up to
    `feature_layer`. Token-level entry point shared by the plain tower,
    S2, and the PS3 selective tower (which mixes low-res and selected
    high-res tokens in one sequence)."""
    dtype = cfg.compute_dtype
    L = cfg.num_hidden_layers
    n_run = feature_layer + L + 1 if feature_layer < 0 else feature_layer
    assert 0 <= n_run <= L, f"feature_layer {feature_layer} out of range"

    b, s, d = h.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def layer_fn(h, lp):
        x = layer_norm(
            h, lp["layer_norm1"]["scale"], lp["layer_norm1"]["bias"],
            cfg.layer_norm_eps,
        )
        q = _linear(x, lp["q_proj"], dtype).reshape(b, s, nh, hd)
        k = _linear(x, lp["k_proj"], dtype).reshape(b, s, nh, hd)
        v = _linear(x, lp["v_proj"], dtype).reshape(b, s, nh, hd)
        attn = multi_head_attention(q, k, v, causal=False, impl=attn_impl)
        attn = attn.reshape(b, s, d)
        h = h + _linear(attn, lp["out_proj"], dtype)

        x = layer_norm(
            h, lp["layer_norm2"]["scale"], lp["layer_norm2"]["bias"],
            cfg.layer_norm_eps,
        )
        x = jax.nn.gelu(_linear(x, lp["fc1"], dtype), approximate=True)
        h = h + _linear(x, lp["fc2"], dtype)
        return h, None

    run_params = jax.tree.map(lambda p: p[:n_run], params["layers"])
    h, _ = jax.lax.scan(lambda c, lp: layer_fn(c, lp), h, run_params)

    if n_run == L:
        h = layer_norm(
            h,
            params["post_layernorm"]["scale"],
            params["post_layernorm"]["bias"],
            cfg.layer_norm_eps,
        )
    return h


def forward(
    params: Params,
    cfg: SigLIPConfig,
    pixel_values: jnp.ndarray,  # (B, H, W, C) normalized
    *,
    feature_layer: int = -2,
    select: str = "cls_patch",
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Run the tower up to `feature_layer`, return selected patch features.

    feature_layer follows HF hidden_states indexing: -1 == after last layer,
    -2 == after layer L-1, 0 == embeddings. post_layernorm is only applied
    when running the full depth (feature_layer == -1), matching HF where the
    intermediate hidden states are pre-norm.
    """
    h = embed_pixels(params, cfg, pixel_values)
    h = encode_tokens(
        params, cfg, h, feature_layer=feature_layer, attn_impl=attn_impl
    )

    if select == "patch":
        # SigLIP has no CLS token; `patch` mode drops the first token to
        # mirror the reference's behaviour exactly (vision_encoder.py:46-48).
        h = h[:, 1:]
    elif select != "cls_patch":
        raise ValueError(f"unknown select: {select}")
    return h
