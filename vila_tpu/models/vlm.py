"""VLM meta-architecture: vision tower + projector + LLM with media splice.

Capability parity: `LlavaMetaModel`/`LlavaMetaForCausalLM`
(llava/model/llava_arch.py:51,411) — encode_images, media-token fusion
(`_embed`, llava_arch.py:412-490), dynamic-S2 feature merging
(llava_arch.py:256-394).

TPU-first redesign of `_embed`'s ragged splice: the host expands each media
token into a fixed run of placeholder positions (plus real text ids for the
encoder's start/end tokens — the reference embeds those strings with
embed_tokens and concatenates, which is equivalent). The device then does a
single static-shape scatter of the flattened vision features into the text
embedding table. No dynamic shapes ever reach XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.models import projector as projector_lib
from vila_tpu.models import qwen2, siglip

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    llm: qwen2.LLMConfig
    vision: Any  # SigLIPConfig | vit.ViTConfig (see vision_tower_type)
    projector: projector_lib.ProjectorConfig
    # tower dispatch (build_vision_tower, multimodal_encoder/builder.py:30):
    # "siglip" (default) | "clip" | "internvit"
    vision_tower_type: str = "siglip"
    vision_feature_layer: int = -2
    vision_select: str = "cls_patch"
    image_aspect_ratio: str = "resize"  # resize | pad | crop | dynamic | dynamic_s2
    num_video_frames: int = 8
    fps: float = 0.0
    # video token assembly (llava/model/encoders/video/): "basic" flattens
    # frames; "tsp" temporal-spatial mean-pools (encoders.py)
    video_encoder: str = "basic"
    tsp_pool_sizes: Tuple[Tuple[int, int, int], ...] = ((1, 1, 1),)
    # dynamic tiling params (mm_utils.py:299-405)
    min_tiles: int = 1
    max_tiles: int = 12
    # dynamic_s2 params
    s2_scales: Tuple[int, ...] = (448, 896, 1344)
    s2_resize_output_to_scale_idx: int = 0
    # media token ids (set after tokenizer is built)
    image_token_id: int = -1
    video_token_id: int = -1

    @property
    def tokens_per_image(self) -> int:
        """LLM tokens contributed by one vision-tower forward of one tile."""
        side = self.vision.image_size // self.vision.patch_size
        r = self.projector.downsample_rate
        return ((side + r - 1) // r) ** 2


def vision_module(cfg: VLMConfig):
    """Tower dispatch (multimodal_encoder/builder.py:30-68)."""
    if cfg.vision_tower_type in ("clip", "internvit"):
        from vila_tpu.models import vit

        return vit
    return siglip


def init_params(rng: jax.Array, cfg: VLMConfig, param_dtype=jnp.float32) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "llm": qwen2.init_params(r1, cfg.llm, param_dtype),
        "vision_tower": vision_module(cfg).init_params(
            r2, cfg.vision, param_dtype
        ),
        "mm_projector": projector_lib.init_params(r3, cfg.projector, param_dtype),
    }


def encode_images(
    params: Params, cfg: VLMConfig, pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """(N, H, W, 3) normalized pixels -> (N, tokens_per_image, llm_hidden).

    Mirrors `encode_images` (llava_arch.py:366) for the non-S2 path; the
    dynamic-S2 path lives in vila_tpu.models.s2.
    """
    feats = vision_module(cfg).forward(
        params["vision_tower"],
        cfg.vision,
        pixel_values,
        feature_layer=cfg.vision_feature_layer,
        select=cfg.vision_select,
    )
    return projector_lib.forward(params["mm_projector"], cfg.projector, feats)


def splice_media(
    text_embeds: jnp.ndarray,  # (B, S, D)
    media_embeds: jnp.ndarray,  # (M, D) flattened media features in order
    media_positions: jnp.ndarray,  # (M,) flat indices into B*S; >= B*S drops
) -> jnp.ndarray:
    """Scatter media embeddings into placeholder slots (static shapes)."""
    b, s, d = text_embeds.shape
    flat = text_embeds.reshape(b * s, d)
    flat = flat.at[media_positions].set(
        media_embeds.astype(flat.dtype), mode="drop"
    )
    return flat.reshape(b, s, d)


def forward(
    params: Params,
    cfg: VLMConfig,
    *,
    input_ids: jnp.ndarray,  # (B, S) with media placeholders expanded
    pixel_values: Optional[jnp.ndarray] = None,  # (N, H, W, 3)
    media_positions: Optional[jnp.ndarray] = None,  # (M,) flat indices
    positions: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    token_valid: Optional[jnp.ndarray] = None,
    cache: Optional[Params] = None,
    last_token_only: bool = False,
    gather_position: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    sp: Optional[Any] = None,  # parallel.sp.SPConfig
) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Fused multimodal forward. Returns (logits, new_cache)."""
    embeds = qwen2.embed_tokens(params["llm"], cfg.llm, input_ids)
    if pixel_values is not None:
        feats = encode_images(params, cfg, pixel_values)
        feats = feats.reshape(-1, feats.shape[-1])
        embeds = splice_media(embeds, feats, media_positions)
    return qwen2.forward(
        params["llm"],
        cfg.llm,
        inputs_embeds=embeds,
        positions=positions,
        segment_ids=segment_ids,
        token_valid=token_valid,
        cache=cache,
        last_token_only=last_token_only,
        gather_position=gather_position,
        attn_impl=attn_impl,
        sp=sp,
    )


def forward_batch(
    params: Params,
    cfg: VLMConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    attn_impl: str = "auto",
    return_hidden: bool = False,
    sp: Optional[Any] = None,  # parallel.sp.SPConfig
) -> jnp.ndarray:
    """Training forward over a collated batch. Returns logits (B, S, V),
    or final hidden states (B, S, D) with `return_hidden` (for the chunked
    cross-entropy path that never materializes full logits).

    Batch layout (see vila_tpu.data.collate):
      input_ids:       (B, S) with media placeholders expanded
      positions:       (B, S) RoPE positions (restart per packed segment)
      segment_ids:     (B, S) packing segments (0 = padding)
      pixel_values:    (B, T, s, s, 3) per-sample tiles (zero-padded)
      media_positions: (B, M) row-local flat indices, OOB sentinel for pads;
                       M == T * tokens_per_image
    """
    input_ids = batch["input_ids"]
    b, s = input_ids.shape
    embeds = qwen2.embed_tokens(params["llm"], cfg.llm, input_ids)

    pixels = batch.get("pixel_values")
    if pixels is not None:
        bt = pixels.shape[0] * pixels.shape[1]
        feats = encode_images(
            params, cfg, pixels.reshape((bt,) + pixels.shape[2:])
        )
        feats = feats.reshape(b, -1, feats.shape[-1])  # (B, M, D)
        mp = batch["media_positions"]
        # Row-local -> global flat indices; OOB sentinels stay OOB.
        offsets = (jnp.arange(b, dtype=mp.dtype) * s)[:, None]
        global_pos = jnp.where(mp < s, mp + offsets, jnp.asarray(1 << 30, mp.dtype))
        embeds = splice_media(
            embeds, feats.reshape(-1, feats.shape[-1]), global_pos.reshape(-1)
        )

    out, _ = qwen2.forward(
        params["llm"],
        cfg.llm,
        inputs_embeds=embeds,
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"),
        attn_impl=attn_impl,
        return_hidden=return_hidden,
        sp=sp,
    )
    return out
