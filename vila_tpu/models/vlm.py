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
    # "siglip" (default) | "clip" | "internvit" | "ps3" (VILA-HD top-down
    # selection; cfg.vision is then a ps3.PS3Config)
    vision_tower_type: str = "siglip"
    # PS3 look-close mode (llava_arch.py:1627): "after_image" selects
    # bottom-up; "after_prompt" runs the two-pass top-down generation (a
    # low-res pass produces the prompt embedding that steers selection)
    ps3_look_close_mode: str = "after_image"
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
        if self.vision_tower_type == "ps3":
            assert self.projector.downsample_rate == 1, (
                "PS3 output mixes grid and selected tokens; use a "
                "non-downsampling projector (linear / mlpNx_gelu)"
            )
            return self.vision.n_output_tokens
        side = self.vision.image_size // self.vision.patch_size
        r = self.projector.downsample_rate
        return ((side + r - 1) // r) ** 2

    @property
    def ps3_tokens_low(self) -> int:
        """Tokens of the PS3 low-res-only pass (num_look_close == 0)."""
        return self.vision.low_grid**2


def vision_module(cfg: VLMConfig):
    """Tower dispatch (multimodal_encoder/builder.py:30-68)."""
    if cfg.vision_tower_type in ("clip", "internvit", "radio"):
        # RADIO's backbone is a plain ViT (radio_encoder.py wraps NVIDIA's
        # torchhub model); the generic tower serves it on TPU.
        from vila_tpu.models import vit

        return vit
    if cfg.vision_tower_type == "ps3":
        from vila_tpu.models import ps3

        return ps3
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
    dynamic-S2 path lives in vila_tpu.models.s2, PS3 in encode_images_ps3.
    """
    if cfg.vision_tower_type == "ps3":
        raise ValueError("PS3 towers use encode_images_ps3 (two pixel scales)")
    feats = vision_module(cfg).forward(
        params["vision_tower"],
        cfg.vision,
        pixel_values,
        feature_layer=cfg.vision_feature_layer,
        select=cfg.vision_select,
    )
    return projector_lib.forward(params["mm_projector"], cfg.projector, feats)


def encode_images_ps3(
    params: Params,
    cfg: VLMConfig,
    pixels_low: jnp.ndarray,  # (N, s0, s0, 3)
    pixels_high: Optional[Any] = None,  # (N, s1, s1, 3) or list per hi scale
    *,
    prompt: Optional[jnp.ndarray] = None,  # (N, llm_hidden) top-down prompt
    num_look_close: Optional[int] = None,
    gt_selection_maps: Optional[jnp.ndarray] = None,
    smooth_selection_prob: bool = False,
):
    """PS3 selective encode + projection (encode_images_ps3,
    llava_arch.py:967). Returns (proj_feats, selection_probs, maps)."""
    from vila_tpu.models import ps3 as ps3_lib

    if pixels_high is not None and not isinstance(pixels_high, (list, tuple)):
        pixels_high = [pixels_high]
    feats, probs, maps = ps3_lib.forward(
        params["vision_tower"],
        cfg.vision,
        pixels_low,
        pixels_high,
        prompt=prompt,
        num_look_close=num_look_close,
        gt_selection_maps=gt_selection_maps,
        smooth_selection_prob=smooth_selection_prob,
        feature_layer=cfg.vision_feature_layer,
    )
    proj = projector_lib.forward(params["mm_projector"], cfg.projector, feats)
    return proj, probs, maps


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

    if cfg.vision_tower_type == "ps3":
        out, _ = forward_batch_ps3(
            params, cfg, batch, embeds=embeds,
            attn_impl=attn_impl, return_hidden=return_hidden, sp=sp,
        )
        return out

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


def forward_batch_ps3(
    params: Params,
    cfg: VLMConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    embeds: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    return_hidden: bool = False,
    sp: Optional[Any] = None,
    num_look_close: Optional[int] = None,
) -> Tuple[jnp.ndarray, list]:
    """PS3 training forward: bottom-up look-close selection (the
    reference's `look_close_mode="after_image"` training path,
    llava_trainer.py:917-998). Returns (logits_or_hidden, selection_probs)
    so the trainer can add the BCE+dice token-selection loss.

    Extra batch keys vs forward_batch:
      pixel_values_high: (B, T, s1, s1, 3) per hi scale (or a list)
      gt_selection_maps: (B, T, gh, gw) binary, optional
    """
    input_ids = batch["input_ids"]
    b, s = input_ids.shape
    if embeds is None:
        embeds = qwen2.embed_tokens(params["llm"], cfg.llm, input_ids)

    sel_probs: list = []
    pixels = batch.get("pixel_values")
    if pixels is not None:
        bt = pixels.shape[0] * pixels.shape[1]
        low = pixels.reshape((bt,) + pixels.shape[2:])
        high = batch.get("pixel_values_high")
        if high is not None and not isinstance(high, (list, tuple)):
            high = [high]
        if high is not None:
            high = [h.reshape((bt,) + h.shape[2:]) for h in high]
        gt = batch.get("gt_selection_maps")
        if gt is not None:
            gt = gt.reshape((bt,) + gt.shape[2:])
        feats, sel_probs, _ = encode_images_ps3(
            params, cfg, low, high,
            gt_selection_maps=gt,
            num_look_close=num_look_close,
            smooth_selection_prob=False,
        )
        feats = feats.reshape(b, -1, feats.shape[-1])
        mp = batch["media_positions"]
        offsets = (jnp.arange(b, dtype=mp.dtype) * s)[:, None]
        global_pos = jnp.where(
            mp < s, mp + offsets, jnp.asarray(1 << 30, mp.dtype)
        )
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
    return out, sel_probs
