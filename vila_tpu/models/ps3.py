"""PS3 / VILA-HD: multi-scale top-down token selection vision tower.

Capability parity: the reference's PS3 path — `LlavaTopDownMetaForCausalLM`
(llava/model/llava_arch.py:966-1685: encode_images_ps3, two-pass `_embed`
with top-down prompts, `generate` :1611), the top-down prompt head
(multimodal_projector/base_projector.py:226-238), and the token-selection
BCE+dice training loss (llava/train/llava_trainer.py:859-915). The PS3
encoder itself lives in the external `ps3` package in the reference; here it
is implemented natively, TPU-first:

  * **Static-shape selection**: every scale selects a FIXED K =
    num_hires_select × num_look_close patches via `jax.lax.top_k` + gather —
    no dynamic shapes reach XLA (the reference's `num_look_close` loop
    becomes one wider top-k, which selects the same token set).
  * **Shared trunk**: low-res tokens and the selected high-res tokens run
    through ONE SigLIP trunk invocation (siglip.encode_tokens), so selected
    patches get global attention over the low-res context — the role of
    PS3's low-res-KV cross attention.
  * **Two-stage compute**: pass 1 encodes the low-res grid (selection
    basis), pass 2 encodes [low tokens ++ selected hi tokens]. Total cost
    ≈ 2·N_low + K trunk tokens instead of the full high-res grid (e.g.
    1/16th of dense 1792² encoding at K=256).
  * Selection scores = bottom-up saliency head + optional top-down prompt
    dot-product (prompt = LLM hidden state at the end of the user prompt,
    projected by `top_down_prompt_head` — base_projector.py:227).
  * `gt_selection_maps` teacher-forces the selection during training while
    BCE+dice supervises the probabilities (llava_trainer.py:885-915).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.models import siglip

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class PS3Config:
    """vit.image_size is the base (low-res) scale = s3_scales[0]."""

    vit: siglip.SigLIPConfig
    s3_scales: Tuple[int, ...] = (448, 896)  # low -> high (ref: 378/756/1512)
    num_hires_select: int = 64  # K tokens per look-close pass per hi scale
    num_look_close: int = 1
    prompt_dim: int = 0  # LLM hidden size; 0 disables the top-down head

    # --- properties the VLM layer needs -----------------------------------
    @property
    def hidden_size(self) -> int:
        return self.vit.hidden_size

    @property
    def image_size(self) -> int:  # low-res scale (preprocessor base)
        return self.s3_scales[0]

    @property
    def patch_size(self) -> int:
        return self.vit.patch_size

    @property
    def dtype(self) -> str:
        return self.vit.dtype

    @property
    def compute_dtype(self):
        return self.vit.compute_dtype

    @property
    def low_grid(self) -> int:
        return self.s3_scales[0] // self.vit.patch_size

    def hi_grid(self, i: int) -> int:
        return self.s3_scales[i] // self.vit.patch_size

    @property
    def k_per_scale(self) -> int:
        return self.num_hires_select * max(self.num_look_close, 1)

    @property
    def n_output_tokens(self) -> int:
        """Low-res grid + K selected tokens per high-res scale."""
        return self.low_grid**2 + self.k_per_scale * (len(self.s3_scales) - 1)

    @classmethod
    def from_hf_config(cls, hf: dict, **overrides) -> "PS3Config":
        """Tolerant parser for a PS3 checkpoint's vision config (the
        external `ps3` package's PS3VisionConfig uses open_clip-style
        width/layers naming; our save path writes HF-style names)."""
        vis = hf.get("vision_config") or hf
        width = vis.get("hidden_size") or vis.get("width") or 1152
        layers = vis.get("num_hidden_layers") or vis.get("layers") or 27
        heads = vis.get("num_attention_heads") or vis.get("heads") or 16
        inter = vis.get("intermediate_size") or int(
            width * vis.get("mlp_ratio", 3.7362)
        )
        patch = vis.get("patch_size") or 14
        scales = tuple(
            vis.get("ps3_scales")
            or vis.get("s3_scales")
            or hf.get("ps3_scales")
            or (378, 756, 1512)
        )
        vit_cfg = siglip.SigLIPConfig(
            hidden_size=width,
            intermediate_size=inter,
            num_hidden_layers=layers,
            num_attention_heads=heads,
            image_size=scales[0],
            patch_size=patch,
            layer_norm_eps=vis.get("layer_norm_eps", 1e-6),
            dtype=overrides.pop("dtype", "float32"),
        )
        kw = dict(
            vit=vit_cfg,
            s3_scales=scales,
            num_hires_select=(
                vis.get("num_hires_select")
                or hf.get("num_hires_select")
                or 64
            ),
            num_look_close=hf.get("num_look_close", 1),
        )
        kw.update(overrides)
        return cls(**kw)


def init_params(
    rng: jax.Array, cfg: PS3Config, param_dtype=jnp.float32
) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    D = cfg.vit.hidden_size
    vit_cfg = dataclasses.replace(cfg.vit, image_size=cfg.s3_scales[0])
    params: Params = {
        "vit": siglip.init_params(k1, vit_cfg, param_dtype),
        "scale_embedding": (
            0.02 * jax.random.normal(k2, (len(cfg.s3_scales), D), jnp.float32)
        ).astype(param_dtype),
        "select_head": {
            "kernel": (
                0.02 * jax.random.normal(k3, (D, 1), jnp.float32)
            ).astype(param_dtype),
            "bias": jnp.zeros((1,), param_dtype),
        },
    }
    if cfg.prompt_dim:
        # relocated from the reference's projector (base_projector.py:227):
        # LLM hidden -> vision hidden, dotted against patch features
        params["top_down_prompt_head"] = {
            "kernel": (
                0.02
                * jax.random.normal(k4, (cfg.prompt_dim, D), jnp.float32)
            ).astype(param_dtype),
            "bias": jnp.zeros((D,), param_dtype),
        }
    return params


def _upsample_grid(x: jnp.ndarray, g_from: int, g_to: int) -> jnp.ndarray:
    """(N, g_from², D) -> (N, g_to², D) nearest-neighbour grid upsample."""
    assert g_to % g_from == 0, (g_from, g_to)
    r = g_to // g_from
    n, _, d = x.shape
    x = x.reshape(n, g_from, g_from, d)
    x = jnp.repeat(jnp.repeat(x, r, axis=1), r, axis=2)
    return x.reshape(n, g_to * g_to, d)


def selection_logits(
    params: Params,
    cfg: PS3Config,
    low_feats: jnp.ndarray,  # (N, low_grid², D) pass-1 features
    g_hi: int,
    prompt: Optional[jnp.ndarray],  # (N, prompt_dim) top-down prompt
) -> jnp.ndarray:
    """(N, g_hi²) selection logits: bottom-up saliency + top-down match."""
    dtype = cfg.compute_dtype
    f = _upsample_grid(low_feats, cfg.low_grid, g_hi).astype(dtype)
    logits = (
        jnp.dot(f, params["select_head"]["kernel"].astype(dtype))[..., 0]
        + params["select_head"]["bias"].astype(dtype)[0]
    )
    if prompt is not None and "top_down_prompt_head" in params:
        hd = params["top_down_prompt_head"]
        p = (
            jnp.dot(prompt.astype(dtype), hd["kernel"].astype(dtype))
            + hd["bias"].astype(dtype)
        )  # (N, D)
        logits = logits + jnp.einsum(
            "ntd,nd->nt", f, p
        ) / jnp.sqrt(jnp.asarray(f.shape[-1], dtype))
    return logits


def forward(
    params: Params,
    cfg: PS3Config,
    pixels_low: jnp.ndarray,  # (N, s0, s0, 3)
    pixels_high: Optional[List[jnp.ndarray]] = None,  # [(N, s_i, s_i, 3)]
    *,
    prompt: Optional[jnp.ndarray] = None,  # (N, prompt_dim)
    num_look_close: Optional[int] = None,  # 0 = low-res only (pass 1)
    gt_selection_maps: Optional[jnp.ndarray] = None,  # (N, gh, gw) binary
    smooth_selection_prob: bool = False,
    feature_layer: int = -2,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """Selective multi-scale encode.

    Returns (features, selection_probs, selection_maps):
      features        (N, n_output_tokens, D) — or (N, low_grid², D) when
                      num_look_close == 0 (the "don't look close" pass that
                      produces the top-down prompt; llava_arch.py:1165)
      selection_probs [(N, g_i, g_i) f32] per high scale (for BCE+dice)
      selection_maps  [(N, g_i, g_i) bool] chosen tokens per high scale
    """
    nlc = cfg.num_look_close if num_look_close is None else num_look_close
    dtype = cfg.compute_dtype
    vit_cfg = dataclasses.replace(cfg.vit, image_size=cfg.s3_scales[0])
    vparams = params["vit"]
    scale_emb = params["scale_embedding"].astype(dtype)

    # pass 1: low-res trunk (selection basis)
    tokens_low = siglip.embed_pixels(vparams, vit_cfg, pixels_low)
    tokens_low = tokens_low + scale_emb[0]
    low_feats = siglip.encode_tokens(
        vparams, vit_cfg, tokens_low,
        feature_layer=feature_layer, attn_impl=attn_impl,
    )

    probs_all: List[jnp.ndarray] = []
    maps_all: List[jnp.ndarray] = []
    if nlc == 0 or len(cfg.s3_scales) == 1:
        # low-res only: still report selection probs for introspection/loss
        for i in range(1, len(cfg.s3_scales)):
            g = cfg.hi_grid(i)
            logits = selection_logits(params, cfg, low_feats, g, prompt)
            probs_all.append(
                jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1, g, g)
            )
            maps_all.append(jnp.zeros((pixels_low.shape[0], g, g), jnp.bool_))
        return low_feats, probs_all, maps_all

    assert pixels_high is not None and len(pixels_high) == len(cfg.s3_scales) - 1
    k = cfg.num_hires_select * nlc
    n = pixels_low.shape[0]
    hi_token_parts = []
    for i in range(1, len(cfg.s3_scales)):
        g = cfg.hi_grid(i)
        logits = selection_logits(params, cfg, low_feats, g, prompt)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))  # (N, g²)
        probs_all.append(probs.reshape(n, g, g))

        score = probs
        if gt_selection_maps is not None:
            # teacher-force: gt-selected patches first, prob as tie-break
            gt = _area_resize(gt_selection_maps.astype(jnp.float32), g, g)
            score = probs + jnp.where(gt.reshape(n, -1) > 0, 2.0, 0.0)
        _, idx = jax.lax.top_k(score, k)  # (N, k)

        sel_map = jnp.zeros((n, g * g), jnp.bool_)
        sel_map = jax.vmap(lambda m, ix: m.at[ix].set(True))(sel_map, idx)
        maps_all.append(sel_map.reshape(n, g, g))

        # patch-embed the full hi-res grid (one GEMM), gather K rows
        px = pixels_high[i - 1]
        if px.dtype == jnp.uint8:
            mean = jnp.asarray(cfg.vit.image_mean, dtype) * 255.0
            std = jnp.asarray(cfg.vit.image_std, dtype) * 255.0
            px = (px.astype(dtype) - mean) / std
        patches = siglip.patchify(px.astype(dtype), cfg.vit.patch_size)
        emb = siglip._linear(patches, vparams["patch_embedding"], dtype)
        pos = siglip.resize_position_embedding(
            vparams["position_embedding"]["embedding"], g * g
        ).astype(dtype)
        emb = emb + pos[None]
        sel = jnp.take_along_axis(emb, idx[..., None], axis=1)  # (N, k, D)
        sel = sel + scale_emb[i]
        if smooth_selection_prob:
            # scale by prob: gradient flows from the LM loss to the selector
            p_sel = jnp.take_along_axis(probs, idx, axis=1).astype(dtype)
            sel = sel * p_sel[..., None]
        hi_token_parts.append(sel)

    # pass 2: joint trunk over [low tokens ++ selected hi tokens]
    tokens = jnp.concatenate([tokens_low] + hi_token_parts, axis=1)
    feats = siglip.encode_tokens(
        vparams, vit_cfg, tokens,
        feature_layer=feature_layer, attn_impl=attn_impl,
    )
    return feats, probs_all, maps_all


def _area_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(N, H, W) -> (N, h, w) area-average resize (integer ratios either
    way), the F.interpolate(mode="area") of llava_trainer.py:905."""
    n, H, W = x.shape
    if H == h and W == w:
        return x
    if H % h == 0 and W % w == 0:
        return x.reshape(n, h, H // h, w, W // w).mean(axis=(2, 4))
    if h % H == 0 and w % W == 0:
        return jnp.repeat(jnp.repeat(x, h // H, axis=1), w // W, axis=2)
    raise ValueError(f"non-integer area resize {(H, W)} -> {(h, w)}")
