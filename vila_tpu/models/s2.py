"""Dynamic-S2 multi-scale feature merging — NVILA's high-res path.

Capability parity: `merge_chessboard`/`split_chessboard`/
`merge_features_for_dynamic_s2`/`encode_images` (llava/model/llava_arch.py:
256-394) and `VisionTowerDynamicS2` (multimodal_encoder/vision_encoder.py:251).

TPU-first choices:
  * chessboard merge/split are pure reshape/transpose (no concat loops).
  * the reference's `F.interpolate(mode="area")` (adaptive average pooling)
    is expressed as two small static averaging GEMMs (rows, cols) — exact
    semantics, MXU-friendly, and fixed shapes per (in, out) pair.
  * block sizes are static per compiled program (the host knows the tiling),
    so everything stays shape-static under jit.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from vila_tpu.models import projector as projector_lib
from vila_tpu.models import siglip

Params = Dict[str, Any]


def merge_grid(tiles: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """(gh*gw, T, C) row-major tiles -> (gh*side, gw*side, C) feature map.

    Equivalent to `merge_chessboard` (llava_arch.py:256-280).
    """
    n, t, c = tiles.shape
    side = int(round(math.sqrt(t)))
    x = tiles.reshape(gh, gw, side, side, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * side, gw * side, c)


def split_grid(fmap: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """(H, W, C) -> (gh*gw, (H/gh)*(W/gw), C) row-major tiles.

    Equivalent to `split_chessboard` (llava_arch.py:283-296).
    """
    h, w, c = fmap.shape
    th, tw = h // gh, w // gw
    x = fmap.reshape(gh, th, gw, tw, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * gw, th * tw, c)


def _adaptive_avg_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix implementing torch
    adaptive_avg_pool1d semantics (= F.interpolate mode='area')."""
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-((i + 1) * n_in) // n_out)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def area_resize(fmap: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(H, W, C) -> (out_h, out_w, C) adaptive average pooling as GEMMs."""
    h, w, c = fmap.shape
    if h == out_h and w == out_w:
        return fmap
    dtype = fmap.dtype
    x = fmap.astype(jnp.float32)
    if h != out_h:
        ah = jnp.asarray(_adaptive_avg_matrix(h, out_h))
        x = jnp.einsum("oh,hwc->owc", ah, x)
    if w != out_w:
        aw = jnp.asarray(_adaptive_avg_matrix(w, out_w))
        x = jnp.einsum("ow,hwc->hoc", aw, x)
    return x.astype(dtype)


def _scale_grids(cfg) -> Tuple[int, ...]:
    s0 = cfg.s2_scales[0]
    return tuple(s // s0 for s in cfg.s2_scales)


def output_block_size(cfg, block_size: Tuple[int, int]) -> Tuple[int, int]:
    """Block grid after merging (llava_arch.py:349-358 new_block_sizes)."""
    idx = cfg.s2_resize_output_to_scale_idx
    n_scales = len(cfg.s2_scales)
    if idx == n_scales - 1 or idx == -1:
        return tuple(block_size)
    n = _scale_grids(cfg)[idx]
    return (n, n)


def tokens_for_block_size(cfg, block_size: Tuple[int, int]) -> int:
    """LLM tokens contributed by one dynamic-S2 image."""
    bh, bw = output_block_size(cfg, block_size)
    return bh * bw * cfg.tokens_per_image


def encode_image_s2(
    params: Params,
    cfg,  # vlm.VLMConfig
    tiles: jnp.ndarray,  # (N, S, S, 3) tiles of ONE image, scale order
    block_size: Tuple[int, int],  # last-scale grid (rows, cols), static
) -> jnp.ndarray:
    """Dynamic-S2 encode of one image -> (tokens, llm_hidden).

    Tile order matches `dynamic_s2_preprocess` (mm_utils.py:341-405): fixed
    square grids for scales[:-1], then the aspect-ratio grid of scales[-1].
    """
    feats = siglip.forward(
        params["vision_tower"], cfg.vision, tiles,
        feature_layer=cfg.vision_feature_layer, select=cfg.vision_select,
    )  # (N, T, C)

    grids = _scale_grids(cfg)
    maps = []
    idx = 0
    for n in grids[:-1]:
        maps.append(merge_grid(feats[idx : idx + n * n], n, n))
        idx += n * n
    bh, bw = block_size
    maps.append(merge_grid(feats[idx : idx + bh * bw], bh, bw))

    out_idx = cfg.s2_resize_output_to_scale_idx
    th, tw = maps[out_idx].shape[0], maps[out_idx].shape[1]
    merged = jnp.concatenate(
        [area_resize(m, th, tw) for m in maps], axis=-1
    )  # (th, tw, C * n_scales)

    obh, obw = output_block_size(cfg, block_size)
    tile_feats = split_grid(merged, obh, obw)  # (obh*obw, T, C*n_scales)
    proj = projector_lib.forward(
        params["mm_projector"], cfg.projector, tile_feats
    )  # (obh*obw, T/r^2, H)

    # Merge back to one token stream in spatial order, then flatten
    # (llava_arch.py:379-384).
    out_map = merge_grid(proj, obh, obw)
    return out_map.reshape(-1, out_map.shape[-1])
