"""Media encoders: token assembly for images and videos.

Capability parity: `llava/model/encoders/` —
  * `BasicImageEncoder` (image/basic.py:11): optional start/end token
    embeddings around each image's tokens;
  * `BasicVideoEncoder` (video/basic.py:11): flatten per-frame features,
    per-frame end tokens (default "\\n");
  * `TSPVideoEncoder` (video/tsp.py:15): temporal-spatial mean pooling of
    per-frame projector features over (t, h, w) sizes, one output block per
    pool size, concatenated.

TPU-first split of responsibilities: start/end/sep tokens are *real text
token ids* inserted by the host during media expansion (the reference embeds
the same strings with embed_tokens and concatenates — identical result,
since both paths go through the embedding table). The device side here is
only the dense feature math (pooling), which stays static-shape.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp

from vila_tpu.models import vlm


def tsp_pool(
    feats: jnp.ndarray,  # (T, S, D) per-frame projected features, S = nl*nl
    pool_size: Tuple[int, int, int],  # (t, h, w)
) -> jnp.ndarray:
    """Mean-pool over (time, height, width) — video/tsp.py:11-13.

    Returns (T//t, (nl//h)*(nl//w), D).
    """
    t, s, d = feats.shape
    nl = int(round(s ** 0.5))
    assert nl * nl == s, f"non-square token grid: {s}"
    pt, ph, pw = pool_size
    assert t % pt == 0 and nl % ph == 0 and nl % pw == 0, (
        f"pool {pool_size} does not divide ({t},{nl},{nl})"
    )
    x = feats.reshape(t // pt, pt, nl // ph, ph, nl // pw, pw, d)
    x = x.mean(axis=(1, 3, 5))
    return x.reshape(t // pt, (nl // ph) * (nl // pw), d)


def tsp_encode_video(
    params: Dict[str, Any],
    cfg: vlm.VLMConfig,
    frames: jnp.ndarray,  # (T, H, W, 3) uint8 frames
    pool_sizes: Sequence[Tuple[int, int, int]],
) -> jnp.ndarray:
    """Encode frames and emit the concatenated pooled token blocks.

    Returns (M, D) flat tokens where M = sum over pool sizes of
    (T/t)*(nl/h)*(nl/w) tokens (video/tsp.py:28-52, sep/end tokens are
    host-side text ids).
    """
    feats = vlm.encode_images(params, cfg, frames)  # (T, S, D)
    blocks = [tsp_pool(feats, ps) for ps in pool_sizes]
    return jnp.concatenate(
        [b.reshape(-1, b.shape[-1]) for b in blocks], axis=0
    )


def tsp_tokens_per_video(
    cfg: vlm.VLMConfig,
    num_frames: int,
    pool_sizes: Sequence[Tuple[int, int, int]],
) -> int:
    """Host-side token count for marker expansion."""
    nl = int(round(cfg.tokens_per_image ** 0.5))
    total = 0
    for pt, ph, pw in pool_sizes:
        total += (num_frames // pt) * (nl // ph) * (nl // pw)
    return total
