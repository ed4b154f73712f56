"""Rotary position embeddings.

Numerics match HF rotary (`modeling_qwen2.py` rotate-half formulation):
inv_freq and cos/sin computed in float32, applied in the activation dtype.
Supports linear positional scaling for context extension (reference:
llava/model/language_model/builder.py:54-61 `context_length_extension`).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float = 10000.0,
    linear_scaling: float = 1.0,
):
    """Compute (cos, sin) for rotate-half RoPE.

    Args:
      positions: int array (..., S) of absolute token positions.
      head_dim: per-head dimension (must be even).
      theta: RoPE base.
      linear_scaling: divide positions by this factor (linear RoPE scaling).

    Returns:
      (cos, sin) float32 arrays of shape (..., S, head_dim).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    pos = positions.astype(jnp.float32)
    if linear_scaling != 1.0:
        pos = pos / linear_scaling
    freqs = pos[..., None] * inv_freq  # (..., S, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotate-half RoPE.

    Args:
      x: (B, S, H, head_dim) activations.
      cos/sin: (B, S, head_dim) or (S, head_dim).

    Returns:
      Array like `x` (same dtype).
    """
    orig_dtype = x.dtype
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]  # broadcast over heads
    sin = sin[:, :, None, :]
    x32 = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = x32[..., :half], x32[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x32 * cos + rotated * sin).astype(orig_dtype)
