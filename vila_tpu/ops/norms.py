"""Normalization layers (functional).

Numerics match HF `Qwen2RMSNorm` / `nn.LayerNorm`: statistics in float32,
result cast back to the input dtype. XLA fuses these into neighbouring ops,
so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with float32 statistics (HF Qwen2/Llama semantics)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return (scale.astype(jnp.float32) * x32).astype(orig_dtype)


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray | None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm with float32 statistics."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(orig_dtype)
