"""FP8 numerics: per-block quantization and an FP8 linear with custom VJP.

Capability parity: the reference's COAT FP8 training stack —
Triton activation quantization (`llava/model/coat/activation/real_quantization/`,
fp8 linear fwd/bwd in `llava/model/realquantize/linear.py`) and the
E4M3-forward / E5M2-backward convention of `QLinearTE`
(llava/model/qlinear_te.py:20).

TPU-first design: quantization is expressed as plain XLA ops on
`jnp.float8_e4m3fn` / `jnp.float8_e5m2` arrays with per-block power-of-two-ish
scales; XLA fuses quant/dequant into the surrounding matmuls, and on TPU
generations with native FP8 MXU paths `lax.dot_general` consumes the fp8
operands directly. Block size 128 matches the COAT group size.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

E4M3 = jnp.float8_e4m3fn
E5M2 = jnp.float8_e5m2
E4M3_MAX = 448.0
E5M2_MAX = 57344.0
DEFAULT_BLOCK = 128


def _fp8_max(dtype) -> float:
    return E4M3_MAX if dtype == E4M3 else E5M2_MAX


def quantize_blockwise(
    x: jnp.ndarray, dtype=E4M3, block: int = DEFAULT_BLOCK
) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[int, ...]]:
    """Flatten -> pad -> (nb, block) fp8 values + (nb,) f32 scales.

    Returns (q, scales, orig_shape)."""
    shape = x.shape
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    pad = (-n) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    amax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.maximum(amax / _fp8_max(dtype), 1e-12)
    q = (blocks / scale).astype(dtype)
    return q, scale[:, 0], shape


def dequantize_blockwise(
    q: jnp.ndarray, scale: jnp.ndarray, shape: Tuple[int, ...],
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    n = 1
    for s in shape:
        n *= s
    x = q.astype(jnp.float32) * scale[:, None]
    return x.reshape(-1)[:n].reshape(shape).astype(out_dtype)


def quantize_tensor(x: jnp.ndarray, dtype=E4M3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor variant used inside the fp8 matmul (one scale scalar)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax / _fp8_max(dtype), 1e-12)
    return (x.astype(jnp.float32) / scale).astype(dtype), scale


def _fp8_dot(qa, sa, qb, sb, out_dtype):
    """dot over fp8 operands; XLA lowers to the MXU fp8 path where the
    hardware has one, otherwise upcasts — numerics are identical."""
    y = jax.lax.dot_general(
        qa, qb,
        (((qa.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y * (sa * sb)).astype(out_dtype)


@jax.custom_vjp
def fp8_linear(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w with E4M3-quantized operands (forward) and E5M2-quantized
    gradients (backward) — the COAT/TransformerEngine recipe."""
    qx, sx = quantize_tensor(x, E4M3)
    qw, sw = quantize_tensor(w, E4M3)
    return _fp8_dot(qx, sx, qw, sw, x.dtype)


def _fp8_linear_fwd(x, w):
    qx, sx = quantize_tensor(x, E4M3)
    qw, sw = quantize_tensor(w, E4M3)
    y = _fp8_dot(qx, sx, qw, sw, x.dtype)
    # zero-size dtype tokens: residuals must be JAX values, not dtypes
    xt = jnp.zeros((0,), x.dtype)
    wt = jnp.zeros((0,), w.dtype)
    return y, (qx, sx, qw, sw, xt, wt)


def _fp8_linear_bwd(res, g):
    qx, sx, qw, sw, xt, wt = res
    x_dtype, w_dtype = xt.dtype, wt.dtype
    qg, sg = quantize_tensor(g, E5M2)
    # dx = g @ w.T
    dx = jax.lax.dot_general(
        qg, qw,
        (((qg.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (sg * sw)
    # dw = x.T @ g  (contract all leading dims)
    lead = tuple(range(qx.ndim - 1))
    dw = jax.lax.dot_general(
        qx, qg,
        ((lead, lead), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (sx * sg)
    return dx.astype(x_dtype), dw.astype(w_dtype)


fp8_linear.defvjp(_fp8_linear_fwd, _fp8_linear_bwd)

# NOTE: the switch for FP8 decoder matmuls is `LLMConfig.fp8_matmul` (read
# by qwen2._linear for every projection); there is deliberately no
# param-tree tagging helper — a tag leaf would not survive the stacked-layer
# lax.scan and the config flag already covers every eligible matmul.
