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

import functools
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

# ---------------------------------------------------------------------------
# Per-group scaling (COAT's per-group recipe,
# llava/model/coat/activation/real_quantization/fp8linear.py): activations
# carry a scale per (row, K-group of 128); weights per (128, 128) block.
# Per-tensor scaling clips whole tensors to one outlier's range; per-group
# bounds the error locally.
# ---------------------------------------------------------------------------


def quantize_grouped(
    x: jnp.ndarray, dtype=E4M3, group: int = DEFAULT_BLOCK
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize along the LAST axis with a scale per (row, group).

    Returns (q, scales): q (*lead, ng, group), scales (*lead, ng) f32.
    The last axis is zero-padded to a group multiple."""
    *lead, k = x.shape
    pad = (-k) % group
    xf = x.astype(jnp.float32)
    if pad:
        xf = jnp.pad(xf, [(0, 0)] * len(lead) + [(0, pad)])
    g = xf.reshape(*lead, -1, group)
    amax = jnp.max(jnp.abs(g), axis=-1)
    scale = jnp.maximum(amax / _fp8_max(dtype), 1e-12)
    q = (g / scale[..., None]).astype(dtype)
    return q, scale


def dequantize_grouped(
    q: jnp.ndarray, scale: jnp.ndarray, k: int, out_dtype=jnp.float32
) -> jnp.ndarray:
    x = q.astype(jnp.float32) * scale[..., None]
    x = x.reshape(*q.shape[:-2], -1)
    return x[..., :k].astype(out_dtype)


def quantize_block2d(
    w: jnp.ndarray, dtype=E4M3, block: int = DEFAULT_BLOCK
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, N) weight with one scale per (block, block) tile.

    Returns (q, scales): q (nk, bk, nn, bn), scales (nk, nn) f32."""
    k, n = w.shape
    pk, pn = (-k) % block, (-n) % block
    wf = w.astype(jnp.float32)
    if pk or pn:
        wf = jnp.pad(wf, ((0, pk), (0, pn)))
    t = wf.reshape(-1, block, wf.shape[1] // block, block)
    amax = jnp.max(jnp.abs(t), axis=(1, 3))
    scale = jnp.maximum(amax / _fp8_max(dtype), 1e-12)
    q = (t / scale[:, None, :, None]).astype(dtype)
    return q, scale


def dequantize_block2d(
    q: jnp.ndarray, scale: jnp.ndarray, k: int, n: int, out_dtype=jnp.float32
) -> jnp.ndarray:
    t = q.astype(jnp.float32) * scale[:, None, :, None]
    nk, bk, nn, bn = t.shape
    w = t.reshape(nk * bk, nn * bn)
    return w[:k, :n].astype(out_dtype)


@jax.custom_vjp
def fp8_linear_grouped(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w with per-group E4M3 operands (forward) and per-group E5M2
    gradients (backward) — the COAT per-group recipe.

    TPU shape: quantization error is exactly per-group fp8; the contraction
    itself runs as one dense matmul on dequantized operands (the broadcast
    dequant fuses into the matmul's operand read), so the MXU sees a
    single large GEMM instead of a K/128-step accumulation loop."""
    qx, sx = quantize_grouped(x, E4M3)
    qw, sw = quantize_block2d(w, E4M3)
    xd = dequantize_grouped(qx, sx, x.shape[-1], x.dtype)
    wd = dequantize_block2d(qw, sw, w.shape[0], w.shape[1], x.dtype)
    return jnp.dot(xd, wd)


def _fp8_grouped_fwd(x, w):
    qx, sx = quantize_grouped(x, E4M3)
    qw, sw = quantize_block2d(w, E4M3)
    xd = dequantize_grouped(qx, sx, x.shape[-1], x.dtype)
    wd = dequantize_block2d(qw, sw, w.shape[0], w.shape[1], x.dtype)
    y = jnp.dot(xd, wd)
    xt = jnp.zeros((0,), x.dtype)
    wt = jnp.zeros((0,), w.dtype)
    return y, (qx, sx, qw, sw, x.shape[-1], w.shape[1], xt, wt)


def _fp8_grouped_bwd(res, g):
    qx, sx, qw, sw, k, n, xt, wt = res
    qg, sg = quantize_grouped(g, E5M2)
    gd = dequantize_grouped(qg, sg, n, jnp.float32)
    wd = dequantize_block2d(qw, sw, k, n, jnp.float32)
    xd = dequantize_grouped(qx, sx, k, jnp.float32)
    dx = jnp.dot(gd, wd.T).astype(xt.dtype)
    lead = tuple(range(xd.ndim - 1))
    dw = jax.lax.dot_general(
        xd, gd, ((lead, lead), ((), ()))
    ).astype(wt.dtype)
    return dx, dw


fp8_linear_grouped.defvjp(_fp8_grouped_fwd, _fp8_grouped_bwd)

# ---------------------------------------------------------------------------
# FP8 activation ops (COAT real_quantization fused gelu/silu/mul/norm,
# llava/model/coat/activation/real_quantization/): on GPU these keep
# activations in fp8 between Triton kernels; the TPU-shaped equivalent is
# custom-VJP ops whose BACKWARD RESIDUALS are per-group fp8 — activation
# memory drops ~2x below bf16 while XLA still fuses the forward math.
# ---------------------------------------------------------------------------


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


@jax.custom_vjp
def fp8_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-forward gelu whose saved activation is per-group E4M3."""
    return _gelu(x)


def _fp8_gelu_fwd(x):
    q, s = quantize_grouped(x, E4M3)
    return _gelu(x), (q, s, x.shape[-1], jnp.zeros((0,), x.dtype))


def _fp8_gelu_bwd(res, g):
    q, s, k, t = res
    x = dequantize_grouped(q, s, k, jnp.float32)
    return ((g.astype(jnp.float32) * jax.grad(
        lambda v: _gelu(v).sum()
    )(x)).astype(t.dtype),)


fp8_gelu.defvjp(_fp8_gelu_fwd, _fp8_gelu_bwd)


@jax.custom_vjp
def fp8_silu_mul(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """silu(gate) * up (the SwiGLU elementwise pair) with fp8 residuals."""
    return jax.nn.silu(gate) * up


def _fp8_silu_mul_fwd(gate, up):
    qg, sg = quantize_grouped(gate, E4M3)
    qu, su = quantize_grouped(up, E4M3)
    return jax.nn.silu(gate) * up, (
        qg, sg, qu, su, gate.shape[-1], jnp.zeros((0,), gate.dtype),
    )


def _fp8_silu_mul_bwd(res, g):
    qg, sg, qu, su, k, t = res
    gate = dequantize_grouped(qg, sg, k, jnp.float32)
    up = dequantize_grouped(qu, su, k, jnp.float32)
    g32 = g.astype(jnp.float32)
    sig = jax.nn.sigmoid(gate)
    silu = gate * sig
    dsilu = sig * (1.0 + gate * (1.0 - sig))
    return (
        (g32 * up * dsilu).astype(t.dtype),
        (g32 * silu).astype(t.dtype),
    )


fp8_silu_mul.defvjp(_fp8_silu_mul_fwd, _fp8_silu_mul_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fp8_rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6):
    """RMSNorm with an fp8-compressed saved activation (func_rmsnorm)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(
        x.dtype
    )


def _fp8_rms_norm_fwd(x, scale, eps):
    q, s = quantize_grouped(x, E4M3)
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x32 * rstd * scale.astype(jnp.float32)).astype(x.dtype)
    return y, (q, s, rstd, scale, x.shape[-1], jnp.zeros((0,), x.dtype))


def _fp8_rms_norm_bwd(eps, res, g):
    q, s, rstd, scale, k, t = res
    x = dequantize_grouped(q, s, k, jnp.float32)
    g32 = g.astype(jnp.float32) * scale.astype(jnp.float32)
    xn = x * rstd
    # d/dx of x * rstd(x): g*rstd - xn * mean(g * xn) * rstd
    dx = (g32 - xn * jnp.mean(g32 * xn, axis=-1, keepdims=True)) * rstd
    dscale = jnp.sum(
        (g.astype(jnp.float32) * xn),
        axis=tuple(range(g.ndim - 1)),
    )
    return dx.astype(t.dtype), dscale.astype(scale.dtype)


fp8_rms_norm.defvjp(_fp8_rms_norm_fwd, _fp8_rms_norm_bwd)


# NOTE: the switch for FP8 decoder matmuls is `LLMConfig.fp8_matmul` (read
# by qwen2._linear for every projection): False | True/"tensor" (per-tensor
# scales) | "group" (per-group COAT recipe above); there is deliberately no
# param-tree tagging helper — a tag leaf would not survive the stacked-layer
# lax.scan and the config flag already covers every eligible matmul.
