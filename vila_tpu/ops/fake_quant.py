"""Simulated (fake) quantization for QAT-style research.

Capability parity: the reference's simulated-quant module zoo
(llava/model/quantization/ — QLinear/QAct/QGELU/QLayerNorm/QMul fake-quant
wrappers, ~1,900 LoC of Triton, used by the QLlama/QMemLlama research
models) and the QLinearTE simulated-FP8 path (qlinear_te.py).

TPU-native design: everything is a pure function with a straight-through
estimator registered via `jax.custom_vjp`, so a fake-quantized forward
composes with `jax.grad`/`pjit`/scan without special casing — the XLA way
to do QAT, instead of module wrappers around mutable layers. The quantizers
themselves run as plain vectorized XLA (rounding is elementwise; there is
nothing for a kernel to win).

Supported formats: FP8 E4M3/E5M2 (per-tensor or per-block scales) and
symmetric int4/int8 with grouped scales (matching `ops/quant.py` layouts).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

_FP8_MAX = {"e4m3": 448.0, "e5m2": 57344.0}
_FP8_DTYPE = {
    "e4m3": jnp.float8_e4m3fn,
    "e5m2": jnp.float8_e5m2,
}


@dataclasses.dataclass(frozen=True)
class FakeQuantConfig:
    """What to simulate. fmt: "e4m3" | "e5m2" | "int8" | "int4"."""

    weight_fmt: Optional[str] = "int4"
    act_fmt: Optional[str] = "e4m3"
    group_size: int = 128  # contraction-dim group for int formats
    per_tensor: bool = False  # FP8: one scale per tensor instead of row


# ---------------------------------------------------------------------------
# straight-through fake quantizers
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fake_quant(
    x: jnp.ndarray, fmt: str, group_size: int = 128,
    per_tensor: bool = False,
) -> jnp.ndarray:
    """Quantize-dequantize `x` in `fmt`; gradient passes straight through."""
    return _fq(x, fmt, group_size, per_tensor)


def _fq(x, fmt, group_size, per_tensor):
    x32 = x.astype(jnp.float32)
    if fmt in _FP8_MAX:
        if per_tensor:
            amax = jnp.max(jnp.abs(x32))
        else:
            amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        scale = jnp.maximum(amax / _FP8_MAX[fmt], 1e-12)
        q = (x32 / scale).astype(_FP8_DTYPE[fmt])
        return (q.astype(jnp.float32) * scale).astype(x.dtype)
    bits = {"int8": 8, "int4": 4}[fmt]
    qmax = 2 ** (bits - 1) - 1
    d = x32.shape[-1]
    g = group_size if d % group_size == 0 else d
    grouped = x32.reshape(*x32.shape[:-1], d // g, g)
    amax = jnp.max(jnp.abs(grouped), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-12)
    q = jnp.clip(jnp.round(grouped / scale), -qmax - 1, qmax)
    return (q * scale).reshape(x32.shape).astype(x.dtype)


def _fq_fwd(x, fmt, group_size, per_tensor):
    return _fq(x, fmt, group_size, per_tensor), None


def _fq_bwd(fmt, group_size, per_tensor, _, g):
    return (g,)  # straight-through


fake_quant.defvjp(_fq_fwd, _fq_bwd)


# ---------------------------------------------------------------------------
# simulated-quant ops (the reference's QLinear/QAct/QGELU/QMul/QLayerNorm)
# ---------------------------------------------------------------------------


def fq_act(x: jnp.ndarray, cfg: FakeQuantConfig) -> jnp.ndarray:
    """QAct: fake-quantize an activation tensor."""
    if cfg.act_fmt is None:
        return x
    return fake_quant(x, cfg.act_fmt, cfg.group_size, cfg.per_tensor)


def fq_linear(
    x: jnp.ndarray, w: jnp.ndarray, cfg: FakeQuantConfig,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """QLinear: fake-quantized weights and activations, exact matmul
    (qlinear_te.py semantics: simulate the precision, keep the GEMM)."""
    if cfg.weight_fmt is not None:
        w = fake_quant(w, cfg.weight_fmt, cfg.group_size, cfg.per_tensor)
    x = fq_act(x, cfg)
    y = x @ w
    if bias is not None:
        y = y + bias
    return y


def fq_gelu(x: jnp.ndarray, cfg: FakeQuantConfig) -> jnp.ndarray:
    """QGELU: activation quantized after the nonlinearity."""
    return fq_act(jax.nn.gelu(x), cfg)


def fq_silu_mul(gate: jnp.ndarray, up: jnp.ndarray,
                cfg: FakeQuantConfig) -> jnp.ndarray:
    """QMul(SiLU): the fused silu(gate)*up with simulated quantization."""
    return fq_act(jax.nn.silu(gate) * up, cfg)


def fq_rms_norm(x: jnp.ndarray, scale: jnp.ndarray, cfg: FakeQuantConfig,
                eps: float = 1e-6) -> jnp.ndarray:
    """QLayerNorm/QRMSNorm: f32 statistics, quantized output."""
    from vila_tpu.ops.norms import rms_norm

    return fq_act(rms_norm(x, scale, eps), cfg)


def quantization_error(x: jnp.ndarray, fmt: str,
                       group_size: int = 128) -> jnp.ndarray:
    """Relative RMS error of a format on a tensor — the research metric the
    reference's simulated zoo exists to measure."""
    q = _fq(x, fmt, group_size, False)
    num = jnp.sqrt(jnp.mean(jnp.square(x - q)))
    den = jnp.maximum(jnp.sqrt(jnp.mean(jnp.square(x))), 1e-12)
    return num / den
