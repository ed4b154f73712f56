"""Weight-only quantization: W4A16 / W8A16 with grouped scales + Pallas
fused dequant-matmul.

Capability parity: the reference's AWQ W4A16 "TinyChat" deployment path
(README.md:245-255, external mit-han-lab/llm-awq) — the published 186.8
tok/s NVILA-8B decode number runs W4A16. Decode is HBM-bandwidth-bound, so
int4 weights quarter the traffic; the Pallas kernel dequantizes in VMEM and
feeds the MXU without ever materializing bf16 weights in HBM.

Packing layout (TPU-friendly, no sublane shuffles):
  byte[i, o] packs w[i, o] (low nibble) and w[i + in/2, o] (high nibble),
  so unpack = two masked views and the matmul splits into
  x[:, :in/2] @ lo + x[:, in/2:] @ hi — pure elementwise ops + MXU dots.

Symmetric int4 [-8, 7] with per-(group, out) bf16 scales (group along the
contraction dim).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_GROUP = 128


# --------------------------------------------------------------------------
# Quantization (host/XLA)
# --------------------------------------------------------------------------


def quantize_w4(w: jnp.ndarray, group_size: int = DEFAULT_GROUP) -> Dict[str, Any]:
    """w: (..., in, out) bf16/f32 -> {packed uint8 (..., in/2, out), scales}.

    scales: (..., in/group, out) float32-derived, stored bf16.
    """
    *lead, din, dout = w.shape
    assert din % (2 * group_size) == 0 or din % group_size == 0, (din, group_size)
    w32 = jnp.asarray(w, jnp.float32)
    g = w32.reshape(*lead, din // group_size, group_size, dout)
    amax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(g / scale), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, din, dout)
    # Pack rows [0, in/2) with rows [in/2, in): lo | hi<<4.
    half = din // 2
    lo = (q[..., :half, :] + 8).astype(jnp.uint8)
    hi = (q[..., half:, :] + 8).astype(jnp.uint8)
    packed = lo | (hi << 4)
    return {
        "packed": packed,
        "scales": scale[..., 0, :].reshape(*lead, din // group_size, dout).astype(
            jnp.bfloat16
        ),
        "group_size": group_size,
        "bits": 4,
    }


def quantize_w8(w: jnp.ndarray, group_size: int = DEFAULT_GROUP) -> Dict[str, Any]:
    *lead, din, dout = w.shape
    w32 = jnp.asarray(w, jnp.float32)
    g = w32.reshape(*lead, din // group_size, group_size, dout)
    amax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(g / scale), -128, 127).astype(jnp.int8)
    return {
        "packed": q.reshape(*lead, din, dout),
        "scales": scale[..., 0, :].reshape(*lead, din // group_size, dout).astype(
            jnp.bfloat16
        ),
        "group_size": group_size,
        "bits": 8,
    }


def dequantize(qdict: Dict[str, Any]) -> jnp.ndarray:
    """Reference dequantization (XLA), for testing and prefill fallback."""
    packed = qdict["packed"]
    scales = qdict["scales"]
    g = qdict["group_size"]
    if qdict["bits"] == 4:
        lo = (packed & 0xF).astype(jnp.int32) - 8
        hi = (packed >> 4).astype(jnp.int32) - 8
        q = jnp.concatenate([lo, hi], axis=-2)
    else:
        q = qdict["packed"].astype(jnp.int32)
    *lead, din, dout = q.shape
    qg = q.reshape(*lead, din // g, g, dout).astype(jnp.float32)
    w = qg * scales[..., :, None, :].astype(jnp.float32)
    return w.reshape(*lead, din, dout).astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# Pallas fused dequant-matmul (W4A16)
# --------------------------------------------------------------------------


def _w4_kernel(
    x_ref,  # (bm, bin) bf16  — low-half rows
    p_ref,  # (bin, bout) uint8 (packs rows i and i + din/2)
    s_lo_ref,  # (1, G, bout) bf16 — per-group scales, low half
    s_hi_ref,  # (1, G, bout) bf16 — per-group scales, high half
    x_hi_ref,  # (bm, bin) bf16 — high-half rows
    o_ref,  # (bm, bout)
    acc_ref,  # (bm, bout) f32
    *,
    group_size: int,
    groups_per_block: int,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int32 intermediate: Mosaic dislikes sub-word int8 arithmetic here.
    p = p_ref[:].astype(jnp.int32)
    lo = ((p & 0xF) - 8).astype(jnp.bfloat16)
    hi = (((p >> 4) & 0xF) - 8).astype(jnp.bfloat16)

    # Scales are constant along the contraction within a group, so
    # (x @ (q * s)) == (x @ q) * s — apply them to the partial products
    # and never broadcast scales across rows.
    for g in range(groups_per_block):
        sl = slice(g * group_size, (g + 1) * group_size)
        part_lo = jax.lax.dot_general(
            x_ref[:, sl], lo[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += part_lo * s_lo_ref[0, g, :][None, :].astype(jnp.float32)
        part_hi = jax.lax.dot_general(
            x_hi_ref[:, sl], hi[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += part_hi * s_hi_ref[0, g, :][None, :].astype(jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_out")
)
def w4a16_matmul(
    x: jnp.ndarray,  # (M, din) bf16
    packed: jnp.ndarray,  # (din/2, dout) uint8
    scales: jnp.ndarray,  # (din/group, dout) bf16
    *,
    group_size: int = DEFAULT_GROUP,
    block_m: int = 8,
    block_out: int = 512,
) -> jnp.ndarray:
    m, din = x.shape
    half, dout = packed.shape
    assert din == 2 * half

    block_m = max(8, min(block_m, m))
    m_pad = (block_m - m % block_m) % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    block_out = min(block_out, dout)

    groups_per_block = 8
    block_in = groups_per_block * group_size
    while half % block_in != 0:
        groups_per_block //= 2
        block_in = groups_per_block * group_size
        assert groups_per_block >= 1, (half, group_size)
    assert dout % block_out == 0

    x_lo = x[:, :half]
    x_hi = x[:, half:]
    ngh = half // group_size  # groups per half
    s_lo = scales[:ngh].reshape(ngh // groups_per_block, groups_per_block, dout)
    s_hi = scales[ngh:].reshape(ngh // groups_per_block, groups_per_block, dout)

    grid = (x.shape[0] // block_m, dout // block_out, half // block_in)

    out = pl.pallas_call(
        functools.partial(
            _w4_kernel,
            group_size=group_size,
            groups_per_block=groups_per_block,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_in), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_in, block_out), lambda i, j, k: (k, j)),
            pl.BlockSpec(
                (1, groups_per_block, block_out), lambda i, j, k: (k, 0, j)
            ),
            pl.BlockSpec(
                (1, groups_per_block, block_out), lambda i, j, k: (k, 0, j)
            ),
            pl.BlockSpec((block_m, block_in), lambda i, j, k: (i, k)),
        ],
        out_specs=pl.BlockSpec((block_m, block_out), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x_lo, packed, s_lo, s_hi, x_hi)
    return out[:m]

# --------------------------------------------------------------------------
# Model integration
# --------------------------------------------------------------------------


def quantized_linear(x: jnp.ndarray, p: Dict[str, Any], dtype) -> jnp.ndarray:
    """Linear layer over a quantized param slot {packed, scales[, bias]}.

    Decode-sized inputs (few rows) use the fused Pallas kernel; large inputs
    (prefill/training) dequantize once and ride the full-speed MXU matmul.
    """
    packed = p["packed"]
    scales = p["scales"]
    lead = x.shape[:-1]
    din = x.shape[-1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, din)

    is_w4 = packed.dtype == jnp.uint8
    if m <= 32 and is_w4:
        group_size = din // scales.shape[-2]
        y = w4a16_matmul(
            x2.astype(jnp.bfloat16), packed, scales, group_size=group_size
        ).astype(dtype)
    else:
        bits = 4 if is_w4 else 8
        group_size = din // scales.shape[-2]
        w = dequantize(
            {"packed": packed, "scales": scales, "group_size": group_size,
             "bits": bits}
        )
        y = jnp.dot(x2, w.astype(dtype))
    y = y.reshape(*lead, y.shape[-1])
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


_LLM_QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"
)


def quantize_llm_params(
    llm_params: Dict[str, Any], bits: int = 4, group_size: int = DEFAULT_GROUP
) -> Dict[str, Any]:
    """Quantize a vila_tpu.models.qwen2 param tree (W4A16/W8A16 decode path).

    Matmul weights in every decoder layer (and lm_head if untied) become
    {packed, scales}; embeddings, norms and biases stay in bf16. This is the
    TinyChat-parity storage format (AWQ W4A16, README.md:245-255).
    """
    qfn = quantize_w4 if bits == 4 else quantize_w8
    out = {"embed_tokens": llm_params["embed_tokens"], "norm": llm_params["norm"]}
    layers = {}
    for name, slot in llm_params["layers"].items():
        if name in _LLM_QUANT_TARGETS:
            q = qfn(slot["kernel"], group_size)
            new = {"packed": q["packed"], "scales": q["scales"]}
            if "bias" in slot:
                new["bias"] = slot["bias"]
            layers[name] = new
        else:
            layers[name] = slot
    out["layers"] = layers
    if "lm_head" in llm_params:
        q = qfn(llm_params["lm_head"]["kernel"], group_size)
        out["lm_head"] = {"packed": q["packed"], "scales": q["scales"]}
    return out
