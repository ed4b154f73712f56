"""Weight-only quantization: W4A16 / W8A16 with grouped scales + Pallas
fused dequant-matmul kernels.

Capability parity: the reference's AWQ W4A16 "TinyChat" deployment path
(README.md:245-255, external mit-han-lab/llm-awq) — the published 186.8
tok/s NVILA-8B decode number runs W4A16. Decode is HBM-bandwidth-bound, so
int4 weights quarter the traffic; the Pallas kernels dequantize in VMEM and
feed the MXU without ever materializing bf16 weights in HBM.

TPU-first design notes (measured on v5e):
  * **Tiled weight layout** `(NJ, din/2, bout)`: each grid step's packed
    block is one fully contiguous HBM range, which lifts effective DMA
    bandwidth from ~600 to ~690 GB/s (84% of the 819 GB/s chip peak).
  * **Shift-free nibble unpack**: Mosaic has no uint8 shifts, and cast
    chains burn VPU cycles that stall the DMA pipeline. Instead
      lo  = bitcast(p & 0x0F, int8)                  = lo-nibble in [0,15]
      h16 = bitcast((p & 0xF0) ^ 0x80, int8)         = 16*(hi-nibble - 8)
    — one AND each, and the hi plane's int4 zero-point vanishes into the
    0x80 sign-flip, so its scale simply divides by 16.
  * **int8 MXU dots (decode)**: activations are dynamically quantized per
    (row, group) to int8 digits and the dots run s8xs8->s32 on the MXU.
    With `act_digits=2` the activation is a two-digit int8 expansion
    (x ~= q1*s1 + q2*s2, ~14-bit effective) — *more* precise than bf16
    activations, so the path is W4A16-grade while never casting weights.
  * The lo plane's -8 zero-point folds into a per-(row, group) rowsum
    correction: x @ ((q-8)*s) == (x@q)*s - 8*s*rowsum(x).

Packing: byte[i, o] holds w[i, o] (low nibble) and w[i + din/2, o] (high
nibble). Symmetric int4 [-8, 7], per-(group=128, out) bf16 scales stored
tiled as (NJ, 2*ngh, bout): lo-half groups then hi-half groups.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_GROUP = 128
_VMEM_BLOCK_BUDGET = (26 << 20) // 10  # ~2.6MB blocks: 4 fit in flight


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU correctness tests)."""
    return jax.default_backend() != "tpu"


def pick_bout(din: int, dout: int, budget: int = _VMEM_BLOCK_BUDGET) -> int:
    """Largest 128-multiple divisor of dout whose packed block fits VMEM.

    No padding is ever introduced, so all dims stay derivable from shapes.
    A larger `budget` gives wider blocks — used for tall matrices (down_proj:
    din 19k, dout 3.6k) where the default yields 256-lane blocks that DMA
    ~10% below the wide-block rate on v5e.
    """
    half = din // 2
    best = 0
    b = 128
    while b <= dout:
        if dout % b == 0 and half * b <= budget:
            best = b
        b += 128
    if best == 0:
        # No 128-multiple divisor (small/test models): a block equal to the
        # full array dim is always legal for Mosaic.
        assert half * dout <= budget, (din, dout)
        best = dout
    return best


def _unpack_planes(p: jnp.ndarray):
    """uint8 packed byte -> (lo, h16) int8 nibble planes, shift-free.

    lo in [0, 15] (weight = lo - 8); h16 == 16*(hi - 8) exactly, so the hi
    plane needs no zero-point correction (see module docstring)."""
    lo = pltpu.bitcast(p & jnp.uint8(0x0F), jnp.int8)
    h16 = pltpu.bitcast((p & jnp.uint8(0xF0)) ^ jnp.uint8(0x80), jnp.int8)
    return lo, h16


# --------------------------------------------------------------------------
# Quantization (host/XLA)
# --------------------------------------------------------------------------


def scale_rows(ngh: int) -> int:
    """Sublane-aligned scale-row count: 2*ngh (lo+hi groups) padded to a
    multiple of 8 so Mosaic DMA slices land on aligned extents. The padding
    is baked in at quantize time — padding at matmul time materializes a
    full pad of the stacked (L, nj, rows, bout) array per layer per decode
    step (profiled at ~4 ms/step on the 8B shape)."""
    return ((2 * ngh + 7) // 8) * 8


def quantize_w4(
    w: jnp.ndarray, group_size: int = DEFAULT_GROUP, bout: Optional[int] = None
) -> Dict[str, Any]:
    """w: (..., din, dout) -> tiled {packed (..., NJ, din/2, bout) uint8,
    scales (..., NJ, scale_rows(ngh), bout) bf16} (rows beyond 2*ngh are
    zero padding)."""
    *lead, din, dout = w.shape
    half = din // 2
    assert din % (2 * group_size) == 0, (din, group_size)
    bout = bout or pick_bout(din, dout)
    assert dout % bout == 0, (dout, bout)
    nj = dout // bout

    w32 = jnp.asarray(w, jnp.float32)
    g = w32.reshape(*lead, din // group_size, group_size, dout)
    amax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(g / scale), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, din, dout)
    lo = (q[..., :half, :] + 8).astype(jnp.uint8)
    hi = (q[..., half:, :] + 8).astype(jnp.uint8)
    packed = lo | (hi << 4)  # (..., half, dout)

    nl = len(lead)
    perm = tuple(range(nl)) + (nl + 1, nl, nl + 2)
    packed_t = packed.reshape(*lead, half, nj, bout).transpose(perm)
    scales = scale[..., 0, :].reshape(*lead, din // group_size, dout)
    scales_t = (
        scales.reshape(*lead, din // group_size, nj, bout)
        .transpose(perm)
        .astype(jnp.bfloat16)
    )
    rows = din // group_size  # == 2 * ngh
    s_rows = scale_rows(rows // 2)
    if s_rows != rows:
        pad = [(0, 0)] * scales_t.ndim
        pad[-2] = (0, s_rows - rows)
        scales_t = jnp.pad(scales_t, pad)
    return {
        "packed": packed_t,
        "scales": scales_t,
        "group_size": group_size,
        "bout": bout,
        "bits": 4,
    }


def quantize_w8(w: jnp.ndarray, group_size: int = DEFAULT_GROUP) -> Dict[str, Any]:
    """W8A16 (flat layout — dequant+matmul path, used for the vision tower
    per TinyChat's W8A8 vision / W4A16 LLM split)."""
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


def quantize_w8a8(kernel: jnp.ndarray) -> Dict[str, Any]:
    """Per-output-channel symmetric int8 weights for the W8A8 path
    (TinyChat runs the VISION tower W8A8 — README.md:87-88 measurement
    conditions; the LLM stays W4A16).

    Per-channel (not grouped) scales so the whole din contraction
    accumulates in one s8xs8->s32 MXU dot — grouped scales would need a
    per-group int32 split. kernel: (..., din, dout) -> {w8 int8 same
    shape, w_scale f32 (..., dout)}."""
    w32 = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"w8": q, "w_scale": scale[..., 0, :]}


def w8a8_linear(x: jnp.ndarray, p: Dict[str, Any], dtype) -> jnp.ndarray:
    """W8A8 linear: dynamic per-token int8 activations x per-channel int8
    weights on the MXU (s8xs8->s32 runs at 2x bf16 throughput on v5e).

    x: (..., din) any float dtype; p: {w8 (din, dout), w_scale (dout,)
    [, bias (dout,)]}. Output in `dtype`."""
    xf = x.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    xq = jnp.clip(jnp.round(xf * (127.0 / a)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["w8"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # see _d8: int matmuls take none
    )
    y = acc.astype(jnp.float32) * (a * (1.0 / 127.0)) * p["w_scale"]
    y = y.astype(dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def pad_o_heads(
    w: jnp.ndarray, num_q_heads: int, num_kv_heads: int, head_dim: int
) -> jnp.ndarray:
    """Repack o_proj rows into GQA-group-padded order: query group g's G
    heads occupy rows [g*P*hd, g*P*hd + G*hd) with P = ceil8(G) (zero rows
    pad each group to 8 query heads).

    The megakernel (`fused_decode.fused_layer`) computes attention per kv
    head as an (8, hd) block and spreads it block-diagonally into the o
    activation — 8-row groups keep every sublane slice Mosaic-aligned, and
    the zero weight rows erase the padding lanes. Costs (P-G)/G extra o
    bytes (+14% for 28/4 heads)."""
    grp = num_q_heads // num_kv_heads
    p = ((grp + 7) // 8) * 8
    if p == grp:
        return w
    *lead, din, dout = w.shape
    assert din == num_q_heads * head_dim, (din, num_q_heads, head_dim)
    w4 = w.reshape(*lead, num_kv_heads, grp, head_dim, dout)
    pad = jnp.zeros(
        tuple(lead) + (num_kv_heads, p - grp, head_dim, dout), w.dtype
    )
    return jnp.concatenate([w4, pad], axis=-3).reshape(
        *lead, num_kv_heads * p * head_dim, dout
    )


def _tiled_meta(packed: jnp.ndarray, scales: jnp.ndarray):
    """Derive (half, bout, nj, ngh, group_size, din, dout) from shapes.

    Scale rows may carry sublane padding (`scale_rows`), so ngh is
    recovered by matching candidate group sizes against the row count."""
    *_, nj, half, bout = packed.shape
    rows = scales.shape[-2]
    for gs in (DEFAULT_GROUP, 64, 256, 32, 16, 512):
        if half % gs:
            continue
        ngh = half // gs
        if rows in (2 * ngh, scale_rows(ngh)):
            return half, bout, nj, ngh, gs, 2 * half, nj * bout
    raise ValueError(
        f"cannot infer group size from packed {packed.shape} / "
        f"scales {scales.shape}"
    )


def dequantize(qdict: Dict[str, Any]) -> jnp.ndarray:
    """Back to flat (..., din, dout) bf16 (testing / W8 fallback)."""
    packed = qdict["packed"]
    scales = qdict["scales"]
    if qdict.get("bits", 4) == 8:
        g = qdict["group_size"]
        q = packed.astype(jnp.int32)
        *lead, din, dout = q.shape
        qg = q.reshape(*lead, din // g, g, dout).astype(jnp.float32)
        w = qg * scales[..., :, None, :].astype(jnp.float32)
        return w.reshape(*lead, din, dout).astype(jnp.bfloat16)

    half, bout, nj, ngh, g, din, dout = _tiled_meta(packed, scales)
    lead = packed.shape[:-3]
    nl = len(lead)
    # un-tile: (..., nj, half, bout) -> (..., half, dout)
    perm = tuple(range(nl)) + (nl + 1, nl, nl + 2)
    flat_p = packed.transpose(perm).reshape(*lead, half, dout)
    flat_s = (
        scales[..., : 2 * ngh, :]  # drop sublane padding rows
        .transpose(perm)
        .reshape(*lead, 2 * ngh, dout)
    )
    lo = (flat_p & 0xF).astype(jnp.int32) - 8
    hi = (flat_p >> 4).astype(jnp.int32) - 8
    q = jnp.concatenate([lo, hi], axis=-2)
    qg = q.reshape(*lead, din // g, g, dout).astype(jnp.float32)
    w = qg * flat_s[..., :, None, :].astype(jnp.float32)
    return w.reshape(*lead, din, dout).astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# Decode kernel (tiny m): tiled blocks, int8 MXU dots
# --------------------------------------------------------------------------


def _int8_digits(x32: jnp.ndarray, digits: int):
    """Expand rows into `digits` int8 planes with per-row scales.

    digits=1: classic dynamic per-(row, group) int8 (~7-bit).
    digits=2: residual expansion q1*s1 + q2*s2 (~14-bit, >= bf16 fidelity).
    """
    a = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
    s1 = jnp.maximum(a / 127.0, 1e-20)
    q1 = jnp.clip(jnp.round(x32 / s1), -127, 127)
    out = [(q1.astype(jnp.int8), s1)]
    if digits == 2:
        r = x32 - q1 * s1
        s2 = s1 / 127.0
        q2 = jnp.clip(jnp.round(r / s2), -127, 127)
        out.append((q2.astype(jnp.int8), s2))
    return out


def _d8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # precision pinned: an ambient jax_default_matmul_precision=highest
    # would stamp contract_precision<fp32> onto this s8xs8 matmul, which
    # Mosaic rejects ("Bad lhs type") — integer MXU ops take no precision.
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.float32)


def _prequantize_plane(x_ref, digits: int, group_size: int, n_groups: int):
    """Quantize one activation half ONCE per kernel call (not per group).

    Per-ROW int8 digit expansion (x ~= q1*s1 + q2*s2, s scalars per row) —
    the per-group variant costs 14+ tiny serial VPU reduces that stall the
    weight-DMA pipeline. The per-group rowsums needed for the lo-plane
    zero-point correction come from ONE int8 MXU dot against a constant
    group-indicator matrix instead of per-group VPU sums.

    Returns [(q, s, csum)] per digit: q (bm, half) int8, s (bm, 1) f32,
    csum (bm, n_groups) f32.
    """
    x32 = x_ref[:].astype(jnp.float32)
    half = x32.shape[1]
    # group-indicator matrix (half, n_groups) in int8: ones within group
    # (no floor-div: integer division lowers via a closed_call that can trip
    # the MLIR lowering cache inside Pallas bodies)
    rows = jax.lax.broadcasted_iota(jnp.int32, (half, n_groups), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (half, n_groups), 1)
    d = rows - cols * group_size
    gmat = ((d >= 0) & (d < group_size)).astype(jnp.int8)

    a = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
    s1 = jnp.maximum(a / 127.0, 1e-20)
    q1 = jnp.clip(jnp.round(x32 / s1), -127, 127).astype(jnp.int8)
    out = [(q1, s1, _d8(q1, gmat))]
    if digits == 2:
        r = x32 - q1.astype(jnp.float32) * s1
        s2 = s1 / 127.0
        q2 = jnp.clip(jnp.round(r / s2), -127, 127).astype(jnp.int8)
        out.append((q2, s2, _d8(q2, gmat)))
    return out


def _w4_decode_kernel(
    x_lo_ref,  # (bm, half) bf16
    x_hi_ref,  # (bm, half) bf16
    p_ref,  # (1, half, bout) uint8 — contiguous tiled block
    s_lo_ref,  # (1, ngh, bout) bf16
    s_hi_ref,  # (1, ngh, bout) bf16
    o_ref,  # (bm, bout)
    *,
    group_size: int,
    n_groups: int,
    act_digits: int,
):
    bm = x_lo_ref.shape[0]
    bout = o_ref.shape[1]

    # Quantize activations once (per-row digits + MXU group-sums), then the
    # group loop is pure weight-stream work: unpack, two int8 dots, scale.
    lo_digits = _prequantize_plane(x_lo_ref, act_digits, group_size, n_groups)
    hi_digits = _prequantize_plane(x_hi_ref, act_digits, group_size, n_groups)

    # Static Python unroll: Mosaic needs provably-aligned slice starts, and
    # constant group indices let every scale row load at a known offset.
    acc = jnp.zeros((bm, bout), jnp.float32)
    for g in range(n_groups):
        sl = slice(g * group_size, (g + 1) * group_size)
        lo, h16 = _unpack_planes(p_ref[0, sl, :])
        s_l = s_lo_ref[0, g, :].astype(jnp.float32)[None, :]
        s_h = s_hi_ref[0, g, :].astype(jnp.float32)[None, :] / 16.0
        for q, sx, csum in lo_digits:
            acc += (_d8(q[:, sl], lo) - 8.0 * csum[:, g : g + 1]) * (sx * s_l)
        for q, sx, csum in hi_digits:
            acc += _d8(q[:, sl], h16) * (sx * s_h)
    o_ref[:] = acc.astype(o_ref.dtype)


def _w4_decode_manual_kernel(
    l_ref,  # (1,) int32 scalar prefetch — layer index
    x_lo_ref,  # (bm, half) bf16 VMEM
    x_hi_ref,  # (bm, half) bf16 VMEM
    p_hbm,  # (L, nj, half, bout) uint8 — stays in HBM, manually DMA'd
    s_ref,  # scales: VMEM (1, nj, s_rows, bout) resident, or HBM streamed
    o_ref,  # (bm, dout) VMEM
    *,
    group_size: int,
    n_groups: int,
    nj: int,
    bout: int,
    n_buf: int,
    act_digits: int,
    s_rows: int,  # scale rows per block (2*n_groups padded to 8-mult)
    stream_scales: bool,  # True: DMA scales per block (huge heads)
):
    """Manually multi-buffered weight stream.

    Mosaic's automatic grid pipeline double-buffers only and measures
    ~450 GB/s cold on v5e; with `n_buf` in-flight block DMAs this kernel
    sustains ~720 GB/s (XLA's raw cold-stream is 766). Activations are
    quantized once (per-row int8 digits); each arriving block is unpacked
    shift-free and consumed by int8 MXU dots. Scales ride the same slot
    scheme so VMEM holds only n_buf blocks of each.
    """
    l = l_ref[0]
    bm = x_lo_ref.shape[0]
    half = x_lo_ref.shape[1]

    lo_digits = _prequantize_plane(x_lo_ref, act_digits, group_size, n_groups)
    hi_digits = _prequantize_plane(x_hi_ref, act_digits, group_size, n_groups)

    def compute_block(j, slot, bufs, scale_row):
        acc = jnp.zeros((bm, bout), jnp.float32)
        for g in range(n_groups):
            sl = slice(g * group_size, (g + 1) * group_size)
            lo, h16 = _unpack_planes(bufs[slot, sl, :])
            s_l = scale_row(g).astype(jnp.float32)[None, :]
            s_h = scale_row(n_groups + g).astype(jnp.float32)[None, :] / 16.0
            for q, sx, csum in lo_digits:
                acc += (
                    _d8(q[:, sl], lo) - 8.0 * csum[:, g : g + 1]
                ) * (sx * s_l)
            for q, sx, csum in hi_digits:
                acc += _d8(q[:, sl], h16) * (sx * s_h)
        off = pl.multiple_of(j * bout, bout)
        o_ref[:, pl.ds(off, bout)] = acc.astype(o_ref.dtype)

    def body_resident(bufs, sems):
        def dma_p(slot, j):
            return pltpu.make_async_copy(
                p_hbm.at[l, j], bufs.at[slot], sems.at[slot]
            )

        for s in range(n_buf):
            @pl.when(s < nj)
            def _(s=s):
                dma_p(s, s).start()

        def loop(j, carry):
            slot = j % n_buf
            dma_p(slot, j).wait()
            compute_block(j, slot, bufs, lambda g: s_ref[j, g, :])

            @pl.when(j + n_buf < nj)
            def _():
                dma_p((j + n_buf) % n_buf, j + n_buf).start()

            return carry

        jax.lax.fori_loop(0, nj, loop, 0)

    def body_streamed(bufs, sbufs, sems, ssems):
        def dma_p(slot, j):
            return pltpu.make_async_copy(
                p_hbm.at[l, j], bufs.at[slot], sems.at[slot]
            )

        def dma_s(slot, j):
            return pltpu.make_async_copy(
                s_ref.at[l, j], sbufs.at[slot], ssems.at[slot]
            )

        for s in range(n_buf):
            @pl.when(s < nj)
            def _(s=s):
                dma_p(s, s).start()
                dma_s(s, s).start()

        def loop(j, carry):
            slot = j % n_buf
            dma_p(slot, j).wait()
            dma_s(slot, j).wait()
            compute_block(j, slot, bufs, lambda g: sbufs[slot, g, :])

            @pl.when(j + n_buf < nj)
            def _():
                dma_p((j + n_buf) % n_buf, j + n_buf).start()
                dma_s((j + n_buf) % n_buf, j + n_buf).start()

            return carry

        jax.lax.fori_loop(0, nj, loop, 0)

    if stream_scales:
        pl.run_scoped(
            body_streamed,
            bufs=pltpu.VMEM((n_buf, half, bout), jnp.uint8),
            sbufs=pltpu.VMEM((n_buf, s_rows, bout), jnp.bfloat16),
            sems=pltpu.SemaphoreType.DMA((n_buf,)),
            ssems=pltpu.SemaphoreType.DMA((n_buf,)),
        )
    else:
        pl.run_scoped(
            body_resident,
            bufs=pltpu.VMEM((n_buf, half, bout), jnp.uint8),
            sems=pltpu.SemaphoreType.DMA((n_buf,)),
        )


_MANUAL_BUF_BUDGET = 12 << 20  # VMEM for in-flight weight blocks


@functools.partial(jax.jit, static_argnames=("act_digits",))
def w4_matmul_decode(
    x: jnp.ndarray,  # (M<=32, din) bf16
    packed: jnp.ndarray,  # (nj, din/2, bout) uint8 or (L, nj, ...) stacked
    scales: jnp.ndarray,  # (nj, 2*ngh, bout) bf16 or (L, nj, ...) stacked
    act_digits: int = 2,
    layer_index: Optional[jnp.ndarray] = None,  # () int32 for stacked
) -> jnp.ndarray:
    """Decode-shaped fused dequant matmul (manual multi-buffer DMA stream).

    Stacked form: when called inside a scan over layers, pass the FULL
    (L, nj, half, bout) arrays plus the layer index — the kernel DMAs its
    blocks straight out of the stacked array, so no per-layer weight copy
    is ever materialized (a lax.scan slice would halve HBM bandwidth)."""
    if not _interpret():
        return _w4_matmul_decode_manual(
            x, packed, scales, act_digits, layer_index
        )
    return _w4_matmul_decode_grid(x, packed, scales, act_digits, layer_index)


def _w4_matmul_decode_manual(x, packed, scales, act_digits, layer_index):
    m, din = x.shape
    half, bout, nj, ngh, group_size, din_w, dout = _tiled_meta(packed, scales)
    assert din == din_w, (din, din_w)
    bm = max(8, ((m + 7) // 8) * 8)  # one row block, 8-aligned, <= 32
    if bm != m:
        # zeros+update instead of jnp.pad: pad's closed_call trips an MLIR
        # lowering-cache KeyError when it appears beside pallas run_scoped
        x = jax.lax.dynamic_update_slice(
            jnp.zeros((bm, din), x.dtype), x, (0, 0)
        )

    if packed.ndim == 3:
        packed = packed[None]
        scales = scales[None]
        layer_index = jnp.zeros((), jnp.int32)
    assert layer_index is not None

    # Mosaic DMA slices / VMEM blocks need an 8-aligned sublane extent.
    # quantize_w4 bakes the row padding in (`scale_rows`); a runtime pad
    # here would materialize the full stacked array per layer per decode
    # step (~4 ms/step on the 8B shape — profiled), so it is required.
    s_rows = scale_rows(ngh)
    assert scales.shape[-2] == s_rows, (
        f"scales rows {scales.shape[-2]} != aligned {s_rows}; re-quantize "
        "with ops.quant.quantize_w4 (padding is baked in at quantize time)"
    )

    # Fast configuration (measured): grid=() with PLAIN (non-windowed)
    # VMEM specs — any windowed/blocked spec flips Mosaic into its grid
    # pipeline mode and halves manual-DMA throughput (718 -> ~360 GB/s).
    # Scales: streamed per block alongside the weights whenever the weights
    # are stacked (L, ...) — a resident copy would dynamic-slice ~2MB of
    # scales per layer per step inside the decode scan (profiled at
    # ~0.2 ms/step on the 8B shape; the slice can't hoist because the layer
    # index varies). Resident VMEM scales only for single-layer calls.
    scale_layer_bytes = nj * s_rows * bout * 2
    stream_scales = packed.shape[0] > 1 or scale_layer_bytes > (3 << 20)

    out_bytes = bm * dout * 2
    block_bytes = half * bout + (
        2 * s_rows * bout if stream_scales else 0
    )
    avail = _MANUAL_BUF_BUDGET - out_bytes
    if not stream_scales:
        avail -= scale_layer_bytes
    avail = max(avail, 2 * block_bytes)
    n_buf = max(2, min(4, avail // block_bytes))
    n_buf = min(n_buf, nj) if nj > 1 else 1

    if stream_scales:
        scale_arg = scales  # (L, nj, s_rows, bout) in HBM
        scale_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        scale_arg = jax.lax.dynamic_index_in_dim(
            scales, layer_index, 0, keepdims=False
        )  # (nj, s_rows, bout) resident in VMEM
        scale_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _w4_decode_manual_kernel,
            group_size=group_size,
            n_groups=ngh,
            nj=nj,
            bout=bout,
            n_buf=n_buf,
            act_digits=act_digits,
            s_rows=s_rows,
            stream_scales=stream_scales,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                scale_spec,
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((bm, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        x[:, :half],
        x[:, half:],
        packed,
        scale_arg,
    )
    return out[:m]


@functools.partial(jax.jit, static_argnames=("act_digits",))
def _w4_matmul_decode_grid(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    act_digits: int = 2,
    layer_index: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Grid-pipelined variant (CPU interpret mode + fallback)."""
    m, din = x.shape
    half, bout, nj, ngh, group_size, din_w, dout = _tiled_meta(packed, scales)
    assert din == din_w, (din, din_w)
    bm = 8
    m_pad = (bm - m % bm) % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    kernel = functools.partial(
        _w4_decode_kernel,
        group_size=group_size,
        n_groups=ngh,
        act_digits=act_digits,
    )
    stacked = packed.ndim == 4
    if stacked:
        assert layer_index is not None
        # CAUTION: on real TPU the (1, 1, ngh, bout) scale blocks read wrong
        # rows when ngh is not 8-aligned (Mosaic pads the block memref and
        # the block index silently lands off-row) — measured rel_err 0.25.
        # The manual-DMA kernel is the TPU path; this variant is for
        # interpret mode (CPU tests) only.
        assert _interpret(), (
            "stacked grid decode kernel is interpret-only; TPU uses the "
            "manual-DMA kernel (_w4_matmul_decode_manual)"
        )

        def wrapped(l_ref, x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, o_ref):
            # 4D refs indexed in place (sub-ref slicing of the non-8-aligned
            # group dim trips Mosaic tiling)
            bm_ = x_lo_ref.shape[0]
            bout_ = o_ref.shape[1]
            lo_digits = _prequantize_plane(
                x_lo_ref, act_digits, group_size, ngh
            )
            hi_digits = _prequantize_plane(
                x_hi_ref, act_digits, group_size, ngh
            )
            acc = jnp.zeros((bm_, bout_), jnp.float32)
            for g in range(ngh):
                sl = slice(g * group_size, (g + 1) * group_size)
                lo, h16 = _unpack_planes(p_ref[0, 0, sl, :])
                s_l = s_lo_ref[0, 0, g, :].astype(jnp.float32)[None, :]
                s_h = s_hi_ref[0, 0, g, :].astype(jnp.float32)[None, :] / 16.0
                for q, sx, csum in lo_digits:
                    acc += (
                        _d8(q[:, sl], lo) - 8.0 * csum[:, g : g + 1]
                    ) * (sx * s_l)
                for q, sx, csum in hi_digits:
                    acc += _d8(q[:, sl], h16) * (sx * s_h)
            o_ref[:] = acc.astype(o_ref.dtype)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(x.shape[0] // bm, nj),
            in_specs=[
                pl.BlockSpec((bm, half), lambda i, j, l: (i, 0)),
                pl.BlockSpec((bm, half), lambda i, j, l: (i, 0)),
                pl.BlockSpec(
                    (1, 1, half, bout), lambda i, j, l: (l[0], j, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, ngh, bout), lambda i, j, l: (l[0], j, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, ngh, bout), lambda i, j, l: (l[0], j, 1, 0)
                ),
            ],
            out_specs=pl.BlockSpec((bm, bout), lambda i, j, l: (i, j)),
        )
        out = pl.pallas_call(
            wrapped,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((x.shape[0], dout), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=_interpret(),
        )(
            jnp.asarray(layer_index, jnp.int32).reshape(1),
            x[:, :half],
            x[:, half:],
            packed,
            scales[:, :, :ngh, :],
            scales[:, :, ngh : 2 * ngh, :],
        )
        return out[:m]

    out = pl.pallas_call(
        kernel,
        grid=(x.shape[0] // bm, nj),
        in_specs=[
            pl.BlockSpec((bm, half), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, half), lambda i, j: (i, 0)),
            pl.BlockSpec((1, half, bout), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, ngh, bout), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, ngh, bout), lambda i, j: (j, 1, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bout), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(
        x[:, :half],
        x[:, half:],
        packed,
        scales[:, :ngh, :],
        scales[:, ngh : 2 * ngh, :],
    )
    return out[:m]


# --------------------------------------------------------------------------
# Prefill kernel (large m): weights streamed once, bf16 MXU dots
# --------------------------------------------------------------------------


def _prefill_block_body(
    x_lo_ref, x_hi_ref, p_block, s_lo_g, s_hi_g,
    o_ref, acc_ref, w_lo_ref, w_hi_ref, *,
    group_size: int, groups_per_block: int,
):
    """Shared prefill block body (flat + stacked callers).

    Dequantizes the weight block into VMEM scratch with the scales AND the
    int4 zero point folded in, then runs TWO large-K MXU dots. The previous
    form issued 2*gpb small K=group_size dots plus per-group f32
    accumulator updates and a zero-point row-sum — measured 59% MXU on the
    8B prefill; large-K dots keep the systolic pipeline full, and the bf16
    scratch weights make the kernel numerically identical to
    dequantize-then-matmul."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, h16 = _unpack_planes(p_block)
    for g in range(groups_per_block):
        sl = slice(g * group_size, (g + 1) * group_size)
        s_l = s_lo_g(g).astype(jnp.bfloat16)[None, :]
        # h16 = 16*(hi-8): fold the /16 into the scale (exact — exponent)
        s_h = (s_hi_g(g).astype(jnp.float32) * 0.0625).astype(
            jnp.bfloat16
        )[None, :]
        w_lo_ref[sl, :] = (lo[sl, :].astype(jnp.bfloat16) - 8.0) * s_l
        w_hi_ref[sl, :] = h16[sl, :].astype(jnp.bfloat16) * s_h
    acc_ref[:] += jax.lax.dot_general(
        x_lo_ref[:], w_lo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jax.lax.dot_general(
        x_hi_ref[:], w_hi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w4_prefill_kernel(
    x_lo_ref,  # (bm, bin) bf16
    x_hi_ref,  # (bm, bin) bf16
    p_ref,  # (1, bin, bout) uint8
    s_lo_ref,  # (1, 1, gpb, bout) bf16
    s_hi_ref,  # (1, 1, gpb, bout) bf16
    o_ref,  # (bm, bout)
    acc_ref,  # (bm, bout) f32
    w_lo_ref,  # (bin, bout) bf16 scratch
    w_hi_ref,  # (bin, bout) bf16 scratch
    *,
    group_size: int,
    groups_per_block: int,
):
    """Single-pass: k innermost so each weight block is read exactly once;
    unpack/scale cost amortizes over all m rows, prefill stays MXU-bound."""
    _prefill_block_body(
        x_lo_ref, x_hi_ref, p_ref[0],
        lambda g: s_lo_ref[0, 0, g, :],
        lambda g: s_hi_ref[0, 0, g, :],
        o_ref, acc_ref, w_lo_ref, w_hi_ref,
        group_size=group_size, groups_per_block=groups_per_block,
    )


def _prefill_gpb(ngh: int) -> int:
    """Groups per k-block: largest power-of-two divisor of ngh up to 8."""
    gpb = 8
    while ngh % gpb != 0:
        gpb //= 2
    return gpb


def prefill_scale_planes(
    packed: jnp.ndarray, scales: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel-ready (L, nj, nk, gpb, bout) scale planes for the stacked
    prefill kernel.

    MUST be computed OUTSIDE any `lax.scan` over layers: the slice+reshape
    materializes a copy of the whole stacked scale tensor, and XLA does not
    hoist it out of the loop body — calling `w4_matmul_prefill` with raw
    stacked scales inside a 28-layer scan costs ~0.47 ms/layer extra on the
    8B shape (measured on v5e, 2026-08-18)."""
    half, bout, nj, ngh, group_size, _, _ = _tiled_meta(packed, scales)
    gpb = _prefill_gpb(ngh)
    nk = half // (gpb * group_size)
    L = packed.shape[0]
    s_lo5 = scales[:, :, :ngh, :].reshape(L, nj, nk, gpb, bout)
    s_hi5 = scales[:, :, ngh : 2 * ngh, :].reshape(L, nj, nk, gpb, bout)
    return s_lo5, s_hi5


@functools.partial(jax.jit, static_argnames=("block_m",))
def w4_matmul_prefill(
    x: jnp.ndarray,  # (M, din) bf16
    packed: jnp.ndarray,  # (nj, din/2, bout) uint8 or (L, nj, ...) stacked
    scales: jnp.ndarray,  # (nj, 2*ngh, bout) bf16 or (L, nj, ...) stacked
    block_m: int = 512,
    layer_index: Optional[jnp.ndarray] = None,  # () int32 for stacked
    scale_planes: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    m, din = x.shape
    half, bout, nj, ngh, group_size, din_w, dout = _tiled_meta(packed, scales)
    assert din == din_w

    block_m = max(8, min(block_m, m))
    m_pad = (block_m - m % block_m) % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    gpb = _prefill_gpb(ngh)
    block_in = gpb * group_size
    nk = half // block_in

    # VMEM guard (advisor r3): pick_bout budgets only the packed input
    # block — the dequant scratch planes, f32 accumulator, and the
    # double-buffered x/packed/out blocks are extra. Assert the per-step
    # total fits comfortably in the chip's 128 MB VMEM so a caller passing
    # a large bout_budget (the tall-matrix down_proj case) fails loudly at
    # trace time instead of OOMing Mosaic.
    vmem_bytes = (
        2 * 2 * block_m * block_in * 2  # x_lo/x_hi inputs, double-buffered
        + 2 * block_in * bout  # packed uint8 block, double-buffered
        + block_m * bout * 4  # f32 accumulator scratch
        + 2 * block_in * bout * 2  # w_lo/w_hi bf16 dequant scratch
        + 2 * block_m * bout * 2  # output block, double-buffered
    )
    assert vmem_bytes <= 100 << 20, (
        f"w4_matmul_prefill per-step VMEM {vmem_bytes >> 20} MB exceeds "
        f"budget (block_m={block_m}, block_in={block_in}, bout={bout}); "
        "shrink block_m or quantize with a smaller bout_budget"
    )

    grid = (x.shape[0] // block_m, nj, nk)

    kernel = functools.partial(
        _w4_prefill_kernel, group_size=group_size, groups_per_block=gpb
    )
    scratch = [
        pltpu.VMEM((block_m, bout), jnp.float32),
        pltpu.VMEM((block_in, bout), jnp.bfloat16),
        pltpu.VMEM((block_in, bout), jnp.bfloat16),
    ]
    out_shape = jax.ShapeDtypeStruct((x.shape[0], dout), x.dtype)
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )

    if packed.ndim == 4:
        # stacked per-layer weights: select the layer inside the index maps
        # (scalar prefetch) — no per-layer weight copy before the kernel.
        assert layer_index is not None
        if scale_planes is not None:
            s_lo5, s_hi5 = scale_planes
        else:
            s_lo5, s_hi5 = prefill_scale_planes(packed, scales)

        def wrapped(l_ref, x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref,
                    o_ref, acc_ref, w_lo_ref, w_hi_ref):
            _prefill_block_body(
                x_lo_ref, x_hi_ref, p_ref[0, 0],
                lambda g: s_lo_ref[0, 0, 0, g, :],
                lambda g: s_hi_ref[0, 0, 0, g, :],
                o_ref, acc_ref, w_lo_ref, w_hi_ref,
                group_size=group_size, groups_per_block=gpb,
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_in), lambda i, j, k, l: (i, k)),
                pl.BlockSpec((block_m, block_in), lambda i, j, k, l: (i, k)),
                pl.BlockSpec(
                    (1, 1, block_in, bout),
                    lambda i, j, k, l: (l[0], j, k, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, gpb, bout),
                    lambda i, j, k, l: (l[0], j, k, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, gpb, bout),
                    lambda i, j, k, l: (l[0], j, k, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (block_m, bout), lambda i, j, k, l: (i, j)
            ),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            wrapped,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=cp,
            interpret=_interpret(),
        )(
            jnp.asarray(layer_index, jnp.int32).reshape(1),
            x[:, :half], x[:, half:], packed, s_lo5, s_hi5,
        )
        return out[:m]

    # Scales per k-block as full trailing dims (Mosaic block-shape rule):
    # (nj, ngh, bout) -> (nj, nk, gpb, bout), pure view of contiguous rows.
    s_lo4 = scales[:, :ngh, :].reshape(nj, nk, gpb, bout)
    s_hi4 = scales[:, ngh : 2 * ngh, :].reshape(nj, nk, gpb, bout)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_in), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_m, block_in), lambda i, j, k: (i, k)),
            pl.BlockSpec((1, block_in, bout), lambda i, j, k: (j, k, 0)),
            pl.BlockSpec((1, 1, gpb, bout), lambda i, j, k: (j, k, 0, 0)),
            pl.BlockSpec((1, 1, gpb, bout), lambda i, j, k: (j, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, bout), lambda i, j, k: (i, j)),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=cp,
        interpret=_interpret(),
    )(x[:, :half], x[:, half:], packed, s_lo4, s_hi4)
    return out[:m]


def w4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    act_digits: int = 2,
) -> jnp.ndarray:
    """Dispatch by m: decode-shaped (tiny m) vs prefill-shaped."""
    if x.shape[0] <= 32:
        return w4_matmul_decode(x, packed, scales, act_digits=act_digits)
    return w4_matmul_prefill(x, packed, scales)


# --------------------------------------------------------------------------
# Model integration
# --------------------------------------------------------------------------


def quantized_linear(
    x: jnp.ndarray, p: Dict[str, Any], dtype, act_digits: int = 2
) -> jnp.ndarray:
    """Linear layer over a quantized param slot {packed, scales[, bias]}."""
    packed = p["packed"]
    scales = p["scales"]
    lead = x.shape[:-1]
    din = x.shape[-1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, din)

    if packed.dtype == jnp.uint8:  # W4, tiled
        y = w4_matmul(
            x2.astype(jnp.bfloat16), packed, scales, act_digits=act_digits
        ).astype(dtype)
    else:  # W8, flat — dequant + plain MXU matmul
        group_size = din // scales.shape[-2]
        w = dequantize(
            {"packed": packed, "scales": scales, "group_size": group_size,
             "bits": 8}
        )
        y = jnp.dot(x2, w.astype(dtype))
    y = y.reshape(*lead, y.shape[-1])
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def quantize_llm_params(
    llm_params: Dict[str, Any],
    bits: int = 4,
    group_size: int = DEFAULT_GROUP,
    fuse: bool = True,
    cfg=None,  # optional qwen2.LLMConfig: enables the GQA-padded o layout
) -> Dict[str, Any]:
    """Quantize a vila_tpu.models.qwen2 param tree (TinyChat-parity W4A16
    storage, AWQ layout — README.md:245-255).

    With `fuse`, q/k/v and gate/up merge into single wider matmuls
    (qkv_proj, gate_up_proj): same bytes, fewer kernel launches, larger
    contiguous weight blocks, and the activation row is quantized once per
    fused projection.
    """
    assert bits == 4, "W4 decode path; use quantize_w8 slots manually for W8"
    out = {"embed_tokens": llm_params["embed_tokens"], "norm": llm_params["norm"]}
    src = llm_params["layers"]
    layers: Dict[str, Any] = {
        "input_layernorm": src["input_layernorm"],
        "post_attention_layernorm": src["post_attention_layernorm"],
    }

    def qslot(kernel, bias=None, bout_budget=None):
        # largest group <= requested that divides the half-contraction
        # (small/test models have odd dims; real NVILA dims keep 128)
        half = kernel.shape[-2] // 2
        g = group_size
        while half % g != 0:
            g -= 1
        bout = None
        if bout_budget is not None:
            bout = pick_bout(kernel.shape[-2], kernel.shape[-1],
                             budget=bout_budget)
        q = quantize_w4(kernel, g, bout=bout)
        slot = {"packed": q["packed"], "scales": q["scales"]}
        if bias is not None:
            slot["bias"] = bias
        return slot

    if fuse:
        qkv_k = jnp.concatenate(
            [src[n]["kernel"] for n in ("q_proj", "k_proj", "v_proj")], axis=-1
        )
        qkv_b = None
        if "bias" in src["q_proj"]:
            qkv_b = jnp.concatenate(
                [src[n]["bias"] for n in ("q_proj", "k_proj", "v_proj")],
                axis=-1,
            )
        layers["qkv_proj"] = qslot(qkv_k, qkv_b)
        gu_k = jnp.concatenate(
            [src["gate_proj"]["kernel"], src["up_proj"]["kernel"]], axis=-1
        )
        layers["gate_up_proj"] = qslot(gu_k)
        o_kernel = src["o_proj"]["kernel"]
        if cfg is not None:
            # GQA-group-padded rows enable the single-kernel decode layer
            # (fused_decode.fused_layer); zero rows change no output.
            o_kernel = pad_o_heads(
                o_kernel, cfg.num_attention_heads,
                cfg.num_key_value_heads, cfg.head_dim_,
            )
        layers["o_proj"] = qslot(o_kernel, src["o_proj"].get("bias"))
        # down is tall (din ~5x dout): a wider block DMAs ~10% faster
        layers["down_proj"] = qslot(
            src["down_proj"]["kernel"], src["down_proj"].get("bias"),
            bout_budget=5 << 20,
        )
    else:
        for name in (
            "q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj",
        ):
            slot = src[name]
            layers[name] = qslot(slot["kernel"], slot.get("bias"))

    # drop absent biases so the pytree holds arrays only
    for slot in layers.values():
        if isinstance(slot, dict) and slot.get("bias") is None:
            slot.pop("bias", None)

    out["layers"] = layers
    if "lm_head" in llm_params:
        kernel = llm_params["lm_head"]["kernel"]
        half = kernel.shape[-2] // 2
        g = group_size
        while half % g != 0:  # small/test models: largest fitting group
            g -= 1
        q = quantize_w4(kernel, g)
        out["lm_head"] = {"packed": q["packed"], "scales": q["scales"]}
    return out
