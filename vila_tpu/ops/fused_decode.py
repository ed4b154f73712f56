"""Fused per-layer W4 decode kernels: two long weight streams per layer.

Decode on TPU is HBM-bandwidth-bound: the chip must stream every weight
byte once per token. Four separate matmul kernels per layer
(qkv / o / gate_up / down, `ops/quant.py`) leave two stalls each — the
pipeline fill before the first block lands and the compute tail after the
last — plus XLA-op gaps (norms, silu) between kernels where the DMA engine
idles. Profiled on v5e (8B shape): the short qkv/o streams run at ~560-580
GB/s vs ~730 GB/s for the long gate_up stream, ~0.4 ms/step of stall.

This module fuses each decoder layer into TWO kernels whose weight DMAs
are all issued eagerly at kernel entry, so the weight stream never stops:

  * `fused_o_gateup`:  acc = attn @ W_o;  h += acc;  x = rmsnorm(h)*g;
                       gu = x @ W_gate_up
  * `fused_down_qkv`:  m = silu(gate)*up;  acc = m @ W_down;  h += acc;
                       x = rmsnorm(h)*g[l+1];  qkv = x @ W_qkv[l+1] + b

The second kernel computes the NEXT layer's qkv projection, so the decode
scan carries (h, qkv) and each layer body is: attention (XLA) → kernel A →
kernel B. Between the two kernels of one layer and across the attention
gap, the other kernel's DMAs are already in flight.

Weight math is identical to `ops/quant.py` (shift-free nibble unpack,
per-row int8 digit activations, int8 MXU dots, rowsum zero-point
correction); norms use f32 statistics (HF parity, `ops/norms.py`).

Off-TPU the public functions compose the existing grid kernels + XLA norms
(interpret-mode reference used by the CPU parity tests).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vila_tpu.ops.quant import (
    _d8,
    _interpret,
    _prequantize_plane,
    _tiled_meta,
    _unpack_planes,
)

_ACT_DIGITS = 2


def _use_ref_path() -> bool:
    """Off-TPU the entry points normally take the fast reference-math
    branch; VILA_TPU_PALLAS_INTERPRET=1 forces them THROUGH the Pallas
    argument assembly into `pl.pallas_call(interpret=...)` under the TPU
    interpreter instead, so BlockSpecs / out_shapes / kwarg plumbing are
    executed off-chip (VERDICT r4: a NameError in that code survived a
    green 325-test suite because the early return hid it)."""
    return _interpret() and os.environ.get(
        "VILA_TPU_PALLAS_INTERPRET", ""
    ) != "1"


def _interpret_arg():
    """Value for pl.pallas_call(interpret=...): the TPU interpreter
    (simulated DMAs/semaphores) off-TPU, compiled on chip."""
    return pltpu.InterpretParams() if _interpret() else False


def _block_compute(digits_lo, digits_hi, p_read, s_read, *, bm, bout,
                   group_size, n_groups):
    """One weight block: unpack + int8 MXU dots + scale. Same math as
    quant._w4_decode_manual_kernel.compute_block; f32 (bm, bout) result.

    p_read(sl) -> (group_size, bout) packed rows; s_read(g) -> (bout,)."""
    acc = jnp.zeros((bm, bout), jnp.float32)
    for g in range(n_groups):
        sl = slice(g * group_size, (g + 1) * group_size)
        lo, h16 = _unpack_planes(p_read(sl))
        s_l = s_read(g).astype(jnp.float32)[None, :]
        s_h = s_read(n_groups + g).astype(jnp.float32)[None, :] / 16.0
        for q, sx, csum in digits_lo:
            acc += (_d8(q[:, sl], lo) - 8.0 * csum[:, g: g + 1]) * (sx * s_l)
        for q, sx, csum in digits_hi:
            acc += _d8(q[:, sl], h16) * (sx * s_h)
    return acc


def _quant_planes(x, group_size, n_groups):
    half = x.shape[1] // 2
    lo = _prequantize_plane(x[:, :half], _ACT_DIGITS, group_size, n_groups)
    hi = _prequantize_plane(x[:, half:], _ACT_DIGITS, group_size, n_groups)
    return lo, hi


def _rms_scale(h32, gamma_row, eps):
    var = jnp.mean(jnp.square(h32), axis=-1, keepdims=True)
    return (h32 * jax.lax.rsqrt(var + eps)) * gamma_row.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernel A: o_proj -> residual -> rmsnorm -> gate_up
# ---------------------------------------------------------------------------


def _fused_o_gateup_kernel(
    l_ref,  # (1,) scalar prefetch: [l]
    attn_ref,  # (bm, D) bf16
    h_ref,  # (bm, D) bf16
    gamma_ref,  # (1, D) bf16 — this layer's post_attention_layernorm row
    o_p,  # (L, nj_o, half_o, bo) uint8 HBM
    o_s,  # (L, nj_o, sr_o, bo) bf16 HBM
    g_p,  # (L, nj_g, half_g, bg) uint8 HBM
    g_s,  # (L, nj_g, sr_g, bg) bf16 HBM
    h_out,  # (bm, D) bf16
    gu_out,  # (bm, 2I) bf16
    *,
    mo, mg, n_bo, n_bg, eps,
):
    l = l_ref[0]
    bm = attn_ref.shape[0]
    (half_o, bo, nj_o, ngh_o, gs_o) = mo
    (half_g, bg, nj_g, ngh_g, gs_g) = mg

    def body(o_bufs, o_sb, g_bufs, g_sb, o_sem, o_ssem, g_sem, g_ssem):
        def dma_o(slot, j):
            return (pltpu.make_async_copy(o_p.at[l, j], o_bufs.at[slot],
                                          o_sem.at[slot]),
                    pltpu.make_async_copy(o_s.at[l, j], o_sb.at[slot],
                                          o_ssem.at[slot]))

        def dma_g(slot, j):
            return (pltpu.make_async_copy(g_p.at[l, j], g_bufs.at[slot],
                                          g_sem.at[slot]),
                    pltpu.make_async_copy(g_s.at[l, j], g_sb.at[slot],
                                          g_ssem.at[slot]))

        # Issue both streams' heads eagerly: the gate_up weights do not
        # depend on the o result, so their DMAs overlap the o compute.
        for t in range(n_bo):
            for d in dma_o(t, t):
                d.start()
        for t in range(n_bg):
            for d in dma_g(t, t):
                d.start()

        lo_d, hi_d = _quant_planes(attn_ref[:], gs_o, ngh_o)

        cols = []
        for j in range(nj_o):  # static unroll: nj_o is small
            slot = j % n_bo
            for d in dma_o(slot, j):
                d.wait()
            cols.append(_block_compute(
                lo_d, hi_d,
                lambda sl, slot=slot: o_bufs[slot, sl, :],
                lambda g, slot=slot: o_sb[slot, g, :],
                bm=bm, bout=bo, group_size=gs_o, n_groups=ngh_o,
            ))
            if j + n_bo < nj_o:
                for d in dma_o(slot, j + n_bo):
                    d.start()
        acc_o = jnp.concatenate(cols, axis=1)  # (bm, D) f32

        h32 = h_ref[:].astype(jnp.float32) + acc_o
        h_out[:] = h32.astype(h_out.dtype)
        x = _rms_scale(h32, gamma_ref[0], eps).astype(jnp.bfloat16)
        glo_d, ghi_d = _quant_planes(x, gs_g, ngh_g)

        def loop(j, carry):
            slot = j % n_bg
            for d in dma_g(slot, j):
                d.wait()
            blk = _block_compute(
                glo_d, ghi_d,
                lambda sl: g_bufs[slot, sl, :],
                lambda g: g_sb[slot, g, :],
                bm=bm, bout=bg, group_size=gs_g, n_groups=ngh_g,
            )
            off = pl.multiple_of(j * bg, bg)
            gu_out[:, pl.ds(off, bg)] = blk.astype(gu_out.dtype)

            @pl.when(j + n_bg < nj_g)
            def _():
                for d in dma_g(slot, j + n_bg):
                    d.start()

            return carry

        jax.lax.fori_loop(0, nj_g, loop, 0)

    pl.run_scoped(
        body,
        o_bufs=pltpu.VMEM((n_bo, half_o, bo), jnp.uint8),
        o_sb=pltpu.VMEM((n_bo, o_s.shape[-2], bo), jnp.bfloat16),
        g_bufs=pltpu.VMEM((n_bg, half_g, bg), jnp.uint8),
        g_sb=pltpu.VMEM((n_bg, g_s.shape[-2], bg), jnp.bfloat16),
        o_sem=pltpu.SemaphoreType.DMA((n_bo,)),
        o_ssem=pltpu.SemaphoreType.DMA((n_bo,)),
        g_sem=pltpu.SemaphoreType.DMA((n_bg,)),
        g_ssem=pltpu.SemaphoreType.DMA((n_bg,)),
    )


# ---------------------------------------------------------------------------
# Kernel B: silu-mul -> down -> residual -> rmsnorm -> qkv of layer l+1
# ---------------------------------------------------------------------------


def _fused_down_qkv_kernel(
    l_ref,  # (2,) scalar prefetch: [l, l_next]
    gu_ref,  # (bm, 2I) bf16
    h_ref,  # (bm, D) bf16
    gamma_ref,  # (1, D) bf16 — layer l+1's input_layernorm row
    bias_ref,  # (1, dqkv) bf16 — layer l+1's qkv bias row
    d_p,  # (L, nj_d, half_d, bd) uint8 HBM
    d_s,
    q_p,  # (L, nj_q, half_q, bq) uint8 HBM
    q_s,
    h_out,  # (bm, D) bf16
    qkv_out,  # (bm, dqkv) bf16
    *,
    md, mq, n_bd, n_bq, eps,
):
    l = l_ref[0]
    l_next = l_ref[1]
    bm = gu_ref.shape[0]
    (half_d, bd, nj_d, ngh_d, gs_d) = md
    (half_q, bq, nj_q, ngh_q, gs_q) = mq
    inter = 2 * half_d  # I == din of down_proj

    def body(d_bufs, d_sb, q_bufs, q_sb, d_acc,
             d_sem, d_ssem, q_sem, q_ssem):
        def dma_d(slot, j):
            return (pltpu.make_async_copy(d_p.at[l, j], d_bufs.at[slot],
                                          d_sem.at[slot]),
                    pltpu.make_async_copy(d_s.at[l, j], d_sb.at[slot],
                                          d_ssem.at[slot]))

        def dma_q(slot, j):
            return (pltpu.make_async_copy(q_p.at[l_next, j], q_bufs.at[slot],
                                          q_sem.at[slot]),
                    pltpu.make_async_copy(q_s.at[l_next, j], q_sb.at[slot],
                                          q_ssem.at[slot]))

        for t in range(n_bd):
            for d in dma_d(t, t):
                d.start()
        if nj_d <= n_bd:
            # whole down stream buffered: qkv can queue immediately
            for t in range(min(n_bq, nj_q)):
                for d in dma_q(t, t):
                    d.start()

        gu32 = gu_ref[:].astype(jnp.float32)
        gate, up = gu32[:, :inter], gu32[:, inter:]
        m_act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)
        lo_d, hi_d = _quant_planes(m_act, gs_d, ngh_d)

        def loop(j, carry):
            slot = j % n_bd
            for d in dma_d(slot, j):
                d.wait()
            blk = _block_compute(
                lo_d, hi_d,
                lambda sl: d_bufs[slot, sl, :],
                lambda g: d_sb[slot, g, :],
                bm=bm, bout=bd, group_size=gs_d, n_groups=ngh_d,
            )
            off = pl.multiple_of(j * bd, bd)
            d_acc[:, pl.ds(off, bd)] = blk

            @pl.when(j + n_bd < nj_d)
            def _():
                for d in dma_d(slot, j + n_bd):
                    d.start()

            if nj_d > n_bd:
                # DMA queues drain in issue order: queue the qkv head only
                # once the LAST down refill has been issued, so qkv bytes
                # never sit ahead of down blocks and stall the down stream.
                @pl.when(j == nj_d - n_bd - 1)
                def _():
                    for t in range(min(n_bq, nj_q)):
                        for d in dma_q(t, t):
                            d.start()

            return carry

        jax.lax.fori_loop(0, nj_d, loop, 0)

        h32 = h_ref[:].astype(jnp.float32) + d_acc[:]
        h_out[:] = h32.astype(h_out.dtype)
        x = _rms_scale(h32, gamma_ref[0], eps).astype(jnp.bfloat16)
        qlo_d, qhi_d = _quant_planes(x, gs_q, ngh_q)
        bias = bias_ref[0]

        for j in range(nj_q):  # static unroll: nj_q is small
            slot = j % n_bq
            for d in dma_q(slot, j):
                d.wait()
            blk = _block_compute(
                qlo_d, qhi_d,
                lambda sl, slot=slot: q_bufs[slot, sl, :],
                lambda g, slot=slot: q_sb[slot, g, :],
                bm=bm, bout=bq, group_size=gs_q, n_groups=ngh_q,
            )
            blk = blk + bias[j * bq: (j + 1) * bq].astype(
                jnp.float32)[None, :]
            qkv_out[:, j * bq: (j + 1) * bq] = blk.astype(qkv_out.dtype)
            if j + n_bq < nj_q:
                for d in dma_q(slot, j + n_bq):
                    d.start()

    pl.run_scoped(
        body,
        d_bufs=pltpu.VMEM((n_bd, half_d, bd), jnp.uint8),
        d_sb=pltpu.VMEM((n_bd, d_s.shape[-2], bd), jnp.bfloat16),
        q_bufs=pltpu.VMEM((n_bq, half_q, bq), jnp.uint8),
        q_sb=pltpu.VMEM((n_bq, q_s.shape[-2], bq), jnp.bfloat16),
        d_acc=pltpu.VMEM((gu_ref.shape[0], md[1] * md[2]), jnp.float32),
        d_sem=pltpu.SemaphoreType.DMA((n_bd,)),
        d_ssem=pltpu.SemaphoreType.DMA((n_bd,)),
        q_sem=pltpu.SemaphoreType.DMA((n_bq,)),
        q_ssem=pltpu.SemaphoreType.DMA((n_bq,)),
    )


# ---------------------------------------------------------------------------
# Public wrappers (+ interpret-mode reference path)
# ---------------------------------------------------------------------------


def _meta5(slot):
    half, bout, nj, ngh, gs, _, _ = _tiled_meta(slot["packed"], slot["scales"])
    return (half, bout, nj, ngh, gs)


def _pad_rows(x, bm):
    if x.shape[0] == bm:
        return x
    return jax.lax.dynamic_update_slice(
        jnp.zeros((bm, x.shape[1]), x.dtype), x, (0, 0)
    )


def fused_o_gateup(
    attn_out: jnp.ndarray,  # (m, D) bf16
    h: jnp.ndarray,  # (m, D)
    layer_index: jnp.ndarray,  # () int32
    o_slot: Dict[str, Any],  # stacked (L, ...) packed/scales
    gu_slot: Dict[str, Any],
    gamma_post: jnp.ndarray,  # (L, D)
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (h_new, gate_up) for the layer. TPU: one fused kernel;
    off-TPU: reference composition of the grid kernels + XLA norm."""
    if _use_ref_path():
        from vila_tpu.ops.quant import w4_matmul_decode

        acc = w4_matmul_decode(attn_out, o_slot["packed"], o_slot["scales"],
                               layer_index=layer_index)
        h32 = h.astype(jnp.float32) + acc.astype(jnp.float32)
        h_new = h32.astype(h.dtype)
        gamma = jax.lax.dynamic_index_in_dim(gamma_post, layer_index, 0,
                                             keepdims=False)
        x = _rms_scale(h32, gamma, eps).astype(jnp.bfloat16)
        gu = w4_matmul_decode(x, gu_slot["packed"], gu_slot["scales"],
                              layer_index=layer_index)
        return h_new, gu

    m = attn_out.shape[0]
    d_model = h.shape[1]  # attn may be wider (GQA-padded o layout)
    bm = max(8, ((m + 7) // 8) * 8)
    attn_out = _pad_rows(attn_out.astype(jnp.bfloat16), bm)
    h = _pad_rows(h, bm)
    mo = _meta5(o_slot)
    mg = _meta5(gu_slot)
    # Buffer the WHOLE o stream when it fits: all its DMAs queue before the
    # gate_up ones, so the (FIFO) DMA queue never interleaves the streams.
    o_block = mo[0] * mo[1]
    n_bo = mo[2] if mo[2] * o_block <= (8 << 20) else max(
        2, (6 << 20) // o_block
    )
    n_bg = min(4, mg[2])
    dout_g = mg[1] * mg[2]

    h_new, gu = pl.pallas_call(
        functools.partial(
            _fused_o_gateup_kernel,
            mo=mo, mg=mg, n_bo=n_bo, n_bg=n_bg, eps=eps,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # attn
                pl.BlockSpec(memory_space=pltpu.VMEM),  # h
                pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma row
                pl.BlockSpec(memory_space=pl.ANY),  # o packed
                pl.BlockSpec(memory_space=pl.ANY),  # o scales
                pl.BlockSpec(memory_space=pl.ANY),  # gu packed
                pl.BlockSpec(memory_space=pl.ANY),  # gu scales
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bm, d_model), h.dtype),
            jax.ShapeDtypeStruct((bm, dout_g), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 << 20,
        ),
        interpret=_interpret_arg(),
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        attn_out, h,
        jax.lax.dynamic_index_in_dim(
            gamma_post.astype(jnp.bfloat16), layer_index, 0
        ),
        o_slot["packed"], o_slot["scales"],
        gu_slot["packed"], gu_slot["scales"],
    )
    return h_new[:m], gu[:m]


def fused_down_qkv(
    gu: jnp.ndarray,  # (m, 2I) bf16
    h: jnp.ndarray,  # (m, D)
    layer_index: jnp.ndarray,  # () int32 — CURRENT layer l
    down_slot: Dict[str, Any],
    qkv_slot: Dict[str, Any],  # with optional "bias" (L, dqkv)
    gamma_in: jnp.ndarray,  # (L, D) input_layernorm scales
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (h_new, qkv_of_layer_l_plus_1). The last layer streams its
    own qkv again (clamped l+1) — the caller discards it; cheaper than a
    branch that would split the decode scan body."""
    L = down_slot["packed"].shape[0]
    l_next = jnp.minimum(layer_index + 1, L - 1)
    dqkv = qkv_slot["packed"].shape[1] * qkv_slot["packed"].shape[-1]
    bias = qkv_slot.get("bias")
    if bias is None:
        bias = jnp.zeros((L, dqkv), jnp.bfloat16)
    if _use_ref_path():
        from vila_tpu.ops.quant import w4_matmul_decode

        inter = gu.shape[1] // 2
        gu32 = gu.astype(jnp.float32)
        m_act = (jax.nn.silu(gu32[:, :inter]) * gu32[:, inter:]).astype(
            jnp.bfloat16
        )
        acc = w4_matmul_decode(m_act, down_slot["packed"],
                               down_slot["scales"], layer_index=layer_index)
        h32 = h.astype(jnp.float32) + acc.astype(jnp.float32)
        h_new = h32.astype(h.dtype)
        gamma = jax.lax.dynamic_index_in_dim(gamma_in, l_next, 0,
                                             keepdims=False)
        x = _rms_scale(h32, gamma, eps).astype(jnp.bfloat16)
        qkv = w4_matmul_decode(x, qkv_slot["packed"], qkv_slot["scales"],
                               layer_index=l_next)
        qkv = qkv + jax.lax.dynamic_index_in_dim(
            bias, l_next, 0, keepdims=False
        ).astype(qkv.dtype)[None, :]
        return h_new, qkv

    m, _ = gu.shape
    d_model = h.shape[1]
    bm = max(8, ((m + 7) // 8) * 8)
    gu = _pad_rows(gu.astype(jnp.bfloat16), bm)
    h = _pad_rows(h, bm)
    md = _meta5(down_slot)
    mq = _meta5(qkv_slot)
    # v5e VMEM comfortably holds ~20MB of stream buffers (measured): keep
    # 3 down blocks (even at the wide 4.85MB bout) + the whole qkv stream
    n_bd = min(3, md[2])
    n_bq = min(4, mq[2])

    h_new, qkv = pl.pallas_call(
        functools.partial(
            _fused_down_qkv_kernel,
            md=md, mq=mq, n_bd=n_bd, n_bq=n_bq, eps=eps,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # gu
                pl.BlockSpec(memory_space=pltpu.VMEM),  # h
                pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma row
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bias row
                pl.BlockSpec(memory_space=pl.ANY),  # down packed
                pl.BlockSpec(memory_space=pl.ANY),  # down scales
                pl.BlockSpec(memory_space=pl.ANY),  # qkv packed
                pl.BlockSpec(memory_space=pl.ANY),  # qkv scales
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bm, d_model), h.dtype),
            jax.ShapeDtypeStruct((bm, dqkv), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 << 20,
        ),
        interpret=_interpret_arg(),
    )(
        jnp.stack([jnp.asarray(layer_index, jnp.int32),
                   jnp.asarray(l_next, jnp.int32)]),
        gu, h,
        jax.lax.dynamic_index_in_dim(
            gamma_in.astype(jnp.bfloat16), l_next, 0
        ),
        jax.lax.dynamic_index_in_dim(
            bias.astype(jnp.bfloat16), l_next, 0
        ),
        down_slot["packed"], down_slot["scales"],
        qkv_slot["packed"], qkv_slot["scales"],
    )
    return h_new[:m], qkv[:m]


# ---------------------------------------------------------------------------
# Megakernel: attention + o + gate_up + silu + down + qkv_{l+1} in ONE kernel
# ---------------------------------------------------------------------------
#
# bs=1 decode only. The KV cache layer rides the same DMA stream as the
# weights, and the whole layer exposes ONE pipeline-fill and ONE compute
# tail instead of five (attention copy + 4 matmul kernels). GQA attention
# runs per kv head as an 8-row (group-padded) block; the head outputs are
# spread block-diagonally into a (8, Hkv*8*hd) activation whose matching
# o_proj layout (`quant.pad_o_heads`) has zero rows for the padding — the
# o matmul result is then summed over rows to collapse the head dimension.


def _softmax_rows(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fused_layer_kernel(
    l_ref,  # (2,) scalar prefetch: [l, l_next]
    q32_ref,  # (HP, hd) bf16 — rope'd, pre-scaled, group-padded q
    mask_ref,  # (1, S) f32 additive mask (0 valid / -inf invalid)
    h_ref,  # (8, D) bf16, row 0 real
    gpost_ref,  # (1, D) bf16
    gin_ref,  # (1, D) bf16 (layer l+1)
    bias_ref,  # (1, dqkv) bf16 (layer l+1)
    k_hbm,  # (L, 1, S, Hkv*hd) bf16 HBM (flat decode cache, b=1)
    v_hbm,
    o_p, o_s, g_p, g_s, d_p, d_s, q_p, q_s,  # stacked weight slots, HBM
    h_out,  # (8, D) bf16 (broadcast rows)
    qkv_out,  # (8, dqkv) bf16 (broadcast rows)
    *,
    mo, mg, md, mq, n_bo, n_bg, n_bd, n_bq, eps, hkv, hd, kv_blk,
):
    l = l_ref[0]
    l_next = l_ref[1]
    n_live = l_ref[2]  # live KV blocks of kv_blk rows (ceil((fill+1)/blk))
    (half_o, bo, nj_o, ngh_o, gs_o) = mo
    (half_g, bg, nj_g, ngh_g, gs_g) = mg
    (half_d, bd, nj_d, ngh_d, gs_d) = md
    (half_q, bq, nj_q, ngh_q, gs_q) = mq
    s_len = k_hbm.shape[2]
    inter = 2 * half_d
    p_rows = 8  # group-padded q rows per kv head
    n_kv_blk = s_len // kv_blk if kv_blk else 1

    def body(k_buf, v_buf, o_bufs, o_sb, g_bufs, g_sb, d_bufs, d_sb,
             q_bufs, q_sb, gu_buf, d_acc,
             kv_sem, o_sem, o_ssem, g_sem, g_ssem, d_sem, d_ssem,
             q_sem, q_ssem):
        def dma(p_arr, s_arr, bufs, sbufs, psem, ssem, lw):
            def go(slot, j):
                return (
                    pltpu.make_async_copy(p_arr.at[lw, j], bufs.at[slot],
                                          psem.at[slot]),
                    pltpu.make_async_copy(s_arr.at[lw, j], sbufs.at[slot],
                                          ssem.at[slot]),
                )
            return go

        dma_o = dma(o_p, o_s, o_bufs, o_sb, o_sem, o_ssem, l)
        dma_g = dma(g_p, g_s, g_bufs, g_sb, g_sem, g_ssem, l)
        dma_d = dma(d_p, d_s, d_bufs, d_sb, d_sem, d_ssem, l)
        dma_q = dma(q_p, q_s, q_bufs, q_sb, q_sem, q_ssem, l_next)

        # DMA queue drains in issue order: KV first (attention gates
        # everything), then the whole o stream, then the gu head; later
        # streams chain off the refill tails below.
        # KV streams block-wise and SKIPS blocks past the fill cursor —
        # dead cache slots are masked anyway, so their bytes are pure
        # waste (~1.2% of step bytes at ctx 1280 / cache 2048).
        kv_copies = []
        for i in range(n_kv_blk):
            sl = pl.ds(i * kv_blk, kv_blk) if n_kv_blk > 1 else slice(None)
            ck = pltpu.make_async_copy(
                k_hbm.at[l, 0, sl], k_buf.at[sl], kv_sem.at[0, i]
            )
            cv = pltpu.make_async_copy(
                v_hbm.at[l, 0, sl], v_buf.at[sl], kv_sem.at[1, i]
            )
            if n_kv_blk > 1:
                @pl.when(i < n_live)
                def _(ck=ck, cv=cv):
                    ck.start()
                    cv.start()
            else:
                ck.start()
                cv.start()
            kv_copies.append((i, ck, cv))
        for t in range(n_bo):
            for d in dma_o(t, t):
                d.start()
        for t in range(n_bg):
            for d in dma_g(t, t):
                d.start()
        # If the whole gu stream is buffered, nothing later re-triggers the
        # down stream — start its head now, independent of nj_d vs n_bd
        # (coupling the two conditions deadlocks d_loop when nj_g <= n_bg
        # but nj_d > n_bd: no upfront start AND no gu_loop chain).
        if nj_g <= n_bg:
            for t in range(n_bd):
                for d in dma_d(t, t):
                    d.start()
            if nj_d <= n_bd:
                for t in range(n_bq):
                    for d in dma_q(t, t):
                        d.start()

        # zero the skipped tail blocks (masked out of the softmax, but
        # uninitialized VMEM could hold NaN bit patterns) while DMAs fly
        if n_kv_blk > 1:
            for i in range(n_kv_blk):
                @pl.when(i >= n_live)
                def _(i=i):
                    z = jnp.zeros((kv_blk, k_buf.shape[1]), k_buf.dtype)
                    k_buf[pl.ds(i * kv_blk, kv_blk)] = z
                    v_buf[pl.ds(i * kv_blk, kv_blk)] = z

        # ---- attention (b=1, GQA) ----
        for i, ck, cv in kv_copies:
            if n_kv_blk > 1:
                @pl.when(i < n_live)
                def _(ck=ck, cv=cv):
                    ck.wait()
                    cv.wait()
            else:
                ck.wait()
                cv.wait()
        mask = mask_ref[0][None, :]  # (1, S) f32
        outs = []
        for g in range(hkv):  # static
            qg = q32_ref[g * p_rows:(g + 1) * p_rows, :]  # (8, hd) bf16
            kg = k_buf[:, g * hd:(g + 1) * hd]  # (S, hd)
            vg = v_buf[:, g * hd:(g + 1) * hd]
            if kg.dtype != jnp.bfloat16:  # static: f32 cache (CPU tests)
                kg = kg.astype(jnp.bfloat16)
                vg = vg.astype(jnp.bfloat16)
            sc = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8, S)
            probs = _softmax_rows(sc + mask).astype(jnp.bfloat16)
            og = jax.lax.dot_general(
                probs, vg,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8, hd) f32
            # block-diagonal spread: row i keeps lanes [i*hd, (i+1)*hd)
            tiled = jnp.concatenate([og] * p_rows, axis=1)  # (8, 8*hd)
            lane_blk = jax.lax.broadcasted_iota(
                jnp.int32, (p_rows, p_rows * hd), 1
            ) // hd
            row_id = jax.lax.broadcasted_iota(
                jnp.int32, (p_rows, p_rows * hd), 0
            )
            outs.append(jnp.where(lane_blk == row_id, tiled, 0.0))
        x_att = jnp.concatenate(outs, axis=1).astype(jnp.bfloat16)
        # (8, Hkv*8*hd) == (8, o_din)

        # ---- o stream (row-summed: rows hold different heads) ----
        lo_d, hi_d = _quant_planes(x_att, gs_o, ngh_o)
        cols = []
        for j in range(nj_o):  # static
            slot = j % n_bo
            for d in dma_o(slot, j):
                d.wait()
            cols.append(_block_compute(
                lo_d, hi_d,
                lambda sl, slot=slot: o_bufs[slot, sl, :],
                lambda g, slot=slot: o_sb[slot, g, :],
                bm=p_rows, bout=bo, group_size=gs_o, n_groups=ngh_o,
            ))
            if j + n_bo < nj_o:
                for d in dma_o(slot, j + n_bo):
                    d.start()
        acc_o = jnp.sum(jnp.concatenate(cols, axis=1), axis=0,
                        keepdims=True)  # (1, D)

        h32 = h_ref[0:1].astype(jnp.float32) + acc_o
        x1 = _rms_scale(h32, gpost_ref[0], eps).astype(jnp.bfloat16)
        x1 = jnp.broadcast_to(x1, (8, x1.shape[1]))

        # ---- gate_up stream ----
        glo_d, ghi_d = _quant_planes(x1, gs_g, ngh_g)

        def gu_loop(j, carry):
            slot = j % n_bg
            for d in dma_g(slot, j):
                d.wait()
            blk = _block_compute(
                glo_d, ghi_d,
                lambda sl: g_bufs[slot, sl, :],
                lambda g: g_sb[slot, g, :],
                bm=8, bout=bg, group_size=gs_g, n_groups=ngh_g,
            )
            off = pl.multiple_of(j * bg, bg)
            gu_buf[:, pl.ds(off, bg)] = blk.astype(gu_buf.dtype)

            @pl.when(j + n_bg < nj_g)
            def _():
                for d in dma_g(slot, j + n_bg):
                    d.start()

            if nj_g > n_bg:
                @pl.when(j == nj_g - n_bg - 1)
                def _():
                    for t in range(n_bd):
                        for d in dma_d(t, t):
                            d.start()
                    if nj_d <= n_bd:
                        for t in range(n_bq):
                            for d in dma_q(t, t):
                                d.start()
            return carry

        jax.lax.fori_loop(0, nj_g, gu_loop, 0)

        # ---- silu-mul + down stream ----
        gu32 = gu_buf[:].astype(jnp.float32)
        gate, up = gu32[:, :inter], gu32[:, inter:]
        m_act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)
        dlo_d, dhi_d = _quant_planes(m_act, gs_d, ngh_d)

        def d_loop(j, carry):
            slot = j % n_bd
            for d in dma_d(slot, j):
                d.wait()
            blk = _block_compute(
                dlo_d, dhi_d,
                lambda sl: d_bufs[slot, sl, :],
                lambda g: d_sb[slot, g, :],
                bm=8, bout=bd, group_size=gs_d, n_groups=ngh_d,
            )
            off = pl.multiple_of(j * bd, bd)
            d_acc[:, pl.ds(off, bd)] = blk

            @pl.when(j + n_bd < nj_d)
            def _():
                for d in dma_d(slot, j + n_bd):
                    d.start()

            if nj_d > n_bd:
                @pl.when(j == nj_d - n_bd - 1)
                def _():
                    for t in range(n_bq):
                        for d in dma_q(t, t):
                            d.start()
            return carry

        jax.lax.fori_loop(0, nj_d, d_loop, 0)

        h32b = h32 + d_acc[0:1, :]
        h_out[:] = jnp.broadcast_to(
            h32b.astype(h_out.dtype), (8, h32b.shape[1])
        )
        x2 = _rms_scale(h32b, gin_ref[0], eps).astype(jnp.bfloat16)
        x2 = jnp.broadcast_to(x2, (8, x2.shape[1]))

        # ---- qkv stream (layer l+1) ----
        qlo_d, qhi_d = _quant_planes(x2, gs_q, ngh_q)
        bias = bias_ref[0]
        for j in range(nj_q):  # static
            slot = j % n_bq
            for d in dma_q(slot, j):
                d.wait()
            blk = _block_compute(
                qlo_d, qhi_d,
                lambda sl, slot=slot: q_bufs[slot, sl, :],
                lambda g, slot=slot: q_sb[slot, g, :],
                bm=8, bout=bq, group_size=gs_q, n_groups=ngh_q,
            )
            blk = blk + bias[j * bq:(j + 1) * bq].astype(
                jnp.float32)[None, :]
            qkv_out[:, j * bq:(j + 1) * bq] = blk.astype(qkv_out.dtype)
            if j + n_bq < nj_q:
                for d in dma_q(slot, j + n_bq):
                    d.start()

    pl.run_scoped(
        body,
        # slab dtype follows the cache: a dtype-mismatched DMA writes
        # garbage bytes (caught by the interpret-mode smoke tests); f32
        # caches (CPU tests) cast to bf16 at the attention reads instead
        k_buf=pltpu.VMEM((s_len, k_hbm.shape[3]), k_hbm.dtype),
        v_buf=pltpu.VMEM((s_len, k_hbm.shape[3]), k_hbm.dtype),
        o_bufs=pltpu.VMEM((n_bo, half_o, bo), jnp.uint8),
        o_sb=pltpu.VMEM((n_bo, o_s.shape[-2], bo), jnp.bfloat16),
        g_bufs=pltpu.VMEM((n_bg, half_g, bg), jnp.uint8),
        g_sb=pltpu.VMEM((n_bg, g_s.shape[-2], bg), jnp.bfloat16),
        d_bufs=pltpu.VMEM((n_bd, half_d, bd), jnp.uint8),
        d_sb=pltpu.VMEM((n_bd, d_s.shape[-2], bd), jnp.bfloat16),
        q_bufs=pltpu.VMEM((n_bq, half_q, bq), jnp.uint8),
        q_sb=pltpu.VMEM((n_bq, q_s.shape[-2], bq), jnp.bfloat16),
        gu_buf=pltpu.VMEM((8, mg[1] * mg[2]), jnp.bfloat16),
        d_acc=pltpu.VMEM((8, md[1] * md[2]), jnp.float32),
        kv_sem=pltpu.SemaphoreType.DMA((2, n_kv_blk)),
        o_sem=pltpu.SemaphoreType.DMA((n_bo,)),
        o_ssem=pltpu.SemaphoreType.DMA((n_bo,)),
        g_sem=pltpu.SemaphoreType.DMA((n_bg,)),
        g_ssem=pltpu.SemaphoreType.DMA((n_bg,)),
        d_sem=pltpu.SemaphoreType.DMA((n_bd,)),
        d_ssem=pltpu.SemaphoreType.DMA((n_bd,)),
        q_sem=pltpu.SemaphoreType.DMA((n_bq,)),
        q_ssem=pltpu.SemaphoreType.DMA((n_bq,)),
    )


def fused_layer(
    q32: jnp.ndarray,  # (Hkv*8, hd) bf16 — rope'd, scaled, group-padded q
    mask: jnp.ndarray,  # (1, S) f32 additive
    h: jnp.ndarray,  # (8, D) row 0 real
    layer_index: jnp.ndarray,  # () int32
    k_cache: jnp.ndarray,  # (L, 1, S, Hkv*hd) bf16 (flat decode cache)
    v_cache: jnp.ndarray,
    o_slot, gu_slot, down_slot, qkv_slot,
    gamma_post: jnp.ndarray,  # (L, D)
    gamma_in: jnp.ndarray,  # (L, D)
    *,
    hkv: int, hd: int, eps: float = 1e-6,
    fill: jnp.ndarray = None,  # () int32: last written cache slot index
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One decoder layer (bs=1, quantized decode): returns
    (h_new (8, D), qkv_of_layer_l_plus_1 (8, dqkv)); row 0 is real.

    With `fill`, KV DMAs stream only the live prefix of the cache
    (blocks of 256 rows up to the fill cursor) instead of all S slots."""
    L = o_slot["packed"].shape[0]
    l_next = jnp.minimum(layer_index + 1, L - 1)
    dqkv = qkv_slot["packed"].shape[1] * qkv_slot["packed"].shape[-1]
    bias = qkv_slot.get("bias")
    if bias is None:
        bias = jnp.zeros((L, dqkv), jnp.bfloat16)
    gpost_row = jax.lax.dynamic_index_in_dim(
        gamma_post.astype(jnp.bfloat16), layer_index, 0)
    gin_row = jax.lax.dynamic_index_in_dim(
        gamma_in.astype(jnp.bfloat16), l_next, 0)
    bias_row = jax.lax.dynamic_index_in_dim(
        bias.astype(jnp.bfloat16), l_next, 0)

    if _use_ref_path():
        # reference composition (CPU): explicit attention + the fused A/B
        # interpret paths
        p_rows = 8
        kg = jax.lax.dynamic_index_in_dim(k_cache, layer_index, 0,
                                          keepdims=False)[0]  # (S, Hkv*hd)
        vg = jax.lax.dynamic_index_in_dim(v_cache, layer_index, 0,
                                          keepdims=False)[0]
        outs = []
        for g in range(hkv):
            qg = q32[g * p_rows:(g + 1) * p_rows].astype(jnp.float32)
            k_h = kg[:, g * hd:(g + 1) * hd].astype(jnp.float32)
            v_h = vg[:, g * hd:(g + 1) * hd].astype(jnp.float32)
            sc = qg @ k_h.T + mask
            p = jax.nn.softmax(sc, axis=-1)
            outs.append(p @ v_h)  # (8, hd)
        x_att = jnp.concatenate(
            [jnp.where(
                (jnp.arange(p_rows * hd)[None, :] // hd)
                == jnp.arange(p_rows)[:, None],
                jnp.concatenate([o] * p_rows, axis=1), 0.0)
             for o in outs], axis=1,
        ).astype(jnp.bfloat16)  # (8, o_din)
        from vila_tpu.ops.quant import w4_matmul_decode

        acc = w4_matmul_decode(x_att, o_slot["packed"], o_slot["scales"],
                               layer_index=layer_index)
        acc = jnp.sum(acc.astype(jnp.float32), axis=0, keepdims=True)
        h32 = h[0:1].astype(jnp.float32) + acc
        x1 = _rms_scale(h32, gpost_row[0], eps).astype(jnp.bfloat16)
        gu = w4_matmul_decode(x1, gu_slot["packed"], gu_slot["scales"],
                              layer_index=layer_index)
        inter = gu.shape[1] // 2
        gu32 = gu.astype(jnp.float32)
        m_act = (jax.nn.silu(gu32[:, :inter]) * gu32[:, inter:]).astype(
            jnp.bfloat16)
        accd = w4_matmul_decode(m_act, down_slot["packed"],
                                down_slot["scales"],
                                layer_index=layer_index)
        h32b = h32 + accd.astype(jnp.float32)
        x2 = _rms_scale(h32b, gin_row[0], eps).astype(jnp.bfloat16)
        qkv = w4_matmul_decode(x2, qkv_slot["packed"], qkv_slot["scales"],
                               layer_index=l_next)
        qkv = qkv + bias_row.astype(qkv.dtype)
        h_new = jnp.broadcast_to(h32b.astype(h.dtype), (8, h.shape[1]))
        qkv8 = jnp.broadcast_to(qkv, (8, qkv.shape[1]))
        return h_new, qkv8

    mo = _meta5(o_slot)
    mg = _meta5(gu_slot)
    md = _meta5(down_slot)
    mq = _meta5(qkv_slot)
    s_len_ = k_cache.shape[2]
    kv_blk = 256 if s_len_ % 256 == 0 and s_len_ > 256 else 0
    if kv_blk and fill is not None:
        n_live_blocks = fill // kv_blk + 1
    else:
        n_live_blocks = s_len_ // kv_blk if kv_blk else 1
    o_block = mo[0] * mo[1]
    n_bo = mo[2] if mo[2] * o_block <= (8 << 20) else max(
        2, (6 << 20) // o_block)
    n_bg = min(4, mg[2])
    n_bd = min(3, md[2])
    n_bq = min(4, mq[2])
    d_model = h.shape[1]

    h_new, qkv = pl.pallas_call(
        functools.partial(
            _fused_layer_kernel,
            mo=mo, mg=mg, md=md, mq=mq,
            n_bo=n_bo, n_bg=n_bg, n_bd=n_bd, n_bq=n_bq,
            eps=eps, hkv=hkv, hd=hd, kv_blk=kv_blk,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # q32
                pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
                pl.BlockSpec(memory_space=pltpu.VMEM),  # h
                pl.BlockSpec(memory_space=pltpu.VMEM),  # gpost row
                pl.BlockSpec(memory_space=pltpu.VMEM),  # gin row
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bias row
                pl.BlockSpec(memory_space=pl.ANY),  # k cache
                pl.BlockSpec(memory_space=pl.ANY),  # v cache
                pl.BlockSpec(memory_space=pl.ANY),  # o packed
                pl.BlockSpec(memory_space=pl.ANY),  # o scales
                pl.BlockSpec(memory_space=pl.ANY),  # gu packed
                pl.BlockSpec(memory_space=pl.ANY),  # gu scales
                pl.BlockSpec(memory_space=pl.ANY),  # down packed
                pl.BlockSpec(memory_space=pl.ANY),  # down scales
                pl.BlockSpec(memory_space=pl.ANY),  # qkv packed
                pl.BlockSpec(memory_space=pl.ANY),  # qkv scales
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((8, d_model), h.dtype),
            jax.ShapeDtypeStruct((8, dqkv), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 << 20,
        ),
        interpret=_interpret_arg(),
    )(
        jnp.stack([jnp.asarray(layer_index, jnp.int32),
                   jnp.asarray(l_next, jnp.int32),
                   jnp.asarray(n_live_blocks, jnp.int32)]),
        q32.astype(jnp.bfloat16), mask.astype(jnp.float32), h,
        gpost_row, gin_row, bias_row,
        k_cache, v_cache,
        o_slot["packed"], o_slot["scales"],
        gu_slot["packed"], gu_slot["scales"],
        down_slot["packed"], down_slot["scales"],
        qkv_slot["packed"], qkv_slot["scales"],
    )
    return h_new, qkv


# ---------------------------------------------------------------------------
# Batched megakernel: whole layer in ONE kernel for 1 < bs <= 16
# ---------------------------------------------------------------------------
#
# The bs=1 megakernel spreads GQA head outputs across the 8 matmul rows
# (block-diagonal + row-sum) because a single token leaves the MXU rows
# empty. At bs<=16 the batch fills the rows instead: every weight stream
# runs with rows == batch slots and no spread/row-sum is needed — the
# batched kernel is *simpler* in the matmul stages. Attention is the part
# that grows: each slot has its own KV cache, so KV streams per-slot
# (double-buffered (S, Hkv*hd) VMEM slabs — 8 full caches plus the weight
# buffers would blow VMEM at the 4k+ cache lengths the batcher runs) and
# attention runs as (8, hd) x (hd, S) matmuls per (slot, kv-head) pair.
# Weight DMAs are issued exactly like the bs=1 kernel: the stream never
# stops, and the whole layer exposes ONE pipeline fill instead of five.
#
# Reference anchor: the reference has no batched serving at all (bs=1
# TinyChat, README.md:87-88) — this extends the repo's continuous-batching
# lead (serving/batcher.py) with a fused decode step.


def _fused_layer_b_kernel(
    l_ref,  # (2+8,) scalar prefetch: [l, l_next, n_live[0..7]]
    q32_ref,  # (8, Hkv*8, hd) bf16 — rope'd, pre-scaled, group-padded q
    mask_ref,  # (8, S) f32 additive mask (0 valid / -inf invalid)
    h_ref,  # (8, D) bf16, rows 0..B-1 real
    gpost_ref,  # (1, D) bf16
    gin_ref,  # (1, D) bf16 (layer l+1)
    bias_ref,  # (1, dqkv) bf16 (layer l+1)
    k_hbm,  # (L, 8, S, Hkv*hd) bf16 HBM (flat decode cache)
    v_hbm,
    o_p, o_s, g_p, g_s, d_p, d_s, q_p, q_s,  # stacked weight slots, HBM
    h_out,  # (8, D) bf16
    qkv_out,  # (8, dqkv) bf16
    *,
    mo, mg, md, mq, n_bo, n_bg, n_bd, n_bq, eps, hkv, hd, kv_blk, n_rows,
):
    l = l_ref[0]
    l_next = l_ref[1]
    (half_o, bo, nj_o, ngh_o, gs_o) = mo
    (half_g, bg, nj_g, ngh_g, gs_g) = mg
    (half_d, bd, nj_d, ngh_d, gs_d) = md
    (half_q, bq, nj_q, ngh_q, gs_q) = mq
    s_len = k_hbm.shape[2]
    inter = 2 * half_d
    p_rows = 8  # group-padded q rows per kv head
    n_kv_blk = s_len // kv_blk if kv_blk else 1
    B = n_rows  # kernel row count == padded batch (8 or 16)

    def body(k_buf, v_buf, o_bufs, o_sb, g_bufs, g_sb, d_bufs, d_sb,
             q_bufs, q_sb, gu_buf, d_acc, x_att_buf,
             kv_sem, o_sem, o_ssem, g_sem, g_ssem, d_sem, d_ssem,
             q_sem, q_ssem):
        def dma(p_arr, s_arr, bufs, sbufs, psem, ssem, lw):
            def go(slot, j):
                return (
                    pltpu.make_async_copy(p_arr.at[lw, j], bufs.at[slot],
                                          psem.at[slot]),
                    pltpu.make_async_copy(s_arr.at[lw, j], sbufs.at[slot],
                                          ssem.at[slot]),
                )
            return go

        dma_o = dma(o_p, o_s, o_bufs, o_sb, o_sem, o_ssem, l)
        dma_g = dma(g_p, g_s, g_bufs, g_sb, g_sem, g_ssem, l)
        dma_d = dma(d_p, d_s, d_bufs, d_sb, d_sem, d_ssem, l)
        dma_q = dma(q_p, q_s, q_bufs, q_sb, q_sem, q_ssem, l_next)

        def kv_issue(b, slot):
            """Start the live KV blocks of batch row b into buffer slot."""
            n_live = l_ref[2 + b]
            for i in range(n_kv_blk):
                sl = (pl.ds(i * kv_blk, kv_blk) if n_kv_blk > 1
                      else slice(None))
                ck = pltpu.make_async_copy(
                    k_hbm.at[l, b, sl], k_buf.at[slot, sl],
                    kv_sem.at[0, slot, i],
                )
                cv = pltpu.make_async_copy(
                    v_hbm.at[l, b, sl], v_buf.at[slot, sl],
                    kv_sem.at[1, slot, i],
                )
                if n_kv_blk > 1:
                    @pl.when(i < n_live)
                    def _(ck=ck, cv=cv):
                        ck.start()
                        cv.start()
                else:
                    ck.start()
                    cv.start()

        def kv_wait(b, slot):
            n_live = l_ref[2 + b]
            for i in range(n_kv_blk):
                sl = (pl.ds(i * kv_blk, kv_blk) if n_kv_blk > 1
                      else slice(None))
                ck = pltpu.make_async_copy(
                    k_hbm.at[l, b, sl], k_buf.at[slot, sl],
                    kv_sem.at[0, slot, i],
                )
                cv = pltpu.make_async_copy(
                    v_hbm.at[l, b, sl], v_buf.at[slot, sl],
                    kv_sem.at[1, slot, i],
                )
                if n_kv_blk > 1:
                    @pl.when(i < n_live)
                    def _(ck=ck, cv=cv):
                        ck.wait()
                        cv.wait()
                    # blocks past the live prefix never DMA'd this slot
                    # use: zero them (uninitialized VMEM can hold NaN bit
                    # patterns; exp(-inf)*NaN from the V side would poison
                    # the probs @ V dot)
                    @pl.when(i >= n_live)
                    def _(sl=sl):
                        z = jnp.zeros((kv_blk, k_buf.shape[2]), k_buf.dtype)
                        k_buf[slot, sl] = z
                        v_buf[slot, sl] = z
                else:
                    ck.wait()
                    cv.wait()

        # DMA queue drains in issue order: KV of the first two slots
        # (attention gates everything), then the whole o stream, then the
        # gate_up head; down/qkv chain off the refill tails as in the
        # bs=1 kernel.
        kv_issue(0, 0)
        kv_issue(1, 1)
        for t in range(n_bo):
            for d in dma_o(t, t):
                d.start()
        for t in range(n_bg):
            for d in dma_g(t, t):
                d.start()
        # decoupled start conditions — see the bs=1 kernel: gating the down
        # head on nj_d <= n_bd as well deadlocks d_loop when nj_g <= n_bg
        # but nj_d > n_bd (no upfront start AND no gu_loop chain)
        if nj_g <= n_bg:
            for t in range(n_bd):
                for d in dma_d(t, t):
                    d.start()
            if nj_d <= n_bd:
                for t in range(n_bq):
                    for d in dma_q(t, t):
                        d.start()

        # ---- attention: per (slot, kv head), double-buffered KV ----
        lane_blk = jax.lax.broadcasted_iota(
            jnp.int32, (p_rows, p_rows * hd), 1
        ) // hd
        row_id = jax.lax.broadcasted_iota(
            jnp.int32, (p_rows, p_rows * hd), 0
        )
        for b in range(B):  # static unroll
            slot = b % 2
            kv_wait(b, slot)
            mask = mask_ref[b][None, :]  # (1, S) f32
            parts = []
            for g in range(hkv):  # static
                qg = q32_ref[b, g * p_rows:(g + 1) * p_rows, :]  # (8, hd)
                kg = k_buf[slot, :, g * hd:(g + 1) * hd]  # (S, hd)
                vg = v_buf[slot, :, g * hd:(g + 1) * hd]
                if kg.dtype != jnp.bfloat16:  # static: f32 cache (CPU)
                    kg = kg.astype(jnp.bfloat16)
                    vg = vg.astype(jnp.bfloat16)
                sc = jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (8, S)
                probs = _softmax_rows(sc + mask).astype(jnp.bfloat16)
                og = jax.lax.dot_general(
                    probs, vg,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (8, hd) f32
                # flatten (8, hd) -> (8*hd,): spread block-diagonally and
                # sum rows (a sublane->lane reshape the VPU can't do
                # directly)
                tiled = jnp.concatenate([og] * p_rows, axis=1)
                parts.append(jnp.sum(
                    jnp.where(lane_blk == row_id, tiled, 0.0), axis=0,
                ))
            x_att_buf[pl.ds(b, 1), :] = jnp.concatenate(parts).astype(
                jnp.bfloat16
            )[None, :]
            if b + 2 < B:
                kv_issue(b + 2, slot)  # slot's compute done: safe to reuse

        x_att = x_att_buf[:]  # (8, Hkv*8*hd) == (8, o_din), rows = slots

        # ---- o stream (rows = batch slots: plain matmul, no row-sum) ----
        lo_d, hi_d = _quant_planes(x_att, gs_o, ngh_o)
        cols = []
        for j in range(nj_o):  # static
            slot = j % n_bo
            for d in dma_o(slot, j):
                d.wait()
            cols.append(_block_compute(
                lo_d, hi_d,
                lambda sl, slot=slot: o_bufs[slot, sl, :],
                lambda g, slot=slot: o_sb[slot, g, :],
                bm=B, bout=bo, group_size=gs_o, n_groups=ngh_o,
            ))
            if j + n_bo < nj_o:
                for d in dma_o(slot, j + n_bo):
                    d.start()
        acc_o = jnp.concatenate(cols, axis=1)  # (8, D)

        h32 = h_ref[:].astype(jnp.float32) + acc_o
        x1 = _rms_scale(h32, gpost_ref[0], eps).astype(jnp.bfloat16)

        # ---- gate_up stream ----
        glo_d, ghi_d = _quant_planes(x1, gs_g, ngh_g)

        def gu_loop(j, carry):
            slot = j % n_bg
            for d in dma_g(slot, j):
                d.wait()
            blk = _block_compute(
                glo_d, ghi_d,
                lambda sl: g_bufs[slot, sl, :],
                lambda g: g_sb[slot, g, :],
                bm=B, bout=bg, group_size=gs_g, n_groups=ngh_g,
            )
            off = pl.multiple_of(j * bg, bg)
            gu_buf[:, pl.ds(off, bg)] = blk.astype(gu_buf.dtype)

            @pl.when(j + n_bg < nj_g)
            def _():
                for d in dma_g(slot, j + n_bg):
                    d.start()

            if nj_g > n_bg:
                @pl.when(j == nj_g - n_bg - 1)
                def _():
                    for t in range(n_bd):
                        for d in dma_d(t, t):
                            d.start()
                    if nj_d <= n_bd:
                        for t in range(n_bq):
                            for d in dma_q(t, t):
                                d.start()
            return carry

        jax.lax.fori_loop(0, nj_g, gu_loop, 0)

        # ---- silu-mul + down stream ----
        gu32 = gu_buf[:].astype(jnp.float32)
        gate, up = gu32[:, :inter], gu32[:, inter:]
        m_act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)
        dlo_d, dhi_d = _quant_planes(m_act, gs_d, ngh_d)

        def d_loop(j, carry):
            slot = j % n_bd
            for d in dma_d(slot, j):
                d.wait()
            blk = _block_compute(
                dlo_d, dhi_d,
                lambda sl: d_bufs[slot, sl, :],
                lambda g: d_sb[slot, g, :],
                bm=B, bout=bd, group_size=gs_d, n_groups=ngh_d,
            )
            off = pl.multiple_of(j * bd, bd)
            d_acc[:, pl.ds(off, bd)] = blk

            @pl.when(j + n_bd < nj_d)
            def _():
                for d in dma_d(slot, j + n_bd):
                    d.start()

            if nj_d > n_bd:
                @pl.when(j == nj_d - n_bd - 1)
                def _():
                    for t in range(n_bq):
                        for d in dma_q(t, t):
                            d.start()
            return carry

        jax.lax.fori_loop(0, nj_d, d_loop, 0)

        h32b = h32 + d_acc[:]
        h_out[:] = h32b.astype(h_out.dtype)
        x2 = _rms_scale(h32b, gin_ref[0], eps).astype(jnp.bfloat16)

        # ---- qkv stream (layer l+1) ----
        qlo_d, qhi_d = _quant_planes(x2, gs_q, ngh_q)
        bias = bias_ref[0]
        for j in range(nj_q):  # static
            slot = j % n_bq
            for d in dma_q(slot, j):
                d.wait()
            blk = _block_compute(
                qlo_d, qhi_d,
                lambda sl, slot=slot: q_bufs[slot, sl, :],
                lambda g, slot=slot: q_sb[slot, g, :],
                bm=B, bout=bq, group_size=gs_q, n_groups=ngh_q,
            )
            blk = blk + bias[j * bq:(j + 1) * bq].astype(
                jnp.float32)[None, :]
            qkv_out[:, j * bq:(j + 1) * bq] = blk.astype(qkv_out.dtype)
            if j + n_bq < nj_q:
                for d in dma_q(slot, j + n_bq):
                    d.start()

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, s_len, k_hbm.shape[3]), k_hbm.dtype),
        v_buf=pltpu.VMEM((2, s_len, k_hbm.shape[3]), k_hbm.dtype),
        o_bufs=pltpu.VMEM((n_bo, half_o, bo), jnp.uint8),
        o_sb=pltpu.VMEM((n_bo, o_s.shape[-2], bo), jnp.bfloat16),
        g_bufs=pltpu.VMEM((n_bg, half_g, bg), jnp.uint8),
        g_sb=pltpu.VMEM((n_bg, g_s.shape[-2], bg), jnp.bfloat16),
        d_bufs=pltpu.VMEM((n_bd, half_d, bd), jnp.uint8),
        d_sb=pltpu.VMEM((n_bd, d_s.shape[-2], bd), jnp.bfloat16),
        q_bufs=pltpu.VMEM((n_bq, half_q, bq), jnp.uint8),
        q_sb=pltpu.VMEM((n_bq, q_s.shape[-2], bq), jnp.bfloat16),
        gu_buf=pltpu.VMEM((B, mg[1] * mg[2]), jnp.bfloat16),
        d_acc=pltpu.VMEM((B, md[1] * md[2]), jnp.float32),
        x_att_buf=pltpu.VMEM((B, hkv * p_rows * hd), jnp.bfloat16),
        kv_sem=pltpu.SemaphoreType.DMA((2, 2, n_kv_blk)),
        o_sem=pltpu.SemaphoreType.DMA((n_bo,)),
        o_ssem=pltpu.SemaphoreType.DMA((n_bo,)),
        g_sem=pltpu.SemaphoreType.DMA((n_bg,)),
        g_ssem=pltpu.SemaphoreType.DMA((n_bg,)),
        d_sem=pltpu.SemaphoreType.DMA((n_bd,)),
        d_ssem=pltpu.SemaphoreType.DMA((n_bd,)),
        q_sem=pltpu.SemaphoreType.DMA((n_bq,)),
        q_ssem=pltpu.SemaphoreType.DMA((n_bq,)),
    )


def fused_layer_batched(
    q32: jnp.ndarray,  # (B, Hkv*8, hd) bf16 — rope'd, scaled, group-padded
    mask: jnp.ndarray,  # (B, S) f32 additive
    h: jnp.ndarray,  # (B, D) — all rows real
    layer_index: jnp.ndarray,  # () int32
    k_cache: jnp.ndarray,  # (L, B, S, Hkv*hd) bf16 (flat decode cache)
    v_cache: jnp.ndarray,
    o_slot, gu_slot, down_slot, qkv_slot,
    gamma_post: jnp.ndarray,  # (L, D)
    gamma_in: jnp.ndarray,  # (L, D)
    *,
    hkv: int, hd: int, eps: float = 1e-6,
    fill: jnp.ndarray = None,  # (B,) or () int32: last written slot index
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One decoder layer for batched (1 < B <= 8) quantized decode in a
    single kernel: returns (h_new (B, D), qkv_of_layer_l_plus_1 (B, dqkv)).

    KV streams per batch row (double-buffered slabs, live-prefix blocks
    only when `fill` is given); all four weight streams run with
    rows == batch slots."""
    B_in = q32.shape[0]
    assert B_in <= 16, B_in
    L = o_slot["packed"].shape[0]
    l_next = jnp.minimum(layer_index + 1, L - 1)
    dqkv = qkv_slot["packed"].shape[1] * qkv_slot["packed"].shape[-1]
    bias = qkv_slot.get("bias")
    if bias is None:
        bias = jnp.zeros((L, dqkv), jnp.bfloat16)
    gpost_row = jax.lax.dynamic_index_in_dim(
        gamma_post.astype(jnp.bfloat16), layer_index, 0)
    gin_row = jax.lax.dynamic_index_in_dim(
        gamma_in.astype(jnp.bfloat16), l_next, 0)
    bias_row = jax.lax.dynamic_index_in_dim(
        bias.astype(jnp.bfloat16), l_next, 0)

    if _use_ref_path():
        # reference composition (CPU): per-row attention + quant matmuls
        p_rows = 8
        kg = jax.lax.dynamic_index_in_dim(k_cache, layer_index, 0,
                                          keepdims=False)  # (B, S, Hkv*hd)
        vg = jax.lax.dynamic_index_in_dim(v_cache, layer_index, 0,
                                          keepdims=False)
        rows = []
        for b in range(B_in):
            parts = []
            for g in range(hkv):
                qg = q32[b, g * p_rows:(g + 1) * p_rows].astype(jnp.float32)
                k_h = kg[b, :, g * hd:(g + 1) * hd].astype(jnp.float32)
                v_h = vg[b, :, g * hd:(g + 1) * hd].astype(jnp.float32)
                sc = qg @ k_h.T + mask[b][None, :]
                p = jax.nn.softmax(sc, axis=-1)
                parts.append((p @ v_h).reshape(-1))  # (8*hd,)
            rows.append(jnp.concatenate(parts))
        x_att = jnp.stack(rows).astype(jnp.bfloat16)  # (B, o_din)
        from vila_tpu.ops.quant import w4_matmul_decode

        acc = w4_matmul_decode(x_att, o_slot["packed"], o_slot["scales"],
                               layer_index=layer_index)
        h32 = h.astype(jnp.float32) + acc.astype(jnp.float32)
        x1 = _rms_scale(h32, gpost_row[0], eps).astype(jnp.bfloat16)
        gu = w4_matmul_decode(x1, gu_slot["packed"], gu_slot["scales"],
                              layer_index=layer_index)
        inter = gu.shape[1] // 2
        gu32 = gu.astype(jnp.float32)
        m_act = (jax.nn.silu(gu32[:, :inter]) * gu32[:, inter:]).astype(
            jnp.bfloat16)
        accd = w4_matmul_decode(m_act, down_slot["packed"],
                                down_slot["scales"],
                                layer_index=layer_index)
        h32b = h32 + accd.astype(jnp.float32)
        x2 = _rms_scale(h32b, gin_row[0], eps).astype(jnp.bfloat16)
        qkv = w4_matmul_decode(x2, qkv_slot["packed"], qkv_slot["scales"],
                               layer_index=l_next)
        qkv = qkv + bias_row.astype(qkv.dtype)  # bias_row is (1, dqkv)
        return h32b.astype(h.dtype), qkv

    # Pad the batch to 8 (or 16) kernel rows; padded rows carry zero q/h
    # and a single live KV block (mask all -inf -> uniform probs over
    # zeros).
    B = 8 if B_in <= 8 else 16
    q32p = q32
    maskp = mask
    hp = h
    if B_in < B:
        q32p = jnp.pad(q32, ((0, B - B_in), (0, 0), (0, 0)))
        maskp = jnp.pad(mask, ((0, B - B_in), (0, 0)),
                        constant_values=-1e30)
        hp = jnp.pad(h, ((0, B - B_in), (0, 0)))

    s_len_ = k_cache.shape[2]
    kv_blk = 256 if s_len_ % 256 == 0 and s_len_ > 256 else 0
    if kv_blk:
        if fill is None:
            n_live = jnp.full((B,), s_len_ // kv_blk, jnp.int32)
        else:
            f = jnp.asarray(fill, jnp.int32)
            if f.ndim == 0:
                f = jnp.full((B_in,), f, jnp.int32)
            n_live = jnp.concatenate(
                [f // kv_blk + 1,
                 jnp.ones((B - B_in,), jnp.int32)]
            ) if B_in < B else f // kv_blk + 1
    else:
        n_live = jnp.ones((B,), jnp.int32)

    mo = _meta5(o_slot)
    mg = _meta5(gu_slot)
    md = _meta5(down_slot)
    mq = _meta5(qkv_slot)
    o_block = mo[0] * mo[1]
    n_bo = mo[2] if mo[2] * o_block <= (8 << 20) else max(
        2, (6 << 20) // o_block)
    n_bg = min(4, mg[2])
    n_bd = min(3, md[2])
    n_bq = min(4, mq[2])
    d_model = h.shape[1]
    # pad the batch dim of the cache view if the caller runs B_in slots in
    # a (L, B_in, S, ...) cache smaller than 8 — DMA indexes row b < B
    if k_cache.shape[1] < B:
        padb = B - k_cache.shape[1]
        k_cache = jnp.pad(k_cache, ((0, 0), (0, padb), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, padb), (0, 0), (0, 0)))

    h_new, qkv = pl.pallas_call(
        functools.partial(
            _fused_layer_b_kernel,
            mo=mo, mg=mg, md=md, mq=mq,
            n_bo=n_bo, n_bg=n_bg, n_bd=n_bd, n_bq=n_bq,
            eps=eps, hkv=hkv, hd=hd, kv_blk=kv_blk, n_rows=B,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # q32
                pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
                pl.BlockSpec(memory_space=pltpu.VMEM),  # h
                pl.BlockSpec(memory_space=pltpu.VMEM),  # gpost row
                pl.BlockSpec(memory_space=pltpu.VMEM),  # gin row
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bias row
                pl.BlockSpec(memory_space=pl.ANY),  # k cache
                pl.BlockSpec(memory_space=pl.ANY),  # v cache
                pl.BlockSpec(memory_space=pl.ANY),  # o packed
                pl.BlockSpec(memory_space=pl.ANY),  # o scales
                pl.BlockSpec(memory_space=pl.ANY),  # gu packed
                pl.BlockSpec(memory_space=pl.ANY),  # gu scales
                pl.BlockSpec(memory_space=pl.ANY),  # down packed
                pl.BlockSpec(memory_space=pl.ANY),  # down scales
                pl.BlockSpec(memory_space=pl.ANY),  # qkv packed
                pl.BlockSpec(memory_space=pl.ANY),  # qkv scales
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, d_model), h.dtype),
            jax.ShapeDtypeStruct((B, dqkv), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=120 << 20,
        ),
        interpret=_interpret_arg(),
    )(
        jnp.concatenate([
            jnp.asarray(layer_index, jnp.int32).reshape(1),
            jnp.asarray(l_next, jnp.int32).reshape(1),
            n_live,
        ]),
        q32p.astype(jnp.bfloat16), maskp.astype(jnp.float32),
        hp.astype(jnp.bfloat16),
        gpost_row, gin_row, bias_row,
        k_cache, v_cache,
        o_slot["packed"], o_slot["scales"],
        gu_slot["packed"], gu_slot["scales"],
        down_slot["packed"], down_slot["scales"],
        qkv_slot["packed"], qkv_slot["scales"],
    )
    return h_new[:B_in], qkv[:B_in]
