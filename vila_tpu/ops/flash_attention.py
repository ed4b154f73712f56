"""Pallas TPU flash attention (forward + custom VJP).

Replaces the reference's flash-attn / varlen machinery
(llava/train/sequence_parallel/monkey_patch.py, flash_attn_varlen) with a
TPU-native kernel:

  * online-softmax tiling over KV blocks, f32 accumulators in VMEM
  * zero-copy GQA — KV blocks are indexed at head h//G, never materialized
    per q-head
  * packed sequences via segment-ids masking (the TPU equivalent of
    cu_seqlens varlen batching)
  * returns LSE so ring attention (parallel/ring_attention.py) can merge
    partial results across devices (reference math: ring/utils.py:29-63)

Layout: (B, S, H, D) with one q-head and one q-block per grid step; the KV
grid axis is innermost so accumulators live across it in VMEM scratch.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_KV = 512


def _fwd_kernel(
    q_seg_ref,  # (1, bq) int32
    kv_seg_ref,  # (1, bkv) int32
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, bkv, D)
    v_ref,  # (1, 1, bkv, D)
    o_ref,  # (1, 1, bq, D)
    lse_ref,  # (1, 1, bq, 8) or None
    acc_ref,  # (bq, D) f32 scratch
    m_ref,  # (bq, 128) f32 scratch
    l_ref,  # (bq, 128) f32 scratch
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    use_segments: bool,
):
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Fully-masked block under causality: first q row < first kv col.
    q_start = qi * block_q
    kv_start = kj * block_kv

    def _body():
        # bf16 x bf16 -> f32 rides the MXU fast path; scale applied in f32.
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bkv)

        mask = None
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            cols = kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            mask = rows >= cols
        if use_segments:
            seg_eq = q_seg_ref[0, :][:, None] == kv_seg_ref[0, :][None, :]
            mask = seg_eq if mask is None else jnp.logical_and(mask, seg_eq)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:, :1]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (bq, bkv)
        corr = jnp.exp(m_prev - m_new)  # (bq, 1)

        l_ref[:, :1] = l_ref[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * corr + pv

    if causal:
        pl.when(q_start + block_q - 1 >= kv_start)(_body)
    else:
        _body()

    @pl.when(kj == nk - 1)
    def _finish():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            m = m_ref[:, :1]
            lse = jnp.where(l == 0.0, _NEG_INF, m + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (mult - size % mult) % mult
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "scale", "block_q", "block_kv", "return_lse",
    ),
)
def flash_attention(
    q: jnp.ndarray,  # (B, Sq, Hq, D)
    k: jnp.ndarray,  # (B, Skv, Hkv, D)
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_segment_ids: Optional[jnp.ndarray] = None,  # (B, Sq)
    kv_segment_ids: Optional[jnp.ndarray] = None,  # (B, Skv)
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    return_lse: bool = False,
):
    out, lse = _flash_fwd(
        q, k, v, q_segment_ids, kv_segment_ids,
        causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
        with_lse=return_lse,
    )
    if return_lse:
        return out, lse
    return out


def _flash_fwd(
    q, k, v, q_segment_ids, kv_segment_ids,
    *, causal, scale, block_q, block_kv, with_lse=False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    if scale is None:
        scale = d**-0.5

    block_q = min(block_q, max(sq, 128))
    block_kv = min(block_kv, max(skv, 128))

    use_segments = q_segment_ids is not None
    sq0, skv0 = sq, skv
    # Kernel layout is (B, H, S, D) — TPU block constraints need S, D minor.
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q, _ = _pad_to(q, 2, block_q)
    k, _ = _pad_to(k, 2, block_kv)
    v, _ = _pad_to(v, 2, block_kv)
    sq_p, skv_p = q.shape[2], k.shape[2]

    if not use_segments and (sq_p != sq0 or skv_p != skv0):
        # Synthesize segments so KV padding can't leak into real rows
        # (causal handles it when Sq == Skv, but not in general).
        q_segment_ids = jnp.ones((b, sq0), jnp.int32)
        kv_segment_ids = jnp.ones((b, skv0), jnp.int32)
        use_segments = True
    if use_segments:
        q_seg = jnp.zeros((b, sq_p), jnp.int32).at[:, :sq0].set(
            q_segment_ids.astype(jnp.int32) + 1
        )
        kv_seg = jnp.full((b, skv_p), -1, jnp.int32).at[:, :skv0].set(
            kv_segment_ids.astype(jnp.int32) + 1
        )
    else:
        # Unused dummies; (1, 1) satisfies block-shape == array-shape.
        q_seg = jnp.zeros((1, 1), jnp.int32)
        kv_seg = jnp.zeros((1, 1), jnp.int32)

    nq = sq_p // block_q
    nk = skv_p // block_kv
    grid = (b, hq, nq, nk)

    base_kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal and sq0 == skv0,
        block_q=block_q,
        block_kv=block_kv,
        use_segments=use_segments,
    )
    if with_lse:
        kernel = base_kernel
    else:
        def kernel(qs, ks, qr, kr, vr, orf, acc, m, l):
            base_kernel(qs, ks, qr, kr, vr, orf, None, acc, m, l)

    seg_block_q = block_q if use_segments else 1
    seg_block_kv = block_kv if use_segments else 1

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, seg_block_q),
                lambda bb, h, i, j: (bb, i) if seg_block_q > 1 else (0, 0),
            ),
            pl.BlockSpec(
                (1, seg_block_kv),
                lambda bb, h, i, j: (bb, j) if seg_block_kv > 1 else (0, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bb, h, i, j: (bb, h, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d), lambda bb, h, i, j: (bb, h // g, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d), lambda bb, h, i, j: (bb, h // g, j, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bb, h, i, j: (bb, h, i, 0)
            ),
        ] + ([
            pl.BlockSpec(
                (1, 1, block_q, 8), lambda bb, h, i, j: (bb, h, i, 0)
            ),
        ] if with_lse else []),
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        ] + ([
            jax.ShapeDtypeStruct((b, hq, sq_p, 8), jnp.float32),
        ] if with_lse else []),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q_seg, kv_seg, q, k, v)

    if with_lse:
        out, lse = outs
        return out.transpose(0, 2, 1, 3)[:, :sq0], lse[:, :, :sq0, 0]
    return outs[0].transpose(0, 2, 1, 3)[:, :sq0], None
