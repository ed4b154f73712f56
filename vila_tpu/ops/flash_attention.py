"""Pallas TPU flash attention — forward and backward (jax.custom_vjp).

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
  * FA2-style backward: recompute P from saved LSE per block, two kernels —
    dQ (KV-inner grid) and per-q-head dK/dV (Q-inner grid) with a group-sum
    outside for GQA (reference math: ring/ring_flash_attn.py:75-153)

Layout: (B, S, H, D) with one q-head and one q-block per grid step; the KV
grid axis is innermost so accumulators live across it in VMEM scratch.

The block-backward entry (`flash_block_backward`) also serves ring
attention's backward, where LSE/delta come from the globally merged result
rather than the local block.
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


@functools.cache
def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU correctness tests)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


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


def _prep(q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv):
    """To kernel layout: (B, H, S, D), S padded to block multiples, segment
    ids synthesized when padding would otherwise leak. Returns the padded
    arrays plus (q_seg, kv_seg, use_segments, sq0, skv0)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
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
    return q, k, v, q_seg, kv_seg, use_segments, sq0, skv0


def _seg_specs(use_segments, block_q, block_kv, *, q_axis, kv_axis):
    """BlockSpecs for the two segment-id operands; grid index order is
    (b, h, a2, a3) with the q/kv block index at position q_axis/kv_axis."""
    seg_block_q = block_q if use_segments else 1
    seg_block_kv = block_kv if use_segments else 1

    def qmap(bb, h, i, j):
        idx = (i, j)[q_axis - 2]
        return (bb, idx) if seg_block_q > 1 else (0, 0)

    def kvmap(bb, h, i, j):
        idx = (i, j)[kv_axis - 2]
        return (bb, idx) if seg_block_kv > 1 else (0, 0)

    return [
        pl.BlockSpec((1, seg_block_q), qmap),
        pl.BlockSpec((1, seg_block_kv), kvmap),
    ]


def _fwd_padded(q, k, v, q_seg, kv_seg, *, causal, scale, block_q, block_kv,
                use_segments, with_lse):
    """pallas fwd on prepped (B, H, S, D) arrays. Returns (out_p, lse_p?)."""
    b, hq, sq_p, d = q.shape
    hkv, skv_p = k.shape[1], k.shape[2]
    g = hq // hkv
    nq = sq_p // block_q
    nk = skv_p // block_kv
    grid = (b, hq, nq, nk)

    base_kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_kv=block_kv,
        use_segments=use_segments,
    )
    if with_lse:
        kernel = base_kernel
    else:
        def kernel(qs, ks, qr, kr, vr, orf, acc, m, l):
            base_kernel(qs, ks, qr, kr, vr, orf, None, acc, m, l)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_seg_specs(use_segments, block_q, block_kv, q_axis=2, kv_axis=3) + [
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
        interpret=_interpret(),
    )(q_seg, kv_seg, q, k, v)

    if with_lse:
        return outs[0], outs[1][..., 0]  # lse (B, H, Sq_p)
    return outs[0], None


# --------------------------------------------------------------------------
# Backward kernels (FA2-style recompute from LSE)
# --------------------------------------------------------------------------


def _block_p(q, k, lse, q_seg_ref, kv_seg_ref, *, scale, causal,
             q_start, kv_start, block_q, block_kv, use_segments):
    """Recompute the (bq, bkv) probability block P = exp(S·scale − LSE)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
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
    # Fully-masked rows carry lse == -inf; exp overflows there but the mask
    # (or a row-validity guard) zeroes them before use.
    row_valid = lse > _NEG_INF / 2  # (bq, 1)
    p = jnp.exp(s - jnp.where(row_valid, lse, 0.0))
    p = jnp.where(row_valid, p, 0.0)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    return p, s


def _bwd_dq_kernel(
    q_seg_ref, kv_seg_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc_ref,
    *, scale, causal, block_q, block_kv, use_segments,
):
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)
    q_start = qi * block_q
    kv_start = kj * block_kv

    @pl.when(kj == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]
        p, _ = _block_p(
            q, k, lse, q_seg_ref, kv_seg_ref,
            scale=scale, causal=causal, q_start=q_start, kv_start=kv_start,
            block_q=block_q, block_kv=block_kv, use_segments=use_segments,
        )
        # dP = dO · Vᵀ ; dS = P ∘ (dP − Δ) ; dQ += scale · dS · K
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        pl.when(q_start + block_q - 1 >= kv_start)(_body)
    else:
        _body()

    @pl.when(kj == nk - 1)
    def _finish():
        dq_ref[0, 0] = (dq_acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_seg_ref, kv_seg_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
    *, scale, causal, block_q, block_kv, use_segments,
):
    kj = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)
    q_start = qi * block_q
    kv_start = kj * block_kv

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]
        p, _ = _block_p(
            q, k, lse, q_seg_ref, kv_seg_ref,
            scale=scale, causal=causal, q_start=q_start, kv_start=kv_start,
            block_q=block_q, block_kv=block_kv, use_segments=use_segments,
        )
        # dV += Pᵀ · dO ; dS = P ∘ (dP − Δ) ; dK += scale · dSᵀ · Q
        dv_acc_ref[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk_acc_ref[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        pl.when(q_start + block_q - 1 >= kv_start)(_body)
    else:
        _body()

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0, 0] = (dk_acc_ref[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _bwd_padded(q, k, v, do, lse, delta, q_seg, kv_seg,
                *, causal, scale, block_q, block_kv, use_segments):
    """Backward on prepped (B, H, S, D) arrays; lse/delta are (B, Hq, Sq_p)
    f32. Returns (dq, dk, dv) in kernel layout — dk/dv already group-summed
    to (B, Hkv, Skv_p, D)."""
    b, hq, sq_p, d = q.shape
    hkv, skv_p = k.shape[1], k.shape[2]
    g = hq // hkv
    nq = sq_p // block_q
    nk = skv_p // block_kv

    # Lane-pad LSE/Δ to 8 so their blocks satisfy TPU tiling.
    lse8 = jnp.broadcast_to(lse[..., None], (b, hq, sq_p, 8))
    delta8 = jnp.broadcast_to(delta[..., None], (b, hq, sq_p, 8))

    qkvdo_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bb, h, i, j: (bb, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, d), lambda bb, h, i, j: (bb, h // g, j, 0)),
        pl.BlockSpec((1, 1, block_kv, d), lambda bb, h, i, j: (bb, h // g, j, 0)),
        pl.BlockSpec((1, 1, block_q, d), lambda bb, h, i, j: (bb, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, 8), lambda bb, h, i, j: (bb, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, 8), lambda bb, h, i, j: (bb, h, i, 0)),
    ]

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel,
            scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, use_segments=use_segments,
        ),
        grid=(b, hq, nq, nk),
        in_specs=_seg_specs(use_segments, block_q, block_kv, q_axis=2, kv_axis=3)
        + qkvdo_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, h, i, j: (bb, h, i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype)],
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_seg, kv_seg, q, k, v, do, lse8, delta8)[0]

    # dK/dV per q-head (grid q-inner), then a group-sum handles GQA.
    qkvdo_specs_t = [
        pl.BlockSpec((1, 1, block_q, d), lambda bb, h, j, i: (bb, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, d), lambda bb, h, j, i: (bb, h // g, j, 0)),
        pl.BlockSpec((1, 1, block_kv, d), lambda bb, h, j, i: (bb, h // g, j, 0)),
        pl.BlockSpec((1, 1, block_q, d), lambda bb, h, j, i: (bb, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, 8), lambda bb, h, j, i: (bb, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, 8), lambda bb, h, j, i: (bb, h, i, 0)),
    ]
    dk_ph, dv_ph = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel,
            scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, use_segments=use_segments,
        ),
        grid=(b, hq, nk, nq),
        in_specs=_seg_specs(use_segments, block_q, block_kv, q_axis=3, kv_axis=2)
        + qkvdo_specs_t,
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, h, j, i: (bb, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, h, j, i: (bb, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, skv_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, skv_p, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_seg, kv_seg, q, k, v, do, lse8, delta8)

    dk = dk_ph.reshape(b, hkv, g, skv_p, d).sum(2).astype(k.dtype)
    dv = dv_ph.reshape(b, hkv, g, skv_p, d).sum(2).astype(v.dtype)
    return dq, dk, dv


def _zeros_tangent(x):
    """float0 cotangent for integer (non-differentiable) array inputs."""
    import numpy as np

    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_core(q, k, v, q_seg, kv_seg,
                causal, scale, block_q, block_kv, use_segments):
    """Differentiable core on prepped (B, H, S, D) arrays; returns padded out."""
    out, _ = _fwd_padded(
        q, k, v, q_seg, kv_seg,
        causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
        use_segments=use_segments, with_lse=False,
    )
    return out


def _flash_core_fwd(q, k, v, q_seg, kv_seg,
                    causal, scale, block_q, block_kv, use_segments):
    out, lse = _fwd_padded(
        q, k, v, q_seg, kv_seg,
        causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
        use_segments=use_segments, with_lse=True,
    )
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _flash_core_bwd(causal, scale, block_q, block_kv, use_segments,
                    residuals, do):
    q, k, v, q_seg, kv_seg, out, lse = residuals
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (B, Hq, Sq_p)
    dq, dk, dv = _bwd_padded(
        q, k, v, do, lse, delta, q_seg, kv_seg,
        causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
        use_segments=use_segments,
    )
    return dq, dk, dv, _zeros_tangent(q_seg), _zeros_tangent(kv_seg)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


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
    """Flash attention; differentiable (custom VJP) when return_lse=False.

    The return_lse=True form feeds ring attention, whose backward is its own
    custom VJP (parallel/ring_attention.py) built on flash_block_backward.
    """
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d**-0.5
    block_q = min(block_q, max(sq, 128))
    block_kv = min(block_kv, max(skv, 128))

    qp, kp, vp, q_seg, kv_seg, use_segments, sq0, skv0 = _prep(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv
    )
    causal_eff = causal and sq0 == skv0

    if return_lse:
        out, lse = _fwd_padded(
            qp, kp, vp, q_seg, kv_seg,
            causal=causal_eff, scale=scale, block_q=block_q,
            block_kv=block_kv, use_segments=use_segments, with_lse=True,
        )
        return out.transpose(0, 2, 1, 3)[:, :sq0], lse[:, :, :sq0]

    out = _flash_core(
        qp, kp, vp, q_seg, kv_seg,
        causal_eff, scale, block_q, block_kv, use_segments,
    )
    return out.transpose(0, 2, 1, 3)[:, :sq0]


def flash_block_backward(
    q: jnp.ndarray,  # (B, Sq, Hq, D)
    k: jnp.ndarray,  # (B, Skv, Hkv, D)
    v: jnp.ndarray,
    do: jnp.ndarray,  # (B, Sq, Hq, D) upstream cotangent
    lse: jnp.ndarray,  # (B, Hq, Sq) merged log-sum-exp
    delta: jnp.ndarray,  # (B, Hq, Sq) rowsum(dO ∘ O_final)
    *,
    causal: bool = True,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One block's (dq, dk, dv) given *externally merged* LSE/Δ — the ring
    attention backward primitive (reference: ring/ring_flash_attn.py:75-153).
    Returns arrays in the public (B, S, H, D) layout."""
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d**-0.5
    block_q = min(block_q, max(sq, 128))
    block_kv = min(block_kv, max(skv, 128))

    qp, kp, vp, q_seg, kv_seg, use_segments, sq0, skv0 = _prep(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv
    )
    dop = jnp.pad(
        do.transpose(0, 2, 1, 3),
        ((0, 0), (0, 0), (0, qp.shape[2] - sq0), (0, 0)),
    )
    pad_q = qp.shape[2] - sq0
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_q)),
                    constant_values=_NEG_INF)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_q)))

    dq, dk, dv = _bwd_padded(
        qp, kp, vp, dop, lse_p.astype(jnp.float32),
        delta_p.astype(jnp.float32), q_seg, kv_seg,
        causal=causal and sq0 == skv0, scale=scale,
        block_q=block_q, block_kv=block_kv, use_segments=use_segments,
    )
    return (
        dq.transpose(0, 2, 1, 3)[:, :sq0],
        dk.transpose(0, 2, 1, 3)[:, :skv0],
        dv.transpose(0, 2, 1, 3)[:, :skv0],
    )
