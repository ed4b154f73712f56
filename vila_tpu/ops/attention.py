"""Multi-head attention: XLA reference path + Pallas flash-attention dispatch.

This is the single attention entry point for the whole framework (vision
tower, LLM prefill, LLM decode). The reference's flash-attn/varlen machinery
(llava/model/utils/packing.py, train/sequence_parallel/monkey_patch.py) maps
here to **segment-ids masking** — packed samples carry an int segment id per
token and the kernel masks cross-segment attention, which is the
TPU/XLA-friendly equivalent of cu_seqlens unpadding.

Conventions:
  q:    (B, Sq, Hq, D)
  k, v: (B, Skv, Hkv, D) with Hq % Hkv == 0 (GQA)
  positions: absolute token positions (used for causal masking so that a
    KV cache with positions==slot indices works for decode too).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _build_mask(
    q_positions: jnp.ndarray,  # (B, Sq) int32
    kv_positions: jnp.ndarray,  # (B, Skv) int32
    causal: bool,
    q_segment_ids: Optional[jnp.ndarray],
    kv_segment_ids: Optional[jnp.ndarray],
    kv_valid_len: Optional[jnp.ndarray],  # (B,) number of valid kv slots
    skv: int,
    kv_index: Optional[jnp.ndarray] = None,  # (Skv,) global slot index
) -> Optional[jnp.ndarray]:
    """Boolean mask broadcastable to (B, Sq, Skv); True = attend.

    `kv_index` overrides the default arange slot indexing — block callers
    (attention_blocked) pass each block's global indices."""
    masks = []
    if causal:
        masks.append(q_positions[:, :, None] >= kv_positions[:, None, :])
    if q_segment_ids is not None and kv_segment_ids is not None:
        masks.append(q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
    if kv_valid_len is not None:
        kv_idx = (
            jnp.arange(skv, dtype=jnp.int32) if kv_index is None else kv_index
        )
        masks.append(kv_idx[None, None, :] < kv_valid_len[:, None, None])
    if not masks:
        return None
    mask = masks[0]
    for m in masks[1:]:
        mask = jnp.logical_and(mask, m)
    return mask


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention in pure XLA ops, float32 softmax.

    Correct on any backend; used for CPU tests and as the fallback when the
    Pallas kernel doesn't apply (tiny shapes, exotic masks).
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    groups = hq // hkv
    if scale is None:
        scale = d**-0.5

    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(sq, dtype=jnp.int32), (b, sq))
    if kv_positions is None:
        kv_positions = jnp.broadcast_to(jnp.arange(skv, dtype=jnp.int32), (b, skv))

    # bf16 inputs (decode hot path): keep K/V in bf16 and let the MXU
    # accumulate in f32 — casting the KV cache to f32 would triple HBM
    # traffic (bf16 read + f32 write + f32 read). f32 inputs keep exact
    # f32 math for parity tests.
    low_prec = q.dtype == jnp.bfloat16
    if low_prec:
        qf = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        kf, vf = k, v
    else:
        qf = q.astype(jnp.float32) * scale
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)

    # (B, Sq, Hkv, G, D) x (B, Skv, Hkv, D) -> (B, Hkv, G, Sq, Skv)
    qf = qf.reshape(b, sq, hkv, groups, d)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qf, kf, preferred_element_type=jnp.float32
    )

    mask = _build_mask(
        q_positions, kv_positions, causal, q_segment_ids, kv_segment_ids,
        kv_valid_len, skv,
    )
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)  # f32 statistics
    if low_prec:
        probs = probs.astype(jnp.bfloat16)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs, vf, preferred_element_type=jnp.float32
    )
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def attention_blocked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block: int = 1024,
    return_stats: bool = False,
) -> jnp.ndarray:
    """Memory-bounded attention: online-softmax `lax.scan` over KV blocks
    (flash-attention recurrence in plain XLA ops).

    `attention_xla` materializes the full (B, H, Sq, Skv) score matrix —
    at long context that is the memory wall (a 4k-chunk prefill against a
    1M-token cache is 16 GB of scores per head). This path keeps a running
    (max, sum, acc) per query and touches one (B, blk) KV block at a time:
    peak intermediate = B*H*Sq*blk floats, independent of Skv. Same math,
    f32 statistics; exact vs `attention_xla` up to f32 summation order.

    Used by the long-context engine's chunked prefill (CPU mesh + TPU) and
    any caller passing impl="blocked"."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    groups = hq // hkv
    if scale is None:
        scale = d**-0.5

    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(sq, dtype=jnp.int32), (b, sq))
    if kv_positions is None:
        kv_positions = jnp.broadcast_to(
            jnp.arange(skv, dtype=jnp.int32), (b, skv)
        )

    blk = min(block, skv)
    nb = (skv + blk - 1) // blk
    pad = nb * blk - skv
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kv_positions = jnp.pad(kv_positions, ((0, 0), (0, pad)))
        if kv_segment_ids is not None:
            kv_segment_ids = jnp.pad(kv_segment_ids, ((0, 0), (0, pad)))
        # the pad tail must be masked even when no other mask applies
        if kv_valid_len is None:
            kv_valid_len = jnp.full((b,), skv, jnp.int32)

    qf = (q.astype(jnp.float32) * scale).reshape(b, sq, hkv, groups, d)
    # scan carries: running max m, running sum l, accumulator acc
    m0 = jnp.full((b, hkv, groups, sq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, groups, sq), jnp.float32)
    acc0 = jnp.zeros((b, sq, hkv, groups, d), jnp.float32)

    # (nb, B, blk, ...) leading scan axis
    kb = k.reshape(b, nb, blk, hkv, d).swapaxes(0, 1)
    vb = v.reshape(b, nb, blk, hkv, d).swapaxes(0, 1)
    pb = kv_positions.reshape(b, nb, blk).swapaxes(0, 1)
    sb = (
        kv_segment_ids.reshape(b, nb, blk).swapaxes(0, 1)
        if kv_segment_ids is not None
        else jnp.zeros((nb, b, 0), jnp.int32)
    )
    ib = (jnp.arange(nb)[:, None] * blk + jnp.arange(blk)[None, :]).astype(
        jnp.int32
    )  # (nb, blk) global kv slot index, for kv_valid_len

    q_pos_max = jnp.max(q_positions)

    def compute_block(carry, xs):
        m, l, acc = carry
        k_j, v_j, p_j, s_j, i_j = xs
        scores = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qf, k_j.astype(jnp.float32),
        )  # (B, Hkv, G, Sq, blk) f32
        mask = _build_mask(
            q_positions, p_j, causal,
            q_segment_ids,
            s_j if kv_segment_ids is not None else None,
            kv_valid_len, blk, kv_index=i_j,
        )
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)
        m_j = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m, m_j)
        # _NEG_INF is finite: for rows masked in every block so far,
        # m == m_new == _NEG_INF and naive exp(0) would count masked
        # entries with weight 1 — zero them explicitly
        alpha = jnp.exp(jnp.where(m <= _NEG_INF * 0.5, _NEG_INF, m - m_new))
        p = jnp.where(
            scores <= _NEG_INF * 0.5,
            0.0,
            jnp.exp(scores - m_new[..., None]),
        )
        l_new = l * alpha + p.sum(-1)
        acc_new = acc * alpha.transpose(0, 3, 1, 2)[..., None] + jnp.einsum(
            "bhgqk,bkhd->bqhgd", p, v_j.astype(jnp.float32),
        )
        return (m_new, l_new, acc_new), None

    if causal:
        # Causal reachability skip: a block whose minimum kv position
        # exceeds every query position is fully masked — skip its compute
        # entirely via lax.cond. Chunked prefill into a pre-allocated
        # cache attends a (max_len)-row buffer that is mostly empty early
        # on; this turns O(chunks * max_len) total work into the
        # triangular O(fill) it should be. (On TPU both cond branches may
        # be hoisted for vector code; the win is on CPU/long-context.)
        def body(carry, xs):
            p_j = xs[2]
            return jax.lax.cond(
                jnp.min(p_j) <= q_pos_max,
                lambda c: compute_block(c, xs)[0],
                lambda c: c,
                carry,
            ), None
    else:
        def body(carry, xs):
            return compute_block(carry, xs)

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kb, vb, pb, sb, ib))
    if return_stats:
        # unnormalized pieces for cross-shard LSE merge (sharded KV):
        # acc (B, Sq, Hq, D) f32, l/m (B, Hq, Sq) f32
        return (
            acc.reshape(b, sq, hq, d),
            l.reshape(b, hq, sq),
            m.reshape(b, hq, sq),
        )
    l = jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2)[..., None]
    return (acc / l).reshape(b, sq, hq, d).astype(q.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    kv_valid_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention entry point with implementation dispatch.

    impl: "auto" | "xla" | "pallas" | "blocked".  "auto" picks the Pallas
    flash kernel on TPU for shapes it supports, else the memory-bounded
    online-softmax path for large score matrices (the cache-prefill path
    always carries q_positions, which the flash kernel rejects — a long
    prompt against a long cache would otherwise materialize an
    (Sq, cache_len) score slab per head: ~7.5 GB at an 8k bucket on the
    8B shape), else plain XLA.
    """
    if impl == "auto":
        if _pallas_supported(q, k, v, q_positions):
            impl = "pallas"
        elif q.shape[1] >= 256 and q.shape[1] * k.shape[1] >= (1 << 22):
            impl = "blocked"
        else:
            impl = "xla"
    if impl == "blocked":
        return attention_blocked(
            q, k, v,
            causal=causal,
            q_positions=q_positions,
            kv_positions=kv_positions,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            kv_valid_len=kv_valid_len,
            scale=scale,
        )
    if impl == "pallas":
        from vila_tpu.ops import flash_attention as fa

        return fa.flash_attention(
            q, k, v,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            scale=scale,
        )
    return attention_xla(
        q, k, v,
        causal=causal,
        q_positions=q_positions,
        kv_positions=kv_positions,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
        kv_valid_len=kv_valid_len,
        scale=scale,
    )


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - device query failure
        return False


def _pallas_supported(q, k, v, q_positions) -> bool:
    if not _on_tpu():
        return False
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    # The flash kernel targets prefill/training: long q, aligned dims.
    # Decode (sq small) and offset q_positions use the XLA/decode paths.
    if sq < 128 or skv < 128 or sq != skv:
        return False
    if d % 128 != 0 or sq % 128 != 0:
        return False
    if q_positions is not None:
        return False
    return True
