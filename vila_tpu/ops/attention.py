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
) -> Optional[jnp.ndarray]:
    """Boolean (B, Sq, Skv) mask; True = attend."""
    masks = []
    if causal:
        masks.append(q_positions[:, :, None] >= kv_positions[:, None, :])
    if q_segment_ids is not None and kv_segment_ids is not None:
        masks.append(q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
    if kv_valid_len is not None:
        kv_idx = jnp.arange(skv, dtype=jnp.int32)
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

    impl: "auto" | "xla" | "pallas".  "auto" picks the Pallas flash kernel on
    TPU for shapes it supports, else the XLA path.
    """
    if impl == "auto":
        impl = "pallas" if _pallas_supported(q, k, v, q_positions) else "xla"
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
