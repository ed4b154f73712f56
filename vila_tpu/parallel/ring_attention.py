"""Ring attention + Ulysses + 2D hybrid (MM-SP) — TPU-native sequence
parallelism.

Capability parity: LongVILA's MM-SP stack (SURVEY.md §2.3) —
  * Ulysses all-to-all head scatter: `UlyssesAttention`
    (llava/train/sequence_parallel/ulysses_attn.py:97), `all_to_all_4D`
    (all_to_all.py:26), GQA KV-head replication (`_ExpandKVFunction`,
    ulysses_attn.py:26)
  * Ring attention with online LSE merge: `ring_flash_attn_forward` and
    `update_out_and_lse` (ring/ring_flash_attn.py:26, ring/utils.py:29-63)
  * 2D hybrid: `HybridAttention` (hybrid_attn.py:93-190) — Ulysses inner ×
    Ring outer over a mesh axis pair.

TPU design: NCCL P2P send/recv → `jax.lax.ppermute` over the ICI ring;
NCCL all-to-all → `jax.lax.all_to_all`. Everything runs inside `shard_map`
over named mesh axes, composable with GSPMD jit around it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _local_attention_with_lse(
    q, k, v, *, causal: bool,
    q_segment_ids=None, kv_segment_ids=None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(out, lse): lse is natural-log sum exp of scaled scores, (B, H, Sq)."""
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "pallas":
        from vila_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, causal=causal,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            scale=scale, return_lse=True,
        )

    # XLA reference with explicit LSE (float32).
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    if scale is None:
        scale = d**-0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qf.reshape(b, sq, hkv, g, d), kf
    )
    mask = None
    if causal:
        rows = jnp.arange(sq)[:, None]
        cols = jnp.arange(skv)[None, :]
        mask = rows >= cols
        mask = mask[None]
    if q_segment_ids is not None:
        seg = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if mask is not None:
        scores = jnp.where(mask[:, None, None], scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.maximum(m, _NEG_INF)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", p / jnp.maximum(l, 1e-30), v.astype(jnp.float32))
    out = out.reshape(b, sq, hq, d).astype(q.dtype)
    lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0]  # (B, Hkv, G, Sq)
    lse = lse.reshape(b, hq, sq)
    lse = jnp.where(lse <= _NEG_INF / 2, _NEG_INF, lse)
    return out, lse


def _merge(out, lse, o_new, lse_new):
    """Online softmax merge of two partial attention results
    (reference math: ring/utils.py:29-63 `update_out_and_lse`)."""
    out = out.astype(jnp.float32)
    o_new = o_new.astype(jnp.float32)
    m = jnp.maximum(lse, lse_new)
    m_safe = jnp.where(m <= _NEG_INF / 2, 0.0, m)
    w1 = jnp.where(lse <= _NEG_INF / 2, 0.0, jnp.exp(lse - m_safe))
    w2 = jnp.where(lse_new <= _NEG_INF / 2, 0.0, jnp.exp(lse_new - m_safe))
    denom = jnp.maximum(w1 + w2, 1e-30)
    # weights are (B, H, S) -> broadcast to (B, S, H, D)
    w1b = w1.transpose(0, 2, 1)[..., None]
    w2b = w2.transpose(0, 2, 1)[..., None]
    db = denom.transpose(0, 2, 1)[..., None]
    merged = (out * w1b + o_new * w2b) / db
    new_lse = jnp.where(
        (w1 + w2) <= 0.0, _NEG_INF, m_safe + jnp.log(denom)
    )
    return merged, new_lse


def ring_flash_attention(
    q: jnp.ndarray,  # (B, S_local, Hq, D) — this device's sequence shard
    k: jnp.ndarray,  # (B, S_local, Hkv, D)
    v: jnp.ndarray,
    axis_name: str,
    *,
    causal: bool = True,
    q_segment_ids: Optional[jnp.ndarray] = None,  # (B, S_local)
    kv_segment_ids: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Exact attention over a sequence sharded contiguously on `axis_name`.

    KV shards rotate around the ring via ppermute; partial results merge via
    online LSE. Must be called inside shard_map with the sequence dim
    sharded over `axis_name`.
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, s_loc, hq, d = q.shape

    out = jnp.zeros((b, s_loc, hq, d), jnp.float32)
    lse = jnp.full((b, hq, s_loc), _NEG_INF, jnp.float32)

    def step_fn(carry, step):
        out, lse, k_cur, v_cur, kv_seg_cur = carry
        src = (my - step) % n  # which device's KV shard we hold now

        def diag(_):
            # src == my: the diagonal block — causal within.
            return _local_attention_with_lse(
                q, k_cur, v_cur, causal=True,
                q_segment_ids=q_segment_ids, kv_segment_ids=kv_seg_cur,
                impl=impl,
            )

        def full(_):
            # src < my (or non-causal): fully visible block.
            return _local_attention_with_lse(
                q, k_cur, v_cur, causal=False,
                q_segment_ids=q_segment_ids, kv_segment_ids=kv_seg_cur,
                impl=impl,
            )

        def skip(_):
            # src > my under causality: nothing visible — no compute.
            return (
                jnp.zeros((b, s_loc, hq, d), q.dtype),
                jnp.full((b, hq, s_loc), _NEG_INF, jnp.float32),
            )

        if causal:
            o_new, l_new = jax.lax.cond(
                src == my,
                diag,
                lambda op: jax.lax.cond(src < my, full, skip, op),
                None,
            )
        else:
            o_new, l_new = full(None)
        out, lse = _merge(out, lse, o_new, l_new)

        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_nxt = (
            jax.lax.ppermute(kv_seg_cur, axis_name, perm)
            if kv_seg_cur is not None
            else None
        )
        return (out, lse, k_nxt, v_nxt, seg_nxt), None

    carry = (out, lse, k, v, kv_segment_ids)
    (out, lse, _, _, _), _ = jax.lax.scan(
        step_fn, carry, jnp.arange(n), length=n
    )
    return out.astype(q.dtype)


def expand_kv_heads(k: jnp.ndarray, v: jnp.ndarray, target_heads: int):
    """Replicate KV heads so they divide the Ulysses degree
    (reference: _ExpandKVFunction, ulysses_attn.py:26-94)."""
    hkv = k.shape[2]
    if target_heads <= hkv:
        return k, v
    reps = target_heads // hkv
    k = jnp.repeat(k, reps, axis=2)
    v = jnp.repeat(v, reps, axis=2)
    return k, v


def ulysses_attention(
    q: jnp.ndarray,  # (B, S_local, Hq, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    *,
    causal: bool = True,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """DeepSpeed-Ulysses attention: a2a scatters heads / gathers sequence,
    local attention over the full sequence, inverse a2a
    (reference: ulysses_attn.py:97-178, all_to_all.py:26)."""
    n = jax.lax.axis_size(axis_name)
    hq = q.shape[2]
    k, v = expand_kv_heads(k, v, n if k.shape[2] < n else k.shape[2])

    # (B, S/n, H, D) -> (B, S, H/n, D): split heads, concat sequence.
    def scatter_heads(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    def gather_heads(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    qg = scatter_heads(q)
    kg = scatter_heads(k)
    vg = scatter_heads(v)

    if q_segment_ids is not None:
        q_seg = jax.lax.all_gather(
            q_segment_ids, axis_name, axis=1, tiled=True
        )
        kv_seg = jax.lax.all_gather(
            kv_segment_ids, axis_name, axis=1, tiled=True
        )
    else:
        q_seg = kv_seg = None

    out, _ = _local_attention_with_lse(
        qg, kg, vg, causal=causal,
        q_segment_ids=q_seg, kv_segment_ids=kv_seg, impl=impl,
    )
    return gather_heads(out)


def hybrid_attention(
    q, k, v,
    ulysses_axis: str,
    ring_axis: str,
    *,
    causal: bool = True,
    q_segment_ids=None,
    kv_segment_ids=None,
    impl: str = "auto",
) -> jnp.ndarray:
    """MM-SP 2D attention: Ulysses a2a inside, ring outside
    (reference: HybridAttention, hybrid_attn.py:93-190)."""
    n_u = jax.lax.axis_size(ulysses_axis)
    k, v = expand_kv_heads(k, v, n_u if k.shape[2] < n_u else k.shape[2])

    def a2a_in(x):
        return jax.lax.all_to_all(
            x, ulysses_axis, split_axis=2, concat_axis=1, tiled=True
        )

    def a2a_out(x):
        return jax.lax.all_to_all(
            x, ulysses_axis, split_axis=1, concat_axis=2, tiled=True
        )

    qg, kg, vg = a2a_in(q), a2a_in(k), a2a_in(v)
    q_seg = kv_seg = None
    if q_segment_ids is not None:
        q_seg = jax.lax.all_gather(q_segment_ids, ulysses_axis, axis=1, tiled=True)
        kv_seg = jax.lax.all_gather(kv_segment_ids, ulysses_axis, axis=1, tiled=True)

    out = ring_flash_attention(
        qg, kg, vg, ring_axis,
        causal=causal, q_segment_ids=q_seg, kv_segment_ids=kv_seg, impl=impl,
    )
    return a2a_out(out)
