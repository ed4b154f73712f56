"""Ring attention + Ulysses + 2D hybrid (MM-SP) — TPU-native sequence
parallelism, forward AND backward (training-grade).

Capability parity: LongVILA's MM-SP stack (SURVEY.md §2.3) —
  * Ulysses all-to-all head scatter: `UlyssesAttention`
    (llava/train/sequence_parallel/ulysses_attn.py:97), `all_to_all_4D`
    (all_to_all.py:26), GQA KV-head replication (`_ExpandKVFunction`,
    ulysses_attn.py:26)
  * Ring attention with online LSE merge: `ring_flash_attn_forward` and
    `update_out_and_lse` (ring/ring_flash_attn.py:26, ring/utils.py:29-63)
  * Ring backward: rotate KV *and* their gradient accumulators around the
    ring, recompute per-block P from the merged LSE
    (ring/ring_flash_attn.py:75-153)
  * Zigzag causal load balance: device r holds global chunks (r, 2n-1-r) of
    a 2n-chunk split, so every ring step does ~half the full-block work and
    no device idles (ring/zigzag_ring_flash_attn_varlen.py:31-63)
  * 2D hybrid: `HybridAttention` (hybrid_attn.py:93-190) — Ulysses inner ×
    Ring outer over a mesh axis pair.

TPU design: NCCL P2P send/recv → `jax.lax.ppermute` over the ICI ring;
NCCL all-to-all → `jax.lax.all_to_all`. Everything runs inside `shard_map`
over named mesh axes, composable with GSPMD jit around it. Gradients flow
through a `jax.custom_vjp` on the ring (the scan-of-ppermute transpose XLA
would derive is correct but materializes every step's KV; the custom ring
backward keeps memory O(S_local)).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    try:
        return "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    except Exception:  # pragma: no cover
        return "xla"


# KV lengths above this use the scan-chunked XLA path so the (Sq, Skv)
# scores tensor never materializes (long-context CPU fallback; the Pallas
# kernel already streams blocks on TPU).
_XLA_CHUNK_THRESHOLD = 4096
_XLA_KV_CHUNK = 2048


def _local_attention_with_lse(
    q, k, v, *, causal: bool,
    q_segment_ids=None, kv_segment_ids=None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(out, lse): lse is natural-log sum exp of scaled scores, (B, H, Sq)."""
    impl = _resolve_impl(impl)
    if impl == "pallas":
        from vila_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, causal=causal,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            scale=scale, return_lse=True,
        )
    if k.shape[1] > _XLA_CHUNK_THRESHOLD:
        return _chunked_attention_with_lse(
            q, k, v, causal=causal,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            scale=scale,
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
    mask = _local_mask(sq, skv, causal, q_segment_ids, kv_segment_ids)
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


def _chunked_attention_with_lse(
    q, k, v, *, causal: bool,
    q_segment_ids=None, kv_segment_ids=None,
    scale: Optional[float] = None,
    chunk: int = _XLA_KV_CHUNK,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flash attention expressed in XLA: lax.scan over KV chunks with the
    online LSE merge, so peak memory is O(Sq · chunk) instead of
    O(Sq · Skv). Matches `_local_attention_with_lse` exactly (same masks,
    float32 statistics); used for long local shards on backends without the
    Pallas kernel."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    if scale is None:
        scale = d**-0.5

    pad = (-skv) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        if kv_segment_ids is not None:
            kv_segment_ids = jnp.pad(
                kv_segment_ids, ((0, 0), (0, pad)), constant_values=-1
            )
    nc = (skv + pad) // chunk

    qf = (q.astype(jnp.float32) * scale).reshape(b, sq, hkv, g, d)
    kc = k.reshape(b, nc, chunk, hkv, d).transpose(1, 0, 2, 3, 4)
    vc = v.reshape(b, nc, chunk, hkv, d).transpose(1, 0, 2, 3, 4)
    segc = (
        kv_segment_ids.reshape(b, nc, chunk).transpose(1, 0, 2)
        if kv_segment_ids is not None
        else jnp.zeros((nc, b, 0), jnp.int32)
    )
    rows = jnp.arange(sq, dtype=jnp.int32)

    out0 = jnp.zeros((b, sq, hq, d), jnp.float32)
    lse0 = jnp.full((b, hq, sq), _NEG_INF, jnp.float32)

    def body(carry, xs):
        out_acc, lse_acc = carry
        idx, ki, vi, si = xs
        cols = idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
        scores = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qf, ki.astype(jnp.float32)
        )
        mask = jnp.broadcast_to(
            (cols < skv)[None, None, :], (b, sq, chunk)
        )
        if causal:
            mask = jnp.logical_and(
                mask, rows[None, :, None] >= cols[None, None, :]
            )
        if kv_segment_ids is not None:
            mask = jnp.logical_and(
                mask, q_segment_ids[:, :, None] == si[:, None, :]
            )
        scores = jnp.where(mask[:, None, None], scores, _NEG_INF)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), _NEG_INF)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum(
            "bhgqk,bkhd->bqhgd", p / jnp.maximum(l, 1e-30),
            vi.astype(jnp.float32),
        ).reshape(b, sq, hq, d)
        lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0].reshape(b, hq, sq)
        lse = jnp.where(lse <= _NEG_INF / 2, _NEG_INF, lse)
        out_acc, lse_acc = _merge(out_acc, lse_acc, o, lse)
        return (out_acc, lse_acc), None

    (out, lse), _ = jax.lax.scan(
        body, (out0, lse0),
        (jnp.arange(nc, dtype=jnp.int32), kc, vc, segc),
    )
    return out.astype(q.dtype), lse


def _local_mask(sq, skv, causal, q_segment_ids, kv_segment_ids):
    """(B or 1, Sq, Skv) boolean mask; True = attend; None = all visible."""
    mask = None
    if causal:
        rows = jnp.arange(sq)[:, None]
        cols = jnp.arange(skv)[None, :]
        mask = (rows >= cols)[None]
    if q_segment_ids is not None:
        seg = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    return mask


def _block_bwd_xla(q, k, v, do, lse, delta, *, causal, q_segment_ids,
                   kv_segment_ids, scale):
    """(dq, dk, dv) for one KV block given externally merged LSE/Δ — XLA
    reference for the Pallas flash_block_backward (CPU tests, tiny shapes)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    if scale is None:
        scale = d**-0.5
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)

    s = jnp.einsum("bqhgd,bkhd->bhgqk", qf.reshape(b, sq, hkv, g, d), kf) * scale
    lse_r = lse.reshape(b, hkv, g, sq)  # (B, Hkv, G, Sq)
    row_valid = lse_r > _NEG_INF / 2
    p = jnp.exp(s - jnp.where(row_valid, lse_r, 0.0)[..., None])
    p = jnp.where(row_valid[..., None], p, 0.0)
    mask = _local_mask(sq, skv, causal, q_segment_ids, kv_segment_ids)
    if mask is not None:
        p = jnp.where(mask[:, None, None], p, 0.0)

    do_r = dof.reshape(b, sq, hkv, g, d)
    dv = jnp.einsum("bhgqk,bqhgd->bkhd", p, do_r)
    dp = jnp.einsum("bqhgd,bkhd->bhgqk", do_r, vf)
    ds = p * (dp - delta.reshape(b, hkv, g, sq)[..., None])
    dq = scale * jnp.einsum("bhgqk,bkhd->bqhgd", ds, kf)
    dk = scale * jnp.einsum("bhgqk,bqhgd->bkhd", ds, qf.reshape(b, sq, hkv, g, d))
    return (
        dq.reshape(b, sq, hq, d).astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
    )


def _block_bwd(q, k, v, do, lse, delta, *, causal, q_segment_ids,
               kv_segment_ids, impl, scale=None):
    if impl == "pallas":
        from vila_tpu.ops.flash_attention import flash_block_backward

        return flash_block_backward(
            q, k, v, do, lse, delta, causal=causal,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            scale=scale,
        )
    return _block_bwd_xla(
        q, k, v, do, lse, delta, causal=causal,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        scale=scale,
    )


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


# --------------------------------------------------------------------------
# Zigzag layout helpers (host/global side)
# --------------------------------------------------------------------------


def zigzag_order(seq_len: int, n: int) -> np.ndarray:
    """Permutation mapping global token index -> zigzag-layout index such
    that a contiguous sp-shard of the permuted sequence gives device r the
    global chunks (r, 2n-1-r). Apply with x[..., order, ...]."""
    assert seq_len % (2 * n) == 0, (seq_len, n)
    c = seq_len // (2 * n)
    chunks = np.arange(seq_len).reshape(2 * n, c)
    parts = [np.concatenate([chunks[r], chunks[2 * n - 1 - r]]) for r in range(n)]
    return np.concatenate(parts)


def inverse_zigzag_order(seq_len: int, n: int) -> np.ndarray:
    order = zigzag_order(seq_len, n)
    inv = np.empty_like(order)
    inv[order] = np.arange(seq_len)
    return inv


# --------------------------------------------------------------------------
# Ring attention (contiguous or zigzag) with custom VJP
# --------------------------------------------------------------------------


def _ring_step_fwd(q, k_cur, v_cur, q_seg, kv_seg_cur, *, src, my, causal,
                   impl, layout, scale=None):
    """One ring step's partial (out f32, lse) on this device."""
    b, s_loc, hq, d = q.shape
    half = s_loc // 2

    def diag(_):
        o, l = _local_attention_with_lse(
            q, k_cur, v_cur, causal=True,
            q_segment_ids=q_seg, kv_segment_ids=kv_seg_cur,
            impl=impl, scale=scale,
        )
        return o.astype(jnp.float32), l

    def full(_):
        o, l = _local_attention_with_lse(
            q, k_cur, v_cur, causal=False,
            q_segment_ids=q_seg, kv_segment_ids=kv_seg_cur,
            impl=impl, scale=scale,
        )
        return o.astype(jnp.float32), l

    def skip(_):
        return (
            jnp.zeros((b, s_loc, hq, d), jnp.float32),
            jnp.full((b, hq, s_loc), _NEG_INF, jnp.float32),
        )

    if not causal:
        return full(None)

    if layout == "zigzag":
        def earlier(_):
            # src < my: kv's first chunk is globally before all local q;
            # its second chunk is after all local q. Half the work.
            o, l = _local_attention_with_lse(
                q, k_cur[:, :half], v_cur[:, :half], causal=False,
                q_segment_ids=q_seg,
                kv_segment_ids=(
                    kv_seg_cur[:, :half] if kv_seg_cur is not None else None
                ),
                impl=impl, scale=scale,
            )
            return o.astype(jnp.float32), l

        def later(_):
            # src > my: only local q's second chunk (global index 2n-1-my)
            # is after both of src's chunks. Half the work.
            o, l = _local_attention_with_lse(
                q[:, half:], k_cur, v_cur, causal=False,
                q_segment_ids=q_seg[:, half:] if q_seg is not None else None,
                kv_segment_ids=kv_seg_cur,
                impl=impl, scale=scale,
            )
            o_f = jnp.zeros((b, s_loc, hq, d), jnp.float32)
            o_f = jax.lax.dynamic_update_slice(
                o_f, o.astype(jnp.float32), (0, half, 0, 0)
            )
            l_f = jnp.full((b, hq, s_loc), _NEG_INF, jnp.float32)
            l_f = jax.lax.dynamic_update_slice(l_f, l, (0, 0, half))
            return o_f, l_f

        return jax.lax.cond(
            src == my, diag,
            lambda op: jax.lax.cond(src < my, earlier, later, op),
            None,
        )

    return jax.lax.cond(
        src == my, diag,
        lambda op: jax.lax.cond(src < my, full, skip, op),
        None,
    )


def _ring_step_bwd(q, k_cur, v_cur, do, lse, delta, q_seg, kv_seg_cur, *,
                   src, my, causal, impl, layout):
    """One ring step's (dq, dk, dv) contributions (f32, local shapes)."""
    b, s_loc, hq, d = q.shape
    hkv = k_cur.shape[2]
    half = s_loc // 2
    f32 = jnp.float32

    def bb(qq, kk, vv, ddo, ll, dd, *, causal_, qs, ks):
        dq, dk, dv = _block_bwd(
            qq, kk, vv, ddo, ll, dd, causal=causal_,
            q_segment_ids=qs, kv_segment_ids=ks, impl=impl,
        )
        return dq.astype(f32), dk.astype(f32), dv.astype(f32)

    def diag(_):
        return bb(q, k_cur, v_cur, do, lse, delta, causal_=True,
                  qs=q_seg, ks=kv_seg_cur)

    def full(_):
        return bb(q, k_cur, v_cur, do, lse, delta, causal_=False,
                  qs=q_seg, ks=kv_seg_cur)

    def skip(_):
        return (
            jnp.zeros((b, s_loc, hq, d), f32),
            jnp.zeros((b, s_loc, hkv, d), f32),
            jnp.zeros((b, s_loc, hkv, d), f32),
        )

    if not causal:
        return full(None)

    if layout == "zigzag":
        def earlier(_):
            dq, dk_h, dv_h = bb(
                q, k_cur[:, :half], v_cur[:, :half], do, lse, delta,
                causal_=False, qs=q_seg,
                ks=kv_seg_cur[:, :half] if kv_seg_cur is not None else None,
            )
            z = jnp.zeros((b, s_loc, hkv, d), f32)
            dk = jax.lax.dynamic_update_slice(z, dk_h, (0, 0, 0, 0))
            dv = jax.lax.dynamic_update_slice(z, dv_h, (0, 0, 0, 0))
            return dq, dk, dv

        def later(_):
            dq_h, dk, dv = bb(
                q[:, half:], k_cur, v_cur, do[:, half:],
                lse[:, :, half:], delta[:, :, half:],
                causal_=False,
                qs=q_seg[:, half:] if q_seg is not None else None,
                ks=kv_seg_cur,
            )
            dq = jnp.zeros((b, s_loc, hq, d), f32)
            dq = jax.lax.dynamic_update_slice(dq, dq_h, (0, half, 0, 0))
            return dq, dk, dv

        return jax.lax.cond(
            src == my, diag,
            lambda op: jax.lax.cond(src < my, earlier, later, op),
            None,
        )

    return jax.lax.cond(
        src == my, diag,
        lambda op: jax.lax.cond(src < my, full, skip, op),
        None,
    )


def _ring_fwd_scan(q, k, v, q_seg, kv_seg, axis_name, causal, impl, layout):
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, s_loc, hq, d = q.shape

    out = jnp.zeros((b, s_loc, hq, d), jnp.float32)
    lse = jnp.full((b, hq, s_loc), _NEG_INF, jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step_fn(carry, step):
        out, lse, k_cur, v_cur, seg_cur = carry
        src = (my - step) % n
        o_new, l_new = _ring_step_fwd(
            q, k_cur, v_cur, q_seg, seg_cur,
            src=src, my=my, causal=causal, impl=impl, layout=layout,
        )
        out, lse = _merge(out, lse, o_new, l_new)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_nxt = (
            jax.lax.ppermute(seg_cur, axis_name, perm)
            if seg_cur is not None
            else None
        )
        return (out, lse, k_nxt, v_nxt, seg_nxt), None

    carry = (out, lse, k, v, kv_seg)
    (out, lse, _, _, _), _ = jax.lax.scan(
        step_fn, carry, jnp.arange(n), length=n
    )
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ring(q, k, v, q_seg, kv_seg, axis_name, causal, impl, layout):
    out, _ = _ring_fwd_scan(q, k, v, q_seg, kv_seg, axis_name, causal, impl, layout)
    return out.astype(q.dtype)


def _ring_fwd(q, k, v, q_seg, kv_seg, axis_name, causal, impl, layout):
    out, lse = _ring_fwd_scan(q, k, v, q_seg, kv_seg, axis_name, causal, impl, layout)
    out = out.astype(q.dtype)
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _ring_bwd(axis_name, causal, impl, layout, residuals, do):
    q, k, v, q_seg, kv_seg, out, lse = residuals
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, s_loc, hq, d = q.shape
    hkv = k.shape[2]
    perm = [(i, (i + 1) % n) for i in range(n)]

    # Δ = rowsum(dO ∘ O) over the head dim, (B, Hq, S_local).
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)

    dq0 = jnp.zeros((b, s_loc, hq, d), jnp.float32)
    dkv0 = jnp.zeros((b, s_loc, hkv, d), jnp.float32)

    def step_fn(carry, step):
        dq_acc, dk_acc, dv_acc, k_cur, v_cur, seg_cur = carry
        src = (my - step) % n
        dq_p, dk_p, dv_p = _ring_step_bwd(
            q, k_cur, v_cur, do, lse, delta, q_seg, seg_cur,
            src=src, my=my, causal=causal, impl=impl, layout=layout,
        )
        dq_acc = dq_acc + dq_p
        # dK/dV accumulators travel with their KV shard around the ring;
        # after n steps they arrive back at the shard's owner complete.
        dk_acc = jax.lax.ppermute(dk_acc + dk_p, axis_name, perm)
        dv_acc = jax.lax.ppermute(dv_acc + dv_p, axis_name, perm)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_nxt = (
            jax.lax.ppermute(seg_cur, axis_name, perm)
            if seg_cur is not None
            else None
        )
        return (dq_acc, dk_acc, dv_acc, k_nxt, v_nxt, seg_nxt), None

    carry = (dq0, dkv0, dkv0, k, v, kv_seg)
    (dq, dk, dv, _, _, _), _ = jax.lax.scan(
        step_fn, carry, jnp.arange(n), length=n
    )
    dq = dq.astype(q.dtype)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)

    def _int_tangent(x):
        if x is None:
            return None
        return np.zeros(x.shape, jax.dtypes.float0)

    return dq, dk, dv, _int_tangent(q_seg), _int_tangent(kv_seg)


_ring.defvjp(_ring_fwd, _ring_bwd)


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
    layout: str = "contiguous",
) -> jnp.ndarray:
    """Exact attention over a sequence sharded on `axis_name`; differentiable.

    layout="contiguous": device r holds tokens [r·S/n, (r+1)·S/n). Correct
    but causally imbalanced — rank n−1 does n× rank 0's work.
    layout="zigzag": device r holds global chunks (r, 2n−1−r) of a 2n-chunk
    split (use `zigzag_order` to reorder the global sequence before
    sharding); every step does ~half-block work on every device.

    KV shards rotate around the ring via ppermute; partial results merge via
    online LSE. Must be called inside shard_map with the sequence dim
    sharded over `axis_name`.
    """
    if layout not in ("contiguous", "zigzag"):
        raise ValueError(f"unknown ring layout: {layout}")
    if layout == "zigzag" and q.shape[1] % 2 != 0:
        raise ValueError("zigzag layout needs an even local sequence length")
    impl = _resolve_impl(impl)
    return _ring(
        q, k, v, q_segment_ids, kv_segment_ids,
        axis_name, causal, impl, layout,
    )


def expand_kv_heads(k: jnp.ndarray, v: jnp.ndarray, target_heads: int):
    """Replicate KV heads so they divide the Ulysses degree
    (reference: _ExpandKVFunction, ulysses_attn.py:26-94)."""
    hkv = k.shape[2]
    if target_heads <= hkv:
        return k, v
    if target_heads % hkv != 0:
        raise ValueError(
            f"cannot expand {hkv} KV heads to {target_heads} (not divisible)"
        )
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
    (reference: ulysses_attn.py:97-178, all_to_all.py:26).

    Differentiable end-to-end: all_to_all/all_gather have XLA transpose
    rules and the local attention is the custom-VJP flash kernel (or XLA).
    """
    n = jax.lax.axis_size(axis_name)
    hq = q.shape[2]
    if hq % n != 0:
        raise ValueError(
            f"Ulysses degree {n} must divide the {hq} query heads "
            "(reference replicates KV heads only: ulysses_attn.py:26)"
        )
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

    out = _local_attention(
        qg, kg, vg, causal=causal,
        q_segment_ids=q_seg, kv_segment_ids=kv_seg, impl=impl,
    )
    return gather_heads(out)


def _local_attention(q, k, v, *, causal, q_segment_ids, kv_segment_ids, impl):
    """Differentiable local attention (no LSE)."""
    impl = _resolve_impl(impl)
    if impl == "pallas":
        from vila_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, causal=causal,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        )
    from vila_tpu.ops.attention import attention_xla

    return attention_xla(
        q, k, v, causal=causal,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
    )


def hybrid_attention(
    q, k, v,
    ulysses_axis: str,
    ring_axis: str,
    *,
    causal: bool = True,
    q_segment_ids=None,
    kv_segment_ids=None,
    impl: str = "auto",
    ring_layout: str = "contiguous",
) -> jnp.ndarray:
    """MM-SP 2D attention: Ulysses a2a inside, ring outside
    (reference: HybridAttention, hybrid_attn.py:93-190). Differentiable."""
    n_u = jax.lax.axis_size(ulysses_axis)
    hq = q.shape[2]
    if hq % n_u != 0:
        raise ValueError(
            f"Ulysses degree {n_u} must divide the {hq} query heads"
        )
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
        layout=ring_layout,
    )
    return a2a_out(out)
