"""Pallas flash attention fwd + custom-VJP bwd parity vs the XLA reference
(interpret mode on CPU; the same kernels compile for TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.ops.attention import attention_xla
from vila_tpu.ops.flash_attention import flash_attention, flash_block_backward


def make_qkv(b=1, s=256, hq=4, hkv=2, d=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3)
    return q, k, v


def two_segments(b, s):
    seg = np.ones((b, s), np.int32)
    seg[:, s // 2 :] = 2
    return jnp.asarray(seg)


@pytest.mark.parametrize("s,with_seg", [(256, False), (256, True), (200, False)])
def test_grad_parity_vs_xla(s, with_seg):
    q, k, v = make_qkv(s=s)
    seg = two_segments(1, s) if with_seg else None
    w = jnp.asarray(
        np.random.default_rng(9).standard_normal(q.shape).astype(np.float32)
    )

    def loss_fa(q, k, v):
        o = flash_attention(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
            block_q=128, block_kv=128,
        )
        return jnp.sum(o * w)

    def loss_x(q, k, v):
        o = attention_xla(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
        )
        return jnp.sum(o * w)

    (l1, g_fa) = jax.value_and_grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    (l2, g_x) = jax.value_and_grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    assert abs(float(l1 - l2)) < 1e-3
    for a, b in zip(g_fa, g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_block_backward_matches_full_backward():
    """flash_block_backward with the block's own LSE is the whole backward."""
    q, k, v = make_qkv(s=256, seed=3)
    w = jnp.asarray(
        np.random.default_rng(4).standard_normal(q.shape).astype(np.float32)
    )
    out, lse = flash_attention(
        q, k, v, causal=True, block_q=128, block_kv=128, return_lse=True
    )
    delta = jnp.sum(
        w.transpose(0, 2, 1, 3) * out.transpose(0, 2, 1, 3).astype(jnp.float32),
        axis=-1,
    )
    dq, dk, dv = flash_block_backward(
        q, k, v, w, lse, delta, causal=True, block_q=128, block_kv=128
    )
    g_x = jax.grad(
        lambda q, k, v: jnp.sum(attention_xla(q, k, v, causal=True) * w),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip((dq, dk, dv), g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_bf16_grads_finite():
    q, k, v = make_qkv(s=256, seed=5)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, block_q=128, block_kv=128)
        return jnp.sum(o.astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
    for x in g:
        assert x.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(x.astype(jnp.float32)).all())


# ---------------------------------------------------------------------------
# blocked (memory-bounded online-softmax) attention
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("block", [7, 16, 64])
@pytest.mark.parametrize("with_seg", [False, True])
def test_blocked_matches_xla(block, with_seg):
    from vila_tpu.ops.attention import attention_blocked

    rng = np.random.default_rng(0)
    b, sq, skv, hq, hkv, d = 2, 9, 33, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(b, sq, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, skv, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, skv, hkv, d)).astype(np.float32))
    qp = jnp.asarray(rng.integers(0, skv, (b, sq)).astype(np.int32))
    kp = jnp.broadcast_to(jnp.arange(skv, dtype=jnp.int32), (b, skv))
    kwargs = dict(causal=True, q_positions=qp, kv_positions=kp,
                  kv_valid_len=jnp.asarray([skv, skv - 5], jnp.int32))
    if with_seg:
        kwargs["q_segment_ids"] = jnp.asarray(
            rng.integers(0, 2, (b, sq)).astype(np.int32))
        kwargs["kv_segment_ids"] = jnp.asarray(
            rng.integers(0, 2, (b, skv)).astype(np.int32))
    ref = np.asarray(attention_xla(q, k, v, **kwargs))
    got = np.asarray(attention_blocked(q, k, v, block=block, **kwargs))
    # rows with zero attendable keys are undefined (xla emits a uniform
    # average of masked values, blocked emits zeros) — compare only rows
    # that can attend somewhere
    m = np.asarray(qp)[:, :, None] >= np.asarray(kp)[:, None, :]
    m &= np.arange(skv)[None, None, :] < np.asarray(
        kwargs["kv_valid_len"])[:, None, None]
    if with_seg:
        m &= (np.asarray(kwargs["q_segment_ids"])[:, :, None]
              == np.asarray(kwargs["kv_segment_ids"])[:, None, :])
    attendable = m.any(-1)  # (b, sq)
    np.testing.assert_allclose(got[attendable], ref[attendable],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[~attendable], 0.0, atol=1e-6)


def test_blocked_fully_masked_rows_are_zero():
    """A query with no attendable key must produce zeros, not an average of
    masked values (the finite _NEG_INF sentinel makes this a real hazard)."""
    from vila_tpu.ops.attention import attention_blocked

    rng = np.random.default_rng(1)
    b, sq, skv, h, d = 1, 4, 16, 2, 8
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, skv, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, skv, h, d)).astype(np.float32))
    # q positions BEFORE every kv position -> causality masks everything
    qp = jnp.zeros((b, sq), jnp.int32)
    kp = jnp.broadcast_to(
        jnp.arange(1, skv + 1, dtype=jnp.int32), (b, skv))
    out = attention_blocked(q, k, v, causal=True, q_positions=qp,
                            kv_positions=kp, block=8)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_auto_routes_large_offset_q_to_blocked():
    """Cache-prefill shapes (q_positions set -> flash kernel rejected) must
    not materialize (Sq, Skv) scores at long context: auto picks the
    blocked path for large score matrices and matches xla numerics."""
    from vila_tpu.ops.attention import multi_head_attention

    rng = np.random.default_rng(2)
    b, sq, skv, h, d = 1, 512, 8192, 2, 16
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, skv, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, skv, h, d)).astype(np.float32))
    qp = jnp.broadcast_to(
        jnp.arange(100, 100 + sq, dtype=jnp.int32), (b, sq))
    kp = jnp.broadcast_to(jnp.arange(skv, dtype=jnp.int32), (b, skv))
    kwargs = dict(causal=True, q_positions=qp, kv_positions=kp)
    got = multi_head_attention(q, k, v, impl="auto", **kwargs)
    ref = attention_xla(q, k, v, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_blocked_non_causal_matches_xla():
    """Non-causal blocked attention (vision-tower shapes can hit the auto
    threshold, e.g. PS3 high-res sequences)."""
    from vila_tpu.ops.attention import attention_blocked

    rng = np.random.default_rng(3)
    b, s, h, d = 2, 70, 4, 24
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    ref = attention_xla(q, k, v, causal=False)
    got = attention_blocked(q, k, v, causal=False, block=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
