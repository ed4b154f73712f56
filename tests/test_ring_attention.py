"""Sequence parallelism correctness on an 8-device virtual CPU mesh:
ring attention, Ulysses, and 2D hybrid must equal single-device attention."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vila_tpu.ops.attention import attention_xla
from vila_tpu.parallel import ring_attention as ra


def make_qkv(b=1, s=256, hq=8, hkv=4, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3)
    return q, k, v


def test_local_attention_lse_matches_reference():
    q, k, v = make_qkv()
    ref = attention_xla(q, k, v, causal=True)
    got, lse = ra._local_attention_with_lse(q, k, v, causal=True, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    assert lse.shape == (1, 8, 256)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_single_device(causal):
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
    q, k, v = make_qkv(s=256)
    ref = attention_xla(q, k, v, causal=causal)

    fn = shard_map(
        functools.partial(
            ra.ring_flash_attention, axis_name="sp", causal=causal, impl="xla"
        ),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
        check_rep=False,
    )
    got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


def test_ring_with_segments():
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
    q, k, v = make_qkv(s=256, seed=1)
    seg = np.zeros((1, 256), np.int32)
    seg[:, :100] = 1
    seg[:, 100:] = 2
    segj = jnp.asarray(seg)
    ref = attention_xla(
        q, k, v, causal=True, q_segment_ids=segj, kv_segment_ids=segj
    )

    def inner(q, k, v, qs, ks):
        return ra.ring_flash_attention(
            q, k, v, "sp", causal=True, impl="xla",
            q_segment_ids=qs, kv_segment_ids=ks,
        )

    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(None, "sp"), P(None, "sp"), P(None, "sp"),
            P(None, "sp"), P(None, "sp"),
        ),
        out_specs=P(None, "sp"),
        check_rep=False,
    )
    got = jax.jit(fn)(q, k, v, segj, segj)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


@pytest.mark.parametrize("hkv", [4, 2])
def test_ulysses_matches_single_device(hkv):
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
    q, k, v = make_qkv(s=256, hq=8, hkv=hkv, seed=2)
    ref = attention_xla(q, k, v, causal=True)

    fn = shard_map(
        functools.partial(
            ra.ulysses_attention, axis_name="sp", causal=True, impl="xla"
        ),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
        check_rep=False,
    )
    got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


def test_hybrid_2d_matches_single_device():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("ring", "ulysses"))
    q, k, v = make_qkv(s=512, hq=8, hkv=8, seed=3)
    ref = attention_xla(q, k, v, causal=True)

    fn = shard_map(
        functools.partial(
            ra.hybrid_attention,
            ulysses_axis="ulysses", ring_axis="ring",
            causal=True, impl="xla",
        ),
        mesh=mesh,
        in_specs=(
            P(None, ("ring", "ulysses")),
            P(None, ("ring", "ulysses")),
            P(None, ("ring", "ulysses")),
        ),
        out_specs=P(None, ("ring", "ulysses")),
        check_rep=False,
    )
    got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# Backward (training) + zigzag load-balanced layout
# ---------------------------------------------------------------------------


def _ref_grads(q, k, v, w, causal=True, seg=None):
    def loss(q, k, v):
        o = attention_xla(
            q, k, v, causal=causal, q_segment_ids=seg, kv_segment_ids=seg
        )
        return jnp.sum(o * w)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
def test_ring_grads_match_single_device(layout):
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
    s = 256
    q, k, v = make_qkv(s=s, seed=7)
    w = jnp.asarray(
        np.random.default_rng(8).standard_normal(q.shape).astype(np.float32)
    )
    ref_g = _ref_grads(q, k, v, w)

    order = ra.zigzag_order(s, n) if layout == "zigzag" else np.arange(s)
    inv = np.argsort(order)
    qp, kp, vp, wp = (x[:, order] for x in (q, k, v, w))

    def sharded_loss(q, k, v):
        fn = shard_map(
            functools.partial(
                ra.ring_flash_attention, axis_name="sp", causal=True,
                impl="xla", layout=layout,
            ),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
            check_rep=False,
        )
        return jnp.sum(fn(q, k, v) * wp)

    got = jax.jit(jax.grad(sharded_loss, argnums=(0, 1, 2)))(qp, kp, vp)
    got = tuple(x[:, inv] for x in got)  # back to global order
    for a, b in zip(got, ref_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_zigzag_forward_matches_single_device():
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
    s = 256
    q, k, v = make_qkv(s=s, seed=11)
    ref = attention_xla(q, k, v, causal=True)
    order = ra.zigzag_order(s, n)
    inv = ra.inverse_zigzag_order(s, n)

    fn = shard_map(
        functools.partial(
            ra.ring_flash_attention, axis_name="sp", causal=True,
            impl="xla", layout="zigzag",
        ),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
        check_rep=False,
    )
    got = jax.jit(fn)(q[:, order], k[:, order], v[:, order])[:, inv]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


def test_zigzag_with_segments_and_grads():
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
    s = 256
    q, k, v = make_qkv(s=s, seed=13)
    seg = np.ones((1, s), np.int32)
    seg[:, 77:] = 2
    segj = jnp.asarray(seg)
    w = jnp.asarray(
        np.random.default_rng(14).standard_normal(q.shape).astype(np.float32)
    )
    ref_g = _ref_grads(q, k, v, w, seg=segj)

    order = ra.zigzag_order(s, n)
    inv = np.argsort(order)
    qp, kp, vp, wp = (x[:, order] for x in (q, k, v, w))
    segp = segj[:, order]

    def sharded_loss(q, k, v):
        def inner(q, k, v, qs, ks):
            return ra.ring_flash_attention(
                q, k, v, "sp", causal=True, impl="xla", layout="zigzag",
                q_segment_ids=qs, kv_segment_ids=ks,
            )

        fn = shard_map(
            inner,
            mesh=mesh,
            in_specs=(
                P(None, "sp"), P(None, "sp"), P(None, "sp"),
                P(None, "sp"), P(None, "sp"),
            ),
            out_specs=P(None, "sp"),
            check_rep=False,
        )
        return jnp.sum(fn(q, k, v, segp, segp) * wp)

    got = jax.jit(jax.grad(sharded_loss, argnums=(0, 1, 2)))(qp, kp, vp)
    got = tuple(x[:, inv] for x in got)
    for a, b in zip(got, ref_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_ulysses_grads_match_single_device():
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
    q, k, v = make_qkv(s=256, hq=8, hkv=2, seed=15)
    w = jnp.asarray(
        np.random.default_rng(16).standard_normal(q.shape).astype(np.float32)
    )
    ref_g = _ref_grads(q, k, v, w)

    def sharded_loss(q, k, v):
        fn = shard_map(
            functools.partial(
                ra.ulysses_attention, axis_name="sp", causal=True, impl="xla"
            ),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
            check_rep=False,
        )
        return jnp.sum(fn(q, k, v) * w)

    got = jax.jit(jax.grad(sharded_loss, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(got, ref_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_hybrid_grads_match_single_device():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("ring", "ulysses"))
    q, k, v = make_qkv(s=512, hq=8, hkv=8, seed=17)
    w = jnp.asarray(
        np.random.default_rng(18).standard_normal(q.shape).astype(np.float32)
    )
    ref_g = _ref_grads(q, k, v, w)

    def sharded_loss(q, k, v):
        fn = shard_map(
            functools.partial(
                ra.hybrid_attention,
                ulysses_axis="ulysses", ring_axis="ring",
                causal=True, impl="xla",
            ),
            mesh=mesh,
            in_specs=(
                P(None, ("ring", "ulysses")),
                P(None, ("ring", "ulysses")),
                P(None, ("ring", "ulysses")),
            ),
            out_specs=P(None, ("ring", "ulysses")),
            check_rep=False,
        )
        return jnp.sum(fn(q, k, v) * w)

    got = jax.jit(jax.grad(sharded_loss, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(got, ref_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )
