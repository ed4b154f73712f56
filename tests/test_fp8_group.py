"""Per-group FP8 (COAT real_quantization recipe): quantization accuracy,
linear fwd/bwd numerics, outlier robustness vs per-tensor, and a
convergence comparison against bf16 over 200 steps (r2 VERDICT #8)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.ops import fp8


def test_grouped_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 300)).astype(np.float32)  # pad path (300 % 128)
    q, s = fp8.quantize_grouped(jnp.asarray(x))
    back = fp8.dequantize_grouped(q, s, 300)
    rel = np.abs(np.asarray(back) - x) / (np.abs(x) + 1e-6)
    assert np.median(rel) < 0.05
    assert q.shape == (4, 3, 128) and s.shape == (4, 3)


def test_block2d_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(200, 260)).astype(np.float32)
    q, s = fp8.quantize_block2d(jnp.asarray(w))
    back = fp8.dequantize_block2d(q, s, 200, 260)
    rel = np.abs(np.asarray(back) - w) / (np.abs(w) + 1e-6)
    assert np.median(rel) < 0.05
    assert q.shape == (2, 128, 3, 128) and s.shape == (2, 3)


def test_group_scales_bound_outlier_damage():
    """One huge outlier must not destroy precision in OTHER groups — the
    failure mode of per-tensor scaling (r2 weak #5)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 512)).astype(np.float32)
    x[0, 5] = 1e7  # extreme outlier in group 0: per-tensor scale
    # pushes ~N(0,1) values into e4m3 underflow (448/1e7 < 2^-9 subnormal)

    qt, st = fp8.quantize_tensor(jnp.asarray(x))
    per_tensor = np.asarray(qt.astype(jnp.float32) * st)
    qg, sg = fp8.quantize_grouped(jnp.asarray(x))
    per_group = np.asarray(fp8.dequantize_grouped(qg, sg, 512))

    clean = np.s_[0, 128:]  # groups 1..3, no outlier
    err_tensor = np.abs(per_tensor[clean] - x[clean]).mean()
    err_group = np.abs(per_group[clean] - x[clean]).mean()
    assert err_group < err_tensor / 10, (err_group, err_tensor)


def test_grouped_linear_fwd_and_grads():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 40, 256)).astype(np.float32)
    w = rng.normal(scale=0.05, size=(256, 192)).astype(np.float32)

    y = fp8.fp8_linear_grouped(jnp.asarray(x), jnp.asarray(w))
    exact = x @ w
    assert np.abs(np.asarray(y) - exact).max() < 0.5
    # relative corpus error small
    assert (
        np.abs(np.asarray(y) - exact).mean() / np.abs(exact).mean() < 0.06
    )

    def loss(x, w):
        return jnp.sum(fp8.fp8_linear_grouped(x, w) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))

    def loss_exact(x, w):
        return jnp.sum((x @ w) ** 2)

    ex, ew = jax.grad(loss_exact, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w)
    )
    assert np.abs(np.asarray(gx) - np.asarray(ex)).mean() < 0.1 * np.abs(
        np.asarray(ex)
    ).mean()
    assert np.abs(np.asarray(gw) - np.asarray(ew)).mean() < 0.1 * np.abs(
        np.asarray(ew)
    ).mean()


@pytest.mark.slow
def test_group_fp8_convergence_vs_bf16():
    """200-step memorization: the per-group FP8 loss curve tracks the
    full-precision curve (COAT's claim for the per-group recipe)."""
    import helpers  # noqa: F401
    from vila_tpu.models import projector, qwen2, siglip, vlm
    from vila_tpu.train.losses import causal_lm_loss

    import optax

    def build(fp8_mode):
        llm = qwen2.LLMConfig(
            vocab_size=128, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, dtype="float32", fp8_matmul=fp8_mode,
        )
        vis = siglip.SigLIPConfig(
            hidden_size=24, intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
        )
        proj = projector.ProjectorConfig(
            projector_type="mlp_downsample", mm_hidden_size=24,
            hidden_size=128,
        )
        return vlm.VLMConfig(llm=llm, vision=vis, projector=proj)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, (2, 64)).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "positions": jnp.broadcast_to(jnp.arange(64), (2, 64)).astype(
            jnp.int32
        ),
        "segment_ids": jnp.ones((2, 64), jnp.int32),
    }

    def train(fp8_mode, steps=200):
        cfg = build(fp8_mode)
        params = vlm.init_params(jax.random.PRNGKey(0), cfg)["llm"]
        opt = optax.adam(3e-4)
        st = opt.init(params)

        @jax.jit
        def step(p, st):
            def loss_fn(p):
                logits, _ = qwen2.forward(
                    p, cfg.llm,
                    input_ids=batch["input_ids"],
                    positions=batch["positions"],
                    segment_ids=batch["segment_ids"],
                )
                loss, _ = causal_lm_loss(logits, batch["labels"])
                return loss

            loss, g = jax.value_and_grad(loss_fn)(p)
            up, st2 = opt.update(g, st, p)
            return optax.apply_updates(p, up), st2, loss

        losses = []
        for _ in range(steps):
            params, st, loss = step(params, st)
            losses.append(float(loss))
        return losses

    base = train(False)
    grouped = train("group")
    # end-of-run losses within 10% relative; both strictly decreasing
    assert grouped[-1] < grouped[0] * 0.5
    assert abs(grouped[-1] - base[-1]) < 0.1 * abs(base[-1]) + 0.05, (
        base[-1], grouped[-1],
    )


def test_fp8_activation_ops_grads():
    """fp8 gelu / silu-mul / rmsnorm: forwards exact, grads within fp8
    residual tolerance of the autodiff reference (COAT
    real_quantization fused-op parity)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32))
    up = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(256,)).astype(np.float32))

    # forwards are exact (no quantization on the value path)
    np.testing.assert_allclose(
        np.asarray(fp8.fp8_gelu(x)), np.asarray(jax.nn.gelu(x, approximate=False)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(fp8.fp8_silu_mul(x, up)), np.asarray(jax.nn.silu(x) * up),
        rtol=1e-6,
    )

    # tolerance: the residual is per-group E4M3; derivative
    # sensitivity amplifies the ~3% element error to ~15% on these probes
    # (the accepted cost of fp8 activation compression). A formula bug
    # would miss by O(1).
    def close(a, b, tol=0.2):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).mean() <= tol * (np.abs(b).mean() + 1e-6), (
            np.abs(a - b).mean(), np.abs(b).mean(),
        )

    g = jax.grad(lambda v: jnp.sum(fp8.fp8_gelu(v) ** 2))(x)
    ge = jax.grad(lambda v: jnp.sum(jax.nn.gelu(v, approximate=False) ** 2))(x)
    close(g, ge)

    gg, gu = jax.grad(
        lambda a, b: jnp.sum(fp8.fp8_silu_mul(a, b) ** 2), argnums=(0, 1)
    )(x, up)
    eg, eu = jax.grad(
        lambda a, b: jnp.sum((jax.nn.silu(a) * b) ** 2), argnums=(0, 1)
    )(x, up)
    close(gg, eg)
    close(gu, eu)

    from vila_tpu.ops.norms import rms_norm

    np.testing.assert_allclose(
        np.asarray(fp8.fp8_rms_norm(x, scale)),
        np.asarray(rms_norm(x, scale)), rtol=1e-5,
    )
    gx, gs = jax.grad(
        lambda v, s: jnp.sum(fp8.fp8_rms_norm(v, s) ** 2), argnums=(0, 1)
    )(x, scale)
    ex, es = jax.grad(
        lambda v, s: jnp.sum(rms_norm(v, s) ** 2), argnums=(0, 1)
    )(x, scale)
    close(gx, ex)
    close(gs, es)
