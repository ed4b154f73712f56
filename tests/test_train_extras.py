"""Tests for training extras: chunked fused CE, LoRA, FP8 path, checkpoints."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.constants import IGNORE_INDEX
from vila_tpu.models import projector, qwen2, siglip, vlm
from vila_tpu.train.losses import causal_lm_loss, chunked_causal_lm_loss


def tiny_cfg(**llm_overrides):
    llm = qwen2.LLMConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
        **llm_overrides,
    )
    vis = siglip.SigLIPConfig(
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
    )
    proj = projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=24, hidden_size=32
    )
    return vlm.VLMConfig(llm=llm, vision=vis, projector=proj)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, s = 2, 33
    batch = {
        "input_ids": rng.integers(0, 128, (b, s)).astype(np.int32),
        "labels": rng.integers(0, 128, (b, s)).astype(np.int32),
        "positions": np.broadcast_to(np.arange(s, dtype=np.int32), (b, s)).copy(),
        "segment_ids": np.ones((b, s), np.int32),
    }
    batch["labels"][0, :5] = IGNORE_INDEX
    return cfg, params, batch


# ---------------------------------------------------------------------------
# chunked CE
# ---------------------------------------------------------------------------


def test_chunked_ce_matches_full(setup):
    cfg, params, batch = setup
    logits = vlm.forward_batch(params, cfg, batch)
    full, n_full = causal_lm_loss(logits, jnp.asarray(batch["labels"]))

    hidden = vlm.forward_batch(params, cfg, batch, return_hidden=True)
    chunked, n_chunk = chunked_causal_lm_loss(
        hidden, params["llm"], cfg.llm, jnp.asarray(batch["labels"]),
        chunk_size=16,
    )
    assert int(n_full) == int(n_chunk)
    np.testing.assert_allclose(float(full), float(chunked), rtol=1e-5)


def test_chunked_ce_grads_match(setup):
    cfg, params, batch = setup
    labels = jnp.asarray(batch["labels"])

    def loss_full(p):
        return causal_lm_loss(vlm.forward_batch(p, cfg, batch), labels)[0]

    def loss_chunked(p):
        h = vlm.forward_batch(p, cfg, batch, return_hidden=True)
        return chunked_causal_lm_loss(h, p["llm"], cfg.llm, labels, 16)[0]

    g1 = jax.grad(loss_full)(params)
    g2 = jax.grad(loss_chunked)(params)
    l1 = jax.tree.leaves(g1)
    l2 = jax.tree.leaves(g2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        )


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------


def test_lora_identity_at_init(setup):
    from vila_tpu.train import lora as lora_lib

    cfg, params, batch = setup
    lcfg = lora_lib.LoRAConfig(rank=4)
    lora = lora_lib.init_lora(jax.random.PRNGKey(1), params["llm"], lcfg)
    merged = lora_lib.apply_lora(params, lora, lcfg)
    out0 = vlm.forward_batch(params, cfg, batch)
    out1 = vlm.forward_batch(merged, cfg, batch)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(out1), atol=1e-5
    )


def test_lora_training_moves_output(setup):
    from vila_tpu.train import lora as lora_lib
    from vila_tpu.train.step import loss_fn

    cfg, params, batch = setup
    lcfg = lora_lib.LoRAConfig(rank=4)
    lora = lora_lib.init_lora(jax.random.PRNGKey(1), params["llm"], lcfg)

    def loss(lr):
        merged = lora_lib.apply_lora(params, lr, lcfg)
        return loss_fn(merged, cfg, batch)[0]

    g = jax.grad(loss)(lora)
    # B starts at 0 => dL/dA == 0, dL/dB != 0 at init
    assert float(jnp.abs(g["q_proj"]["b"]).max()) > 0
    # one SGD step must change the adapted forward
    lora2 = jax.tree.map(lambda x, gg: x - 1.0 * gg, lora, g)
    assert float(loss(lora2)) != float(loss(lora))


def test_dora_identity_at_init(setup):
    from vila_tpu.train import lora as lora_lib

    cfg, params, batch = setup
    lcfg = lora_lib.LoRAConfig(rank=4, use_dora=True)
    lora = lora_lib.init_lora(jax.random.PRNGKey(2), params["llm"], lcfg)
    merged = lora_lib.apply_lora(params, lora, lcfg)
    out0 = vlm.forward_batch(params, cfg, batch)
    out1 = vlm.forward_batch(merged, cfg, batch)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(out1), atol=1e-4
    )


# ---------------------------------------------------------------------------
# FP8
# ---------------------------------------------------------------------------


def test_fp8_quant_roundtrip():
    from vila_tpu.ops import fp8

    x = jax.random.normal(jax.random.PRNGKey(0), (300,), jnp.float32) * 3.0
    q, s, shape = fp8.quantize_blockwise(x, fp8.E4M3, block=128)
    y = fp8.dequantize_blockwise(q, s, shape)
    # e4m3 has ~2 decimal digits; blockwise scaling keeps relative error small
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0.08, atol=0.02)


def test_fp8_linear_close_to_exact():
    from vila_tpu.ops.fp8 import fp8_linear

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (4, 32), jnp.float32)
    w = jax.random.normal(k2, (32, 16), jnp.float32) * 0.1
    y = fp8_linear(x, w)
    ref = x @ w
    err = float(jnp.abs(y - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.1, err


def test_fp8_linear_grads_flow():
    from vila_tpu.ops.fp8 import fp8_linear

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (4, 32), jnp.float32)
    w = jax.random.normal(k2, (32, 16), jnp.float32) * 0.1

    def loss(w):
        return jnp.sum(fp8_linear(x, w) ** 2)

    g = jax.grad(loss)(w)
    g_ref = jax.grad(lambda w: jnp.sum((x @ w) ** 2))(w)
    cos = jnp.sum(g * g_ref) / (
        jnp.linalg.norm(g) * jnp.linalg.norm(g_ref) + 1e-9
    )
    assert float(cos) > 0.99


def test_fp8_model_forward(setup):
    import dataclasses

    cfg, params, batch = setup
    llm8 = dataclasses.replace(cfg.llm, fp8_matmul=True)
    cfg8 = dataclasses.replace(cfg, llm=llm8)
    out8 = vlm.forward_batch(params, cfg8, batch)
    out = vlm.forward_batch(params, cfg, batch)
    # same argmax almost everywhere despite quantization noise
    agree = np.mean(
        np.asarray(out8).argmax(-1) == np.asarray(out).argmax(-1)
    )
    assert agree > 0.9


def test_fp8_adamw_tracks_adamw():
    import optax

    from vila_tpu.train.fp8_adamw import fp8_adamw

    params = {"w": jnp.ones((64, 8)) * 0.5}
    grads = {"w": jax.random.normal(jax.random.PRNGKey(0), (64, 8)) * 0.1}

    opt1 = optax.adamw(1e-2)
    opt2 = fp8_adamw(1e-2)
    s1, s2 = opt1.init(params), opt2.init(params)
    p1, p2 = params, params
    for _ in range(5):
        u1, s1 = opt1.update(grads, s1, p1)
        p1 = optax.apply_updates(p1, u1)
        u2, s2 = opt2.update(grads, s2, p2)
        p2 = optax.apply_updates(p2, u2)
    np.testing.assert_allclose(
        np.asarray(p1["w"]), np.asarray(p2["w"]), atol=5e-3
    )
    # moments actually stored in fp8
    from vila_tpu.ops.fp8 import E4M3

    assert s2[0].mu["w"].q.dtype == E4M3


# ---------------------------------------------------------------------------
# checkpoint manager
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path):
    from vila_tpu.train.checkpoint import CheckpointManager

    state = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4)},
        "step": jnp.asarray(7),
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(7, state)
    mgr.wait()
    assert mgr.latest_step() == 7

    template = jax.tree.map(jnp.zeros_like, state)
    step, restored = mgr.restore_latest(template)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    mgr.close()


def test_preemption_guard_walltime():
    from vila_tpu.train.checkpoint import PreemptionGuard

    g = PreemptionGuard(total_time_limit_s=1000.0, save_margin_s=1000.5)
    assert g.should_stop(0)
    g2 = PreemptionGuard(total_time_limit_s=1000.0, save_margin_s=1.0)
    assert not g2.should_stop(0)


@pytest.mark.slow
def test_fp8_train_step_e2e():
    """FP8 matmul path + FP8-state AdamW compose with FSDP sharding on the
    mesh: the loss curve tracks the bf16/f32 run on a memorization task
    (reference semantics: llava/model/coat/ FP8 training)."""
    import dataclasses

    from vila_tpu.parallel import mesh as mesh_lib
    from vila_tpu.train.optimizer import OptimizerConfig, make_optimizer
    from vila_tpu.train.step import make_sharded_train_step

    rng = np.random.default_rng(7)
    b, s = 4, 32
    batch_np = {
        "input_ids": rng.integers(1, 120, (b, s)).astype(np.int32),
        "labels": rng.integers(1, 120, (b, s)).astype(np.int32),
        "positions": np.broadcast_to(
            np.arange(s, dtype=np.int32), (b, s)
        ).copy(),
        "segment_ids": np.ones((b, s), np.int32),
    }
    mesh = mesh_lib.make_mesh(dp=2, sp=2, tp=2)

    def run(fp8: bool, opt_name: str):
        cfg = tiny_cfg(fp8_matmul=fp8)
        params = vlm.init_params(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(
            OptimizerConfig(
                learning_rate=1e-3, total_steps=20, schedule="constant",
                warmup_ratio=0.0, optimizer=opt_name,
            )
        )
        step, p, st, batch_sh = make_sharded_train_step(
            cfg, params, opt, mesh
        )
        batch = {
            k: jax.device_put(jnp.asarray(v), batch_sh[k])
            for k, v in batch_np.items()
        }
        losses = []
        for _ in range(8):
            p, st, metrics = step(p, st, batch)
            losses.append(float(metrics["loss"]))
        return losses

    ref = run(fp8=False, opt_name="adamw")
    fp8 = run(fp8=True, opt_name="fp8_adamw")
    assert fp8[-1] < fp8[0] - 0.2, fp8
    # curves agree within quantization noise
    for a, b_ in zip(ref, fp8):
        assert abs(a - b_) < 0.35, (ref, fp8)


# ---------------------------------------------------------------------------
# simulated (fake) quantization — QAT research ops
# ---------------------------------------------------------------------------


def test_fake_quant_roundtrip_and_error_ordering():
    import jax
    import jax.numpy as jnp

    from vila_tpu.ops import fake_quant as fq

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 256), jnp.float32)
    for fmt in ("e4m3", "e5m2", "int8", "int4"):
        q = fq.fake_quant(x, fmt)
        assert q.shape == x.shape and q.dtype == x.dtype
        # quantization is idempotent
        np.testing.assert_allclose(
            np.asarray(fq.fake_quant(q, fmt)), np.asarray(q),
            rtol=1e-6, atol=1e-6,
        )
    # precision ordering: int8 < int4 error; e4m3 < int4
    e_int8 = float(fq.quantization_error(x, "int8"))
    e_int4 = float(fq.quantization_error(x, "int4"))
    e_fp8 = float(fq.quantization_error(x, "e4m3"))
    assert e_int8 < e_int4
    assert e_fp8 < e_int4
    assert e_int4 < 0.2  # int4 with 128-groups is still ~sane


def test_fake_quant_straight_through_gradient():
    import jax
    import jax.numpy as jnp

    from vila_tpu.ops import fake_quant as fq

    cfg = fq.FakeQuantConfig(weight_fmt="int4", act_fmt="e4m3")
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64), jnp.float32)

    def loss(w):
        return jnp.sum(fq.fq_linear(x, w, cfg) ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    # STE: gradient magnitude comparable to the unquantized path
    g_ref = jax.grad(lambda w: jnp.sum((x @ w) ** 2))(w)
    ratio = float(jnp.linalg.norm(g) / jnp.linalg.norm(g_ref))
    assert 0.5 < ratio < 2.0, ratio


def test_fake_quant_training_decreases_loss():
    """A tiny fq_linear regression trains under jax.grad (QAT smoke)."""
    import jax
    import jax.numpy as jnp

    from vila_tpu.ops import fake_quant as fq

    cfg = fq.FakeQuantConfig(weight_fmt="int4", act_fmt=None, group_size=16)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (64, 16), jnp.float32)
    y = x @ jax.random.normal(jax.random.PRNGKey(4), (16, 4), jnp.float32)
    w = jnp.zeros((16, 4), jnp.float32)

    @jax.jit
    def step(w):
        def loss(w):
            return jnp.mean((fq.fq_linear(x, w, cfg) - y) ** 2)

        l, g = jax.value_and_grad(loss)(w)
        return w - 0.1 * g, l

    losses = []
    for _ in range(30):
        w, l = step(w)
        losses.append(float(l))
    assert losses[-1] < 0.2 * losses[0]
