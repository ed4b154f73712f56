"""AWQ activation-aware quantization: search, folding invariance, accuracy.

Reference pointer: the reference deploys W4 through mit-han-lab/llm-awq
(README.md:245-255); vila_tpu/ops/awq.py implements the search natively.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vila_tpu.models import qwen2
from vila_tpu.ops import awq, quant


def tiny_cfg(**kw):
    d = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
    )
    d.update(kw)
    return qwen2.LLMConfig(**d)


def test_search_beats_rtn_on_outlier_channels():
    """The motivating AWQ case: a few activation channels carry large
    magnitudes; plain RTN wastes int4 range on them."""
    key = jax.random.PRNGKey(0)
    din, dout, m = 256, 128, 64
    kw, kx = jax.random.split(key)
    w = jax.random.normal(kw, (din, dout)) * 0.05
    x = jax.random.normal(kx, (m, din))
    # outlier channels: 4 channels x50 activation magnitude
    x = x.at[:, :4].multiply(50.0)

    g = awq.fit_group(din)
    ref = x @ w
    wq_rtn = awq._rtn_dequant(w, g)
    rtn_loss = float(jnp.sum((x @ wq_rtn - ref) ** 2))

    s, loss = awq.search_awq_scales(w, x, group_size=g)
    awq_loss = float(loss)
    assert awq_loss <= rtn_loss  # alpha=0 is in the grid
    assert awq_loss < 0.7 * rtn_loss, (awq_loss, rtn_loss)
    # applying the scales reproduces the searched loss
    wq = awq._rtn_dequant(w * s[:, None], g)
    applied = float(jnp.sum(((x / s) @ wq - ref) ** 2))
    assert applied == pytest.approx(awq_loss, rel=1e-5)


def test_calibration_walk_matches_forward():
    """collect_act_stats re-walks the decoder; its final hidden must match
    qwen2.forward(return_hidden=True) — pins the duplicate walk."""
    cfg = tiny_cfg()
    params = qwen2.init_params(jax.random.PRNGKey(1), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 256)
    stats = awq.collect_act_stats(params, cfg, ids)
    h_ref, _ = qwen2.forward(params, cfg, input_ids=ids, return_hidden=True)
    np.testing.assert_allclose(
        np.asarray(stats["hidden"], np.float32),
        np.asarray(h_ref, np.float32),
        rtol=2e-5, atol=2e-5,
    )
    L = cfg.num_hidden_layers
    assert stats["qkv"].shape == (L, 32, cfg.hidden_size)
    assert stats["down"].shape == (L, 32, cfg.intermediate_size)
    assert stats["o"].shape == (
        L, 32, cfg.num_attention_heads * cfg.head_dim_
    )


def test_fold_is_forward_invariant():
    """apply_awq rescales in exactly-cancelling pairs: the UNquantized
    model's logits must be unchanged (f32, tight tolerance)."""
    cfg = tiny_cfg()
    params = qwen2.init_params(jax.random.PRNGKey(3), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0, 256)
    stats = awq.collect_act_stats(params, cfg, ids)
    folded_layers = awq.apply_awq(params, cfg, stats, n_grid=6)
    logits_ref, _ = qwen2.forward(params, cfg, input_ids=ids)
    logits_awq, _ = qwen2.forward(folded_layers, cfg, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(logits_awq, np.float32),
        np.asarray(logits_ref, np.float32),
        rtol=1e-3, atol=1e-3,
    )


def test_awq_quantize_llm_end_to_end():
    """awq_quantize_llm produces a loadable W4 tree whose forward tracks
    the bf16 model, and (on an outlier-activation model) tracks it at
    least as well as plain RTN quantization."""
    cfg = tiny_cfg()
    params = qwen2.init_params(jax.random.PRNGKey(5), cfg)
    # inject activation outliers: scale a few embedding channels up and
    # the corresponding q/k/v weight rows down — bf16 forward unchanged
    # in distribution, but RTN int4 now wastes range on those channels
    emb = params["embed_tokens"]["embedding"]
    params["embed_tokens"]["embedding"] = emb.at[:, :4].multiply(30.0)
    for n in ("q_proj", "k_proj", "v_proj"):
        kk = params["layers"][n]["kernel"]
        params["layers"][n]["kernel"] = kk.at[:, :4, :].multiply(1 / 30.0)

    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 16), 0, 256)
    logits_ref, _ = qwen2.forward(params, cfg, input_ids=ids)

    q_rtn = quant.quantize_llm_params(params, cfg=cfg)
    q_awq = awq.awq_quantize_llm(params, cfg, ids, n_grid=8)
    assert "qkv_proj" in q_awq["layers"]  # fused layout preserved

    logits_rtn, _ = qwen2.forward(q_rtn, cfg, input_ids=ids)
    logits_awq, _ = qwen2.forward(q_awq, cfg, input_ids=ids)
    err_rtn = float(jnp.mean((logits_rtn - logits_ref) ** 2))
    err_awq = float(jnp.mean((logits_awq - logits_ref) ** 2))
    # AWQ must not be worse; with injected outliers it should win clearly
    assert err_awq <= err_rtn * 1.05, (err_awq, err_rtn)
    assert err_awq < float(jnp.mean(logits_ref**2))  # sane output
