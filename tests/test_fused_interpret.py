"""Pallas argument-assembly smoke tests (TPU interpreter, off-chip).

VERDICT r4: a `NameError` inside `fused_layer`'s kernel-argument assembly
survived a green 325-test suite because the off-TPU entry points returned
from their reference-math branch before the `pl.pallas_call` arguments were
ever built. These tests force the entry points THROUGH the argument
assembly into `pl.pallas_call(interpret=pltpu.InterpretParams())` (env
`VILA_TPU_PALLAS_INTERPRET=1`, `ops/fused_decode.py:_use_ref_path`) so
BlockSpecs, out_shapes, scalar-prefetch packing, and kernel kwargs are all
executed on CPU — with simulated DMAs/semaphores — for every megakernel
entry point, and the results must match the reference-math branch.

Reference anchor: the reference has no kernel unit tests at all
(SURVEY.md §4); this guards the TinyChat-parity decode path
(`/root/reference/README.md:87-88`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vila_tpu.models import qwen2
from vila_tpu.ops import quant


def _tiny_cfg(**kw):
    base = dict(
        vocab_size=64,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
        tie_word_embeddings=True,
    )
    base.update(kw)
    return qwen2.LLMConfig(**base)


def _one_decode_step(cfg, qparams, prompt, max_len=32):
    """Prefill `prompt` then run ONE decode step; returns (logits, token)."""
    b = prompt.shape[0]
    cache = qwen2.init_cache(cfg, batch=b, max_len=max_len)
    logits, cache = qwen2.forward(
        qparams, cfg, input_ids=prompt, cache=cache
    )
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    pos = jnp.full((b, 1), prompt.shape[1], jnp.int32)
    logits, cache = qwen2.forward(
        qparams, cfg, input_ids=tok[:, None], positions=pos, cache=cache
    )
    return np.asarray(logits[:, 0], np.float32), np.asarray(tok)


def _compare(monkeypatch, cfg, qparams, prompt):
    monkeypatch.delenv("VILA_TPU_PALLAS_INTERPRET", raising=False)
    ref_logits, ref_tok = _one_decode_step(cfg, qparams, prompt)
    monkeypatch.setenv("VILA_TPU_PALLAS_INTERPRET", "1")
    got_logits, got_tok = _one_decode_step(cfg, qparams, prompt)
    monkeypatch.delenv("VILA_TPU_PALLAS_INTERPRET")
    np.testing.assert_array_equal(ref_tok, got_tok)
    np.testing.assert_allclose(ref_logits, got_logits, atol=3e-2, rtol=0.05)


def test_fused_ab_kernels_through_pallas_interpret(monkeypatch):
    """fused_o_gateup + fused_down_qkv (A/B kernels, unpadded o layout)
    execute their pallas_call argument assembly under the interpreter."""
    cfg = _tiny_cfg()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_llm_params(params, group_size=128, fuse=True)
    monkeypatch.setenv("VILA_TPU_NO_MEGA_DECODE", "1")
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (1, 5)), jnp.int32
    )
    _compare(monkeypatch, cfg, qparams, prompt)


def test_mega_bs1_through_pallas_interpret(monkeypatch):
    """fused_layer (bs=1 megakernel, GQA-padded o layout) executes its
    pallas_call argument assembly — incl. the n_rows kwarg that was the
    r4 NameError — under the interpreter."""
    cfg = _tiny_cfg(num_hidden_layers=3)
    params = qwen2.init_params(jax.random.PRNGKey(1), cfg)
    qparams = quant.quantize_llm_params(params, group_size=128, fuse=True,
                                        cfg=cfg)
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, 64, (1, 5)), jnp.int32
    )
    _compare(monkeypatch, cfg, qparams, prompt)


def test_mega_bs1_live_prefix_kv_blocks_interpret(monkeypatch):
    """bs=1 megakernel with a blocked KV cache (S=512 > 256): the
    live-prefix block skipping (n_live scalar prefetch + tail zeroing)
    runs under simulated DMAs."""
    cfg = _tiny_cfg(num_hidden_layers=2)
    params = qwen2.init_params(jax.random.PRNGKey(2), cfg)
    qparams = quant.quantize_llm_params(params, group_size=128, fuse=True,
                                        cfg=cfg)
    prompt = jnp.asarray(
        np.random.default_rng(2).integers(0, 64, (1, 4)), jnp.int32
    )
    monkeypatch.delenv("VILA_TPU_PALLAS_INTERPRET", raising=False)
    ref_logits, ref_tok = _one_decode_step(cfg, qparams, prompt, max_len=512)
    monkeypatch.setenv("VILA_TPU_PALLAS_INTERPRET", "1")
    got_logits, got_tok = _one_decode_step(cfg, qparams, prompt, max_len=512)
    np.testing.assert_array_equal(ref_tok, got_tok)
    np.testing.assert_allclose(ref_logits, got_logits, atol=3e-2, rtol=0.05)


@pytest.mark.parametrize("b", [3, 9])
def test_mega_batched_through_pallas_interpret(monkeypatch, b):
    """fused_layer_batched executes its argument assembly under the
    interpreter at both kernel row counts (b=3 -> 8 rows, b=9 -> 16)."""
    cfg = _tiny_cfg(num_hidden_layers=2)
    params = qwen2.init_params(jax.random.PRNGKey(3), cfg)
    qparams = quant.quantize_llm_params(params, group_size=128, fuse=True,
                                        cfg=cfg)
    prompt = jnp.asarray(
        np.random.default_rng(3).integers(0, 64, (b, 5)), jnp.int32
    )
    _compare(monkeypatch, cfg, qparams, prompt)
