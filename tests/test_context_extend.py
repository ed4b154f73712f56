"""Context extension: RoPE scaling keeps short-ctx behavior, LoRA trains,
merged model decodes at extended positions."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.models import qwen2
from vila_tpu.train.context_extend import (
    ContextExtendArgs,
    chunk_text_dataset,
    extend_llm,
)


@pytest.fixture(scope="module")
def llm():
    cfg = qwen2.LLMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", max_position_embeddings=64,
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_chunking():
    stream = np.arange(100, dtype=np.int32)
    batches = list(chunk_text_dataset(stream, seq_len=16, batch=2))
    assert all(b.shape == (2, 16) for b in batches)
    assert len(batches) == 3  # 96 tokens used


def test_extend_llm_trains_and_extends(llm):
    params, cfg = llm
    rng = np.random.default_rng(0)
    stream = rng.integers(2, 64, 4096).astype(np.int32)
    args = ContextExtendArgs(
        target_context=256, rope_theta=1e5, lora_rank=4,
        steps=4, seq_len=64, learning_rate=1e-3,
    )
    batches = chunk_text_dataset(stream, seq_len=64, batch=1)
    merged, ext_cfg, losses = extend_llm(params, cfg, batches, args)

    assert len(losses) == 4
    assert ext_cfg.rope_theta == 1e5
    assert ext_cfg.max_position_embeddings == 256

    # merged model runs at a position beyond the original max
    ids = jnp.asarray(rng.integers(2, 64, (1, 200)), jnp.int32)
    logits, _ = qwen2.forward(merged, ext_cfg, input_ids=ids)
    assert np.isfinite(np.asarray(logits)).all()

    # LoRA actually changed the weights
    d = float(
        jnp.abs(
            merged["layers"]["q_proj"]["kernel"]
            - params["layers"]["q_proj"]["kernel"]
        ).max()
    )
    assert d > 0
