"""Logit parity of the vila_tpu Qwen2 decoder vs HF transformers (torch CPU).

North-star requirement: logit-level fidelity loading HF checkpoints
(BASELINE.json). We test against small random HF models, which exercises the
exact same numerics as a full checkpoint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.models import qwen2
from vila_tpu.utils.hf_import import convert_llm_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_tiny_hf(tie=False, model_type="qwen2"):
    if model_type == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        hf_cfg = Qwen2Config(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=112,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            rope_theta=10000.0,
            tie_word_embeddings=tie,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = Qwen2ForCausalLM(hf_cfg).eval()
    else:
        from transformers import LlamaConfig, LlamaForCausalLM

        hf_cfg = LlamaConfig(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=112,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            rope_theta=10000.0,
            tie_word_embeddings=tie,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = LlamaForCausalLM(hf_cfg).eval()

    cfg = qwen2.LLMConfig.from_hf_config(hf_cfg.to_dict())
    params = convert_llm_state_dict(model.state_dict(), cfg)
    return model, cfg, params


@pytest.mark.parametrize("model_type", ["qwen2", "llama"])
@pytest.mark.parametrize("tie", [False, True])
def test_logit_parity(tie, model_type):
    model, cfg, params = make_tiny_hf(tie=tie, model_type=model_type)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 17))

    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    got = np.asarray(qwen2.forward(params, cfg, input_ids=jnp.asarray(ids))[0])
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-3)
    # Random tiny models have near-tie logits; require high (not perfect)
    # greedy agreement on top of the numeric bound.
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.95


def test_decode_cache_matches_full_forward():
    _, cfg, params = make_tiny_hf()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 12)))

    full, _ = qwen2.forward(params, cfg, input_ids=ids)

    # Prefill first 8 tokens, then decode 4 one at a time.
    cache = qwen2.init_cache(cfg, batch=2, max_len=32)
    logits, cache = qwen2.forward(params, cfg, input_ids=ids[:, :8], cache=cache)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :8]), atol=1e-4, rtol=1e-3
    )
    for t in range(8, 12):
        step_logits, cache = qwen2.forward(
            params, cfg, input_ids=ids[:, t : t + 1], cache=cache
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full[:, t]),
            atol=1e-4,
            rtol=1e-3,
        )


def test_left_padded_decode():
    """Left-padded batch: padding slots must not contribute to attention."""
    _, cfg, params = make_tiny_hf()
    rng = np.random.default_rng(2)
    short = jnp.asarray(rng.integers(1, 128, size=(1, 5)))

    # Unpadded reference.
    full, _ = qwen2.forward(params, cfg, input_ids=short)

    # Same sequence left-padded by 3 junk tokens, marked invalid.
    pad = jnp.zeros((1, 3), jnp.int32)
    padded = jnp.concatenate([pad, short], axis=1)
    token_valid = jnp.asarray([[False] * 3 + [True] * 5])
    positions = jnp.asarray([[0, 0, 0, 0, 1, 2, 3, 4]])

    cache = qwen2.init_cache(cfg, batch=1, max_len=16)
    logits, cache = qwen2.forward(
        params, cfg,
        input_ids=padded,
        positions=positions,
        token_valid=token_valid,
        cache=cache,
    )
    np.testing.assert_allclose(
        np.asarray(logits[:, 3:]), np.asarray(full), atol=1e-4, rtol=1e-3
    )


def test_packed_segments_match_separate():
    """Packing two samples with segment ids == running them separately."""
    _, cfg, params = make_tiny_hf()
    rng = np.random.default_rng(3)
    a = rng.integers(1, 128, size=(1, 6))
    bb = rng.integers(1, 128, size=(1, 4))

    la, _ = qwen2.forward(params, cfg, input_ids=jnp.asarray(a))
    lb, _ = qwen2.forward(params, cfg, input_ids=jnp.asarray(bb))

    packed = jnp.asarray(np.concatenate([a, bb], axis=1))
    seg = jnp.asarray([[1] * 6 + [2] * 4])
    pos = jnp.asarray([list(range(6)) + list(range(4))])
    lp, _ = qwen2.forward(
        params, cfg, input_ids=packed, positions=pos, segment_ids=seg
    )
    np.testing.assert_allclose(
        np.asarray(lp[:, :6]), np.asarray(la), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lp[:, 6:]), np.asarray(lb), atol=1e-4, rtol=1e-3
    )
