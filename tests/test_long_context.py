"""Long-context engine: sequence-sharded KV decode on the 8-device mesh
matches single-device generation (r2 VERDICT next-step #6)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vila_tpu.inference.long_context import LongContextEngine
from vila_tpu.models import qwen2


@pytest.fixture(scope="module")
def llm():
    cfg = qwen2.LLMConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _reference_generate(params, cfg, embeds, max_new, cache_len):
    """Plain single-device greedy decode."""
    cache = qwen2.init_cache(cfg, batch=1, max_len=cache_len)
    s = embeds.shape[1]
    logits, cache = qwen2.forward(
        params, cfg, inputs_embeds=embeds, cache=cache, last_token_only=True
    )
    out = [int(jnp.argmax(logits[0, -1]))]
    tok = jnp.asarray([out[0]], jnp.int32)
    pos = jnp.asarray([s], jnp.int32)
    for _ in range(max_new - 1):
        logits, cache = qwen2.forward(
            params, cfg, input_ids=tok[:, None], positions=pos[:, None],
            cache=cache,
        )
        t = int(jnp.argmax(logits[0, 0]))
        out.append(t)
        tok = jnp.asarray([t], jnp.int32)
        pos = pos + 1
    return out


def test_sharded_generation_matches_single_device(llm):
    cfg, params = llm
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    rng = np.random.default_rng(0)
    s = 700  # not chunk-aligned: exercises the padded tail chunk
    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(1, s, cfg.hidden_size)).astype(np.float32)
    )

    eng = LongContextEngine(
        params, cfg, mesh, max_cache_len=2048, prefill_chunk=256
    )
    got = eng.generate(embeds, max_new_tokens=12)
    ref = _reference_generate(params, cfg, embeds, 12, 2048)
    assert got == ref, (got, ref)


def test_stop_ids_and_multichunk_prefill(llm):
    cfg, params = llm
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(1, 512, cfg.hidden_size)).astype(
            np.float32
        )
    )
    eng = LongContextEngine(
        params, cfg, mesh, max_cache_len=1024, prefill_chunk=128
    )
    full = eng.generate(embeds, max_new_tokens=8)
    # stopping at the second token truncates the output there; stop ids are
    # never emitted — if the first token IS the stop id, output is empty
    # (GenerationEngine.stream_ids semantics)
    stopped = eng.generate(embeds, max_new_tokens=8, stop_ids=[full[1]])
    assert stopped == ([] if full[1] == full[0] else full[:1])
    assert eng.generate(embeds, max_new_tokens=8, stop_ids=[full[0]]) == []


def test_decode_stops_at_cache_capacity(llm):
    """KV writes must never clamp past the cache end: with s + n > cache
    capacity, generation stops exactly at capacity and every produced
    token matches the unconstrained reference prefix (a clamped
    dynamic_update_slice would corrupt the final slot and diverge)."""
    cfg, params = llm
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    rng = np.random.default_rng(2)
    s = 248
    embeds = jnp.asarray(
        rng.normal(scale=0.5, size=(1, s, cfg.hidden_size)).astype(np.float32)
    )
    eng = LongContextEngine(
        params, cfg, mesh, max_cache_len=256, prefill_chunk=128
    )
    # asks for 16 but only 9 fit: the first token needs no KV write (it
    # comes from prefill logits) and the remaining 8 decode steps write
    # rows 248..255 before the cache is full
    got = eng.generate(embeds, max_new_tokens=16, decode_chunk=8)
    assert len(got) == 256 - s + 1
    ref = _reference_generate(params, cfg, embeds, 256 - s + 1, 512)
    assert got == ref, (got, ref)
