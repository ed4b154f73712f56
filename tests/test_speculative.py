"""Prompt-lookup speculative decoding (inference/speculative.py).

The load-bearing property is GREEDY EXACTNESS: for do_sample=False the
speculative loop must emit the bit-identical token stream of the vanilla
one-token-per-forward loop, for any acceptance pattern. Rejected drafts
pollute cache slots past the accepted prefix; these tests cover the three
hazards: (a) in-loop reads of polluted slots, (b) handoff of a polluted
cache to a later vanilla width-1 decode, (c) the engine-level plumbing
(padded prefill, RoPE-position/fill split, chunking, stop tokens).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.inference.speculative import build_spec_decode, init_history
from vila_tpu.models import qwen2


def tiny_cfg(vocab=128):
    return qwen2.LLMConfig(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )


def vanilla_greedy(params, cfg, prompt, n, max_len):
    """Reference: unpadded prefill + one-token greedy loop."""
    cache = qwen2.init_cache(cfg, batch=1, max_len=max_len)
    logits, cache = qwen2.forward(
        params, cfg, input_ids=jnp.asarray(prompt[None]), cache=cache
    )
    toks = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(n - 1):
        logits, cache = qwen2.forward(
            params, cfg,
            input_ids=jnp.asarray([[toks[-1]]], jnp.int32),
            cache=cache,
        )
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks


def repetitive_prompt(rng, vocab, n=24):
    """A prompt with a repeated motif so 2-gram lookup has material."""
    motif = rng.integers(2, vocab, 6)
    filler = rng.integers(2, vocab, n - 2 * len(motif))
    return np.concatenate([motif, filler, motif]).astype(np.int32)


@pytest.mark.timeout(300)
def test_spec_matches_vanilla_greedy_and_accepts():
    """Exactness on every seed; acceptance (fewer forwards than tokens)
    on at least one — random tiny models under greedy argmax enter short
    cycles, which prompt lookup then drafts correctly."""
    cfg = tiny_cfg()
    spec = build_spec_decode(cfg)
    n_new, gamma = 40, 3
    any_accepted = False
    for seed in range(3):
        params = qwen2.init_params(jax.random.PRNGKey(seed), cfg)
        prompt = repetitive_prompt(np.random.default_rng(seed), 128)
        max_len = len(prompt) + n_new + gamma + 2
        want = vanilla_greedy(params, cfg, prompt, n_new, max_len)

        cache = qwen2.init_cache(cfg, batch=1, max_len=max_len)
        logits, cache = qwen2.forward(
            params, cfg, input_ids=jnp.asarray(prompt[None]), cache=cache
        )
        first = int(jnp.argmax(logits[0, -1]))
        hist, hlen = init_history(prompt, first, max_len + 2 * gamma)
        out, out_len, *_, iters = spec(
            params,
            jnp.asarray([first], jnp.int32),
            jnp.asarray([int(prompt[-1])], jnp.int32),
            jnp.asarray(len(prompt), jnp.int32),
            cache, hist, hlen,
            max_out=n_new - 1, gamma=gamma,
        )
        got = [first] + np.asarray(out)[: n_new - 1].tolist()
        assert int(out_len) >= n_new - 1, (seed, int(out_len))
        assert got == want, (seed, got, want)
        if int(iters) < n_new - 1:
            any_accepted = True
    assert any_accepted, "no seed ever accepted a draft"


@pytest.mark.timeout(300)
def test_spec_then_vanilla_continuation():
    """A width-1 vanilla decode continuing from a speculative chunk must
    match pure vanilla — proves the exit-time valid-mask hygiene (stale
    rejected-draft slots must be invisible to later steps)."""
    cfg = tiny_cfg()
    spec = build_spec_decode(cfg)
    params = qwen2.init_params(jax.random.PRNGKey(7), cfg)
    prompt = repetitive_prompt(np.random.default_rng(7), 128)
    gamma, n_spec, n_vanilla = 4, 8, 8
    # the spec chunk may overshoot n_spec by up to gamma emitted tokens,
    # so budget the reference stream (and the cache) for the worst case
    max_len = len(prompt) + n_spec + n_vanilla + 2 * gamma + 4
    want = vanilla_greedy(
        params, cfg, prompt, 1 + n_spec + gamma + n_vanilla, max_len
    )

    cache = qwen2.init_cache(cfg, batch=1, max_len=max_len)
    logits, cache = qwen2.forward(
        params, cfg, input_ids=jnp.asarray(prompt[None]), cache=cache
    )
    first = int(jnp.argmax(logits[0, -1]))
    hist, hlen = init_history(prompt, first, max_len + 2 * gamma)
    out, out_len, cur, prev, pos, cache, hist, hlen, _ = spec(
        params,
        jnp.asarray([first], jnp.int32),
        jnp.asarray([int(prompt[-1])], jnp.int32),
        jnp.asarray(len(prompt), jnp.int32),
        cache, hist, hlen,
        max_out=n_spec, gamma=gamma,
    )
    got = [first] + np.asarray(out)[: int(out_len)].tolist()
    # continue vanilla from the speculative handoff state
    cur_t = int(np.asarray(cur)[0])
    # the spec chunk may have overshot n_spec by up to gamma — the handoff
    # token is the LAST emitted one, so compare against vanilla from there
    for _ in range(n_vanilla):
        logits, cache = qwen2.forward(
            params, cfg,
            input_ids=jnp.asarray([[cur_t]], jnp.int32),
            positions=np.asarray(pos)[None, None],
            cache=cache,
        )
        cur_t = int(jnp.argmax(logits[0, -1]))
        got.append(cur_t)
        pos = pos + 1
    assert got == want[: len(got)], (got, want[: len(got)])


@pytest.mark.timeout(300)
def test_spec_respects_cache_capacity():
    """With < gamma+1 free slots the loop must stop (not clamp-and-corrupt
    the dynamic_update_slice), returning a short out_len."""
    cfg = tiny_cfg()
    spec = build_spec_decode(cfg)
    params = qwen2.init_params(jax.random.PRNGKey(3), cfg)
    prompt = repetitive_prompt(np.random.default_rng(3), 128)
    gamma = 3
    budget = 6  # free slots after prefill
    max_len = len(prompt) + budget
    cache = qwen2.init_cache(cfg, batch=1, max_len=max_len)
    logits, cache = qwen2.forward(
        params, cfg, input_ids=jnp.asarray(prompt[None]), cache=cache
    )
    first = int(jnp.argmax(logits[0, -1]))
    hist, hlen = init_history(prompt, first, max_len + 2 * gamma)
    out, out_len, *_ = spec(
        params,
        jnp.asarray([first], jnp.int32),
        jnp.asarray([int(prompt[-1])], jnp.int32),
        jnp.asarray(len(prompt), jnp.int32),
        cache, hist, hlen,
        max_out=32, gamma=gamma,
    )
    # every iteration needs gamma+1 slots; emitted count can never exceed
    # the free budget
    assert int(out_len) <= budget
    want = vanilla_greedy(params, cfg, prompt, 1 + int(out_len), max_len)
    assert [first] + np.asarray(out)[: int(out_len)].tolist() == want


@pytest.mark.timeout(600)
def test_engine_lookup_gamma_greedy_exact():
    """Engine plumbing: padded prefill, position/fill split, chunked spec
    loop, stop tokens — generate_ids must be identical with and without
    lookup_gamma."""
    import helpers
    from vila_tpu.data.tokenizer_utils import add_media_tokens
    from vila_tpu.inference.generate import (
        GenerationConfig, GenerationEngine,
    )
    from vila_tpu.models import projector, siglip, vlm

    tok = helpers.make_tiny_tokenizer()
    add_media_tokens(tok)
    llm = qwen2.LLMConfig(
        vocab_size=len(tok), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    vis = siglip.SigLIPConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    proj = projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=24, hidden_size=32
    )
    cfg = vlm.VLMConfig(llm=llm, vision=vis, projector=proj)
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    engine = GenerationEngine(params, cfg, tok)

    inputs = engine.prepare_inputs(
        "the quick brown fox jumps over the lazy dog; "
        "the quick brown fox jumps again"
    )
    base = engine.generate_ids(inputs, GenerationConfig(max_new_tokens=24))
    for gamma in (2, 4):
        spec = engine.generate_ids(
            inputs,
            GenerationConfig(max_new_tokens=24, lookup_gamma=gamma),
        )
        assert spec == base, (gamma, spec, base)
