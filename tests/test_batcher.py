"""Continuous batching: per-slot cache cursors, vectorized sampling params,
and the scheduler end-to-end vs the serial engine."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vila_tpu.inference.generate import GenerationConfig, sample_token
from vila_tpu.models import qwen2


@pytest.fixture(scope="module")
def tiny_llm():
    cfg = qwen2.LLMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_vector_fill_matches_scalar(tiny_llm):
    """Same fill for every row: vector-fill forward == scalar-fill forward."""
    cfg, params = tiny_llm
    b, s, max_len = 2, 4, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, 128)

    c_s = qwen2.init_cache(cfg, b, max_len)
    c_v = qwen2.init_cache(cfg, b, max_len, per_slot_fill=True)
    lg_s, c_s = qwen2.forward(params, cfg, input_ids=ids, cache=c_s)
    lg_v, c_v = qwen2.forward(params, cfg, input_ids=ids, cache=c_v)
    np.testing.assert_allclose(np.asarray(lg_s), np.asarray(lg_v),
                               rtol=2e-5, atol=2e-5)
    assert c_v["fill"].shape == (b,) and int(c_v["fill"][0]) == s
    np.testing.assert_array_equal(np.asarray(c_s["k"]), np.asarray(c_v["k"]))

    tok = jnp.asarray([[3], [7]], jnp.int32)
    lg_s2, _ = qwen2.forward(params, cfg, input_ids=tok, cache=c_s)
    lg_v2, _ = qwen2.forward(params, cfg, input_ids=tok, cache=c_v)
    np.testing.assert_allclose(np.asarray(lg_s2), np.asarray(lg_v2),
                               rtol=2e-5, atol=2e-5)


def test_staggered_fill_rows_independent(tiny_llm):
    """Two rows at different depths decode exactly like two bs=1 runs."""
    cfg, params = tiny_llm
    max_len = 16
    p1 = jax.random.randint(jax.random.PRNGKey(2), (1, 3), 0, 128)
    p2 = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0, 128)

    # serial references
    refs = []
    for p in (p1, p2):
        c = qwen2.init_cache(cfg, 1, max_len)
        lg, c = qwen2.forward(params, cfg, input_ids=p, cache=c)
        toks = [int(jnp.argmax(lg[0, -1]))]
        for i in range(3):
            lg, c = qwen2.forward(
                params, cfg,
                input_ids=jnp.asarray([[toks[-1]]], jnp.int32),
                positions=jnp.asarray([[p.shape[1] + i]], jnp.int32),
                cache=c,
            )
            toks.append(int(jnp.argmax(lg[0, -1])))
        refs.append(toks)

    # batched: prefill each into its own bs=1 cache, splice rows together
    batch = qwen2.init_cache(cfg, 2, max_len, per_slot_fill=True)
    first = []
    for i, p in enumerate((p1, p2)):
        c1 = qwen2.init_cache(cfg, 1, max_len)
        lg, c1 = qwen2.forward(params, cfg, input_ids=p, cache=c1)
        first.append(int(jnp.argmax(lg[0, -1])))
        batch = {
            "k": batch["k"].at[:, i].set(c1["k"][:, 0]),
            "v": batch["v"].at[:, i].set(c1["v"][:, 0]),
            "valid": batch["valid"].at[i].set(c1["valid"][0]),
            "fill": batch["fill"].at[i].set(c1["fill"]),
        }

    toks = [first]
    pos = np.asarray([p1.shape[1], p2.shape[1]], np.int32)
    cur = np.asarray(first, np.int32)
    for i in range(3):
        lg, batch = qwen2.forward(
            params, cfg,
            input_ids=jnp.asarray(cur)[:, None],
            positions=jnp.asarray(pos)[:, None],
            cache=batch,
        )
        cur = np.asarray(jnp.argmax(lg[:, 0], -1), np.int32)
        pos += 1
        toks.append(list(cur))
    got = np.asarray(toks).T  # (2, 4)
    assert list(got[0]) == refs[0]
    assert list(got[1]) == refs[1]


def test_sample_token_vector_params():
    logits = jnp.asarray(
        [[0.0, 10.0, 0.0, 0.0], [8.0, 0.0, 0.0, 0.0]], jnp.float32
    )
    rng = jax.random.PRNGKey(0)
    # per-row temperature: 0 -> greedy on both rows regardless of rng
    tok = sample_token(
        logits, rng, True,
        np.asarray([0.0, 0.0], np.float32),
        np.asarray([1.0, 1.0], np.float32),
        np.asarray([0, 0], np.int32),
    )
    assert list(np.asarray(tok)) == [1, 0]
    # hot rows with top_k=1 always pick the max
    tok = sample_token(
        logits, rng, True,
        np.asarray([5.0, 5.0], np.float32),
        np.asarray([1.0, 1.0], np.float32),
        np.asarray([1, 1], np.int32),
    )
    assert list(np.asarray(tok)) == [1, 0]
    # scalar params still work
    tok = sample_token(logits, rng, True, 0.0, 1.0, 0)
    assert list(np.asarray(tok)) == [1, 0]


# ---------------------------------------------------------------------------
# scheduler end-to-end vs the serial engine
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import helpers
    import vila_tpu

    tmp = tmp_path_factory.mktemp("ckpt")
    helpers.save_tiny_checkpoint(str(tmp))
    return vila_tpu.load(str(tmp))


def test_batcher_matches_serial_engine(engine):
    from vila_tpu.serving.batcher import ContinuousBatcher

    gc = GenerationConfig(max_new_tokens=6, do_sample=False)
    prompts = ["hello world", "the quick brown fox", "abc"]
    serial = [engine.generate_content(p, gc) for p in prompts]

    batcher = ContinuousBatcher(engine, max_batch=2, max_len=1024)
    try:
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(3) as ex:
            got = list(ex.map(
                lambda p: batcher.generate_content(p, gc), prompts
            ))
    finally:
        batcher.shutdown()
    assert got == serial


def test_batcher_mixed_configs_and_reuse(engine):
    """Different max_new_tokens per request; slots are reused after release."""
    from vila_tpu.serving.batcher import ContinuousBatcher

    batcher = ContinuousBatcher(engine, max_batch=1, max_len=1024)
    try:
        a = batcher.generate_content(
            "one two three", GenerationConfig(max_new_tokens=3,
                                              do_sample=False))
        b = batcher.generate_content(
            "four five", GenerationConfig(max_new_tokens=5, do_sample=False))
        ref_a = engine.generate_content(
            "one two three", GenerationConfig(max_new_tokens=3,
                                              do_sample=False))
        ref_b = engine.generate_content(
            "four five", GenerationConfig(max_new_tokens=5, do_sample=False))
        assert a == ref_a and b == ref_b
    finally:
        batcher.shutdown()


def test_batcher_streaming(engine):
    from vila_tpu.serving.batcher import ContinuousBatcher

    batcher = ContinuousBatcher(engine, max_batch=2, max_len=1024)
    try:
        gc = GenerationConfig(max_new_tokens=4, do_sample=False)
        deltas = list(batcher.generate_content_stream("stream me", gc))
        assert "".join(deltas).strip() == engine.generate_content(
            "stream me", gc)
    finally:
        batcher.shutdown()


def test_batcher_stress_mixed_sampling(engine):
    """Six concurrent requests on two slots, mixing greedy and sampled
    configs: all complete, greedy ones match the serial engine exactly."""
    import concurrent.futures as cf

    from vila_tpu.serving.batcher import ContinuousBatcher

    prompts = ["alpha beta", "gamma", "delta epsilon zeta", "eta",
               "theta iota", "kappa"]
    configs = [
        GenerationConfig(max_new_tokens=4, do_sample=False),
        GenerationConfig(max_new_tokens=2, do_sample=True, temperature=0.9,
                         top_p=0.9, top_k=5),
        GenerationConfig(max_new_tokens=6, do_sample=False),
        GenerationConfig(max_new_tokens=3, do_sample=True, temperature=1.3),
        GenerationConfig(max_new_tokens=5, do_sample=False),
        GenerationConfig(max_new_tokens=1, do_sample=False),
    ]
    serial = {
        i: engine.generate_content(p, g)
        for i, (p, g) in enumerate(zip(prompts, configs))
        if not g.do_sample
    }
    batcher = ContinuousBatcher(engine, max_batch=2, max_len=1024)
    try:
        with cf.ThreadPoolExecutor(6) as ex:
            futs = [
                ex.submit(batcher.generate_content, p, g)
                for p, g in zip(prompts, configs)
            ]
            got = [f.result(timeout=600) for f in futs]
    finally:
        batcher.shutdown()
    for i, ref in serial.items():
        assert got[i] == ref, (i, got[i], ref)
    for i, g in enumerate(configs):
        assert isinstance(got[i], str)


def test_batcher_constrained_falls_back_to_serial(engine):
    from vila_tpu.serving.batcher import ContinuousBatcher

    schema = {"type": "object", "properties": {"a": {"type": "string"}}}
    gc = GenerationConfig(
        max_new_tokens=16, do_sample=False,
        response_format={"type": "json_schema", "json_schema": schema},
    )
    batcher = ContinuousBatcher(engine, max_batch=2, max_len=1024)
    try:
        out = batcher.generate_content("make json", gc)
    finally:
        batcher.shutdown()
    ref = engine.generate_content("make json", gc)
    assert out == ref


def test_batcher_rejects_overlong_prompt(engine):
    from vila_tpu.serving.batcher import ContinuousBatcher

    batcher = ContinuousBatcher(engine, max_batch=1, max_len=128)
    try:
        with pytest.raises(ValueError, match="exceeds batcher max_len"):
            list(batcher.stream_ids(
                "word " * 400, GenerationConfig(max_new_tokens=2)))
    finally:
        batcher.shutdown()


def test_batcher_chunked_prefill_matches_serial(engine):
    """Long prompts prefill in chunks on the admission worker (r2 weak
    #10); output must equal the serial engine exactly."""
    from vila_tpu.serving.batcher import ContinuousBatcher

    gc = GenerationConfig(max_new_tokens=5, do_sample=False)
    prompt = "word " * 200  # > one 128-token chunk after tokenization
    serial = engine.generate_content(prompt, gc)

    batcher = ContinuousBatcher(
        engine, max_batch=2, max_len=1024, prefill_chunk=128
    )
    try:
        got = batcher.generate_content(prompt, gc)
        # short prompt takes the single-shot path in the same batcher
        short = batcher.generate_content("hi there", gc)
    finally:
        batcher.shutdown()
    assert got == serial
    assert short == engine.generate_content("hi there", gc)


@pytest.mark.slow
def test_batcher_decode_past_prompt_bucket_gap(engine):
    """Fill-cursor regression (batcher side): with max_len equal to the
    prompt's PADDED bucket, decode must keep writing KV rows after the
    pad gap — a cursor left at s_pad would silently drop every write
    (mode="drop") while slot.position still passed the capacity check.
    Covers both the single-shot and chunked admission paths."""
    from vila_tpu.inference.generate import PROMPT_BUCKETS, _bucket
    from vila_tpu.serving.batcher import ContinuousBatcher

    text = "the quick brown fox jumps over the lazy dog " * 4
    inputs = engine.prepare_inputs([text])
    prompt_len = int(inputs["input_ids"].shape[0])
    s_pad = _bucket(prompt_len, PROMPT_BUCKETS)
    assert s_pad - prompt_len > 5, (prompt_len, s_pad)

    gc = GenerationConfig(max_new_tokens=s_pad - prompt_len, do_sample=False)
    serial = engine.generate_content(text, gc)
    for chunk in (None, 64):
        batcher = ContinuousBatcher(
            engine, max_batch=1, max_len=s_pad, prefill_chunk=chunk
        )
        try:
            got = batcher.generate_content(text, gc)
        finally:
            batcher.shutdown()
        assert got == serial, f"prefill_chunk={chunk}"
