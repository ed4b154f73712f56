"""JSON-constrained decoding: prefix validator + end-to-end valid output."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from vila_tpu.inference.constrained import (
    JsonConstrainedSampler,
    JsonPrefixValidator,
    _current_partial_key,
)


@pytest.fixture(scope="module")
def v():
    return JsonPrefixValidator()


VALID_PREFIXES = [
    "", "{", '{"', '{"a', '{"a"', '{"a":', '{"a": 1', '{"a": 1,',
    '{"a": 1, "b"', '{"a": [1, 2', '{"a": {"b": tru', '{"a": "x\\"y',
    "[", "[1", "[1,", '["a", nul', "123", "-1.5e", '"hello', "{}",
    '{"a": 1}', "[1, 2, 3]", "true", '  {"a": 1}  ',
]

INVALID_PREFIXES = [
    "}", "]", '{"a" 1', '{"a"::', "{,", "[,", '{"a": 1,,', "{]",
    '{"a": 1}{', "trux", '{"a": }', "[1 2]", '{1: 2}',
]


@pytest.mark.parametrize("s", VALID_PREFIXES)
def test_valid_prefixes(v, s):
    assert v.is_valid_prefix(s), s


@pytest.mark.parametrize("s", INVALID_PREFIXES)
def test_invalid_prefixes(v, s):
    assert not v.is_valid_prefix(s), s


def test_completeness(v):
    assert v.is_complete('{"a": 1}')
    assert v.is_complete("[1, 2]")
    assert not v.is_complete('{"a": 1')
    assert not v.is_complete("")
    assert not v.is_complete('"open string')


def test_partial_key_extraction():
    assert _current_partial_key('{"na') == "na"
    assert _current_partial_key('{"name": "x", "a') == "a"
    assert _current_partial_key('{"name": "val') is None  # inside value
    assert _current_partial_key('{"name"') is None


def test_constrained_generate_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from helpers import save_tiny_checkpoint

    import vila_tpu
    from vila_tpu.inference.generate import GenerationConfig

    path = str(tmp_path)
    with torch.no_grad():
        save_tiny_checkpoint(path)
    engine = vila_tpu.load(path)

    out = engine.generate_content(
        "give me json",
        GenerationConfig(
            max_new_tokens=48, response_format={"type": "json_object"}
        ),
    )
    # output must be a non-empty valid JSON prefix; with enough steps the
    # sampler closes the value.
    val = JsonPrefixValidator()
    assert out.strip(), "constrained decode produced nothing"
    assert val.is_valid_prefix(out), out


# ---------------------------------------------------------------------------
# Full-vocab grammar masking (r3 VERDICT #5)
# ---------------------------------------------------------------------------

from vila_tpu.inference.constrained import (  # noqa: E402
    JsonAutomaton,
    grammar_token_mask,
)


@pytest.mark.parametrize("s", VALID_PREFIXES)
def test_automaton_accepts_valid_prefixes(s):
    assert JsonAutomaton().run(s) == "ok", s


@pytest.mark.parametrize("s", INVALID_PREFIXES)
def test_automaton_rejects_invalid_prefixes(s):
    assert JsonAutomaton().run(s) == "reject", s


def test_automaton_agrees_with_validator_fuzz(v):
    """Randomized agreement: incremental automaton == batch validator."""
    rng = np.random.default_rng(0)
    alphabet = list('{}[]",:.\\ 019-aetrunlfsx"')
    for _ in range(500):
        n = int(rng.integers(0, 12))
        s = "".join(rng.choice(alphabet) for _ in range(n))
        got = JsonAutomaton().run(s) == "ok"
        want = v.is_valid_prefix(s)
        assert got == want, (s, got, want)


def test_grammar_mask_soundness(v):
    """The mask may keep junk (exact check drops it) but must NEVER reject
    a token the exact validator accepts — for every reachable state."""
    from helpers import make_tiny_tokenizer
    from vila_tpu.data.tokenizer_utils import add_media_tokens

    tok = make_tiny_tokenizer()
    add_media_tokens(tok)
    vsz = len(tok)
    pieces = [tok.decode([i], skip_special_tokens=True) for i in range(vsz)]
    for text in VALID_PREFIXES:
        a = JsonAutomaton()
        assert a.run(text) == "ok"
        mask = grammar_token_mask(tok, a)
        for tid in range(vsz):
            piece = pieces[tid]
            if not piece:
                continue
            if v.is_valid_prefix(text + piece):
                assert mask[tid], (text, tid, repr(piece))


def test_schema_token_outside_topk_still_emitted():
    """r3 VERDICT #5 acceptance: the schema-legal token sits OUTSIDE the
    top-K=32 window under adversarial logits, and generation still emits
    the exact schema."""
    from helpers import make_tiny_tokenizer

    tok = make_tiny_tokenizer()
    schema = {
        "type": "object",
        "properties": {"zq": {"type": "integer"}},
        "required": ["zq"],
    }
    sampler = JsonConstrainedSampler(tok, schema, top_k=32)
    vsz = len(tok)
    rng = np.random.default_rng(1)

    target = '{"zq": 0}'
    steps = 0
    out = []
    while not sampler.done() and steps < 64:
        logits = np.asarray(rng.normal(0, 1, (vsz,)), np.float32)
        # adversarial: every token that could advance THIS sampler gets a
        # strongly negative score, so ALL legal tokens rank below the 32
        # highest-scoring (illegal) ones; among the legal ones, tokens on
        # the target string rank best so the walk terminates
        val = JsonPrefixValidator()
        for tid in range(vsz):
            piece = tok.decode(
                sampler._ids + [tid], skip_special_tokens=True
            )
            if (
                piece.startswith(sampler.text)
                and len(piece) > len(sampler.text)
                and val.is_valid_prefix(piece)
            ):
                on_target = target.startswith(piece)
                logits[tid] = (-100.0 if on_target else -200.0) - rng.random()
        n_legal = int((logits < -50).sum())
        if vsz - n_legal >= 32:
            # enough illegal tokens to fill the whole top-32 window: every
            # legal token really is outside it
            assert np.sort(logits)[-32:].min() > -50
        tid = sampler.pick(logits)
        assert tid is not None, (sampler.text, steps)
        out.append(tid)
        steps += 1

    assert sampler.done(), sampler.text
    parsed = json.loads(sampler.text)
    assert set(parsed.keys()) == {"zq"}, sampler.text
    # decoded ids reproduce the sampler's text exactly (no _ids desync)
    assert tok.decode(out, skip_special_tokens=True) == sampler.text
