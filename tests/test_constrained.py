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
