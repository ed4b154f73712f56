"""Constrained decoding: JSON / JSON-schema structured output.

Capability parity: the reference's XGrammar-compiled logits processor for
`response_format` (get_xgr_logits_processor, llava/model/llava_arch.py:
802-821; `ResponseFormat` pydantic config, configuration_llava.py:119).

TPU-first split: logits stay on device; the constraint runs on host as a
*re-ranking* step over the top-K candidate tokens per step (the grammar is
inherently sequential, so it lives host-side next to detokenization; K
device->host floats per step, not the full vocab). A JSON pushdown
prefix-validator accepts any token whose bytes keep the text a valid JSON
prefix; a schema subset (object properties with string/number/boolean/enum
types, required key order) narrows it further.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


class JsonPrefixValidator:
    """Checks whether a string is a prefix of some valid JSON value."""

    def is_valid_prefix(self, text: str) -> bool:
        ok, _ = self._scan(text)
        return ok

    def is_complete(self, text: str) -> bool:
        ok, depth = self._scan(text)
        if not ok or depth is None:
            return False
        stripped = text.strip()
        if not stripped:
            return False
        return depth == 0 and not self._in_string(text)

    # -- internals --------------------------------------------------------

    def _in_string(self, text: str) -> bool:
        in_str = False
        esc = False
        for ch in text:
            if esc:
                esc = False
                continue
            if in_str:
                if ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
        return in_str

    def _scan(self, text: str) -> Tuple[bool, Optional[int]]:
        """Single pass pushdown scan. Returns (valid_prefix, depth)."""
        stack: List[str] = []
        in_str = False
        esc = False
        # expect: 'value' | 'key' | 'colon' | 'comma_or_close' | 'done'
        expect = "value"
        i = 0
        n = len(text)
        while i < n:
            ch = text[i]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                    if expect == "key_body":
                        expect = "colon"
                    else:
                        expect = "comma_or_close" if stack else "done"
                i += 1
                continue
            if ch in " \t\n\r":
                i += 1
                continue
            if expect in ("value", "element"):
                if ch == "{":
                    stack.append("}")
                    expect = "first_key"
                elif ch == "[":
                    stack.append("]")
                    expect = "first_element"
                elif ch == '"':
                    in_str = True
                    expect = "str_body"
                elif ch in "-0123456789":
                    j = i
                    while j < n and text[j] in "-+.eE0123456789":
                        j += 1
                    if j == n:
                        return True, len(stack)  # number may continue
                    expect = "comma_or_close" if stack else "done"
                    i = j
                    continue
                elif ch in "tfn":  # true/false/null
                    for lit in ("true", "false", "null"):
                        if lit.startswith(text[i : i + len(lit)]):
                            rest = text[i : i + len(lit)]
                            if lit.startswith(rest):
                                if i + len(lit) > n:
                                    return True, len(stack)
                                if text[i : i + len(lit)] == lit:
                                    expect = (
                                        "comma_or_close" if stack else "done"
                                    )
                                    i += len(lit)
                                    break
                    else:
                        return False, None
                    continue
                else:
                    return False, None
                i += 1
            elif expect == "first_key":
                if ch == '"':
                    in_str = True
                    expect = "key_body"
                elif ch == "}":
                    if not stack or stack.pop() != "}":
                        return False, None
                    expect = "comma_or_close" if stack else "done"
                else:
                    return False, None
                i += 1
            elif expect == "key":
                if ch == '"':
                    in_str = True
                    expect = "key_body"
                else:
                    return False, None
                i += 1
            elif expect == "first_element":
                if ch == "]":
                    if not stack or stack.pop() != "]":
                        return False, None
                    expect = "comma_or_close" if stack else "done"
                    i += 1
                else:
                    expect = "value"
            elif expect == "colon":
                if ch != ":":
                    return False, None
                expect = "value"
                i += 1
            elif expect == "comma_or_close":
                if ch == ",":
                    top = stack[-1] if stack else None
                    expect = "key" if top == "}" else "value"
                    i += 1
                elif ch in "}]":
                    if not stack or stack.pop() != ch:
                        return False, None
                    expect = "comma_or_close" if stack else "done"
                    i += 1
                else:
                    return False, None
            elif expect == "done":
                return False, None  # trailing garbage
            elif expect in ("str_body", "key_body"):
                # unreachable: handled by in_str
                i += 1
            else:
                return False, None
        if in_str or expect in ("str_body", "key_body"):
            return True, len(stack)
        return True, len(stack)


class SchemaGuide:
    """Narrow subset of JSON-schema: top-level object, `properties` with
    {string, number, integer, boolean} or `enum`, keys in declaration
    order when `required`. Guides the key text; values fall back to the
    generic JSON automaton."""

    def __init__(self, schema: Dict[str, Any]) -> None:
        self.schema = schema
        self.properties: List[Tuple[str, Dict[str, Any]]] = list(
            (schema.get("properties") or {}).items()
        )

    def expected_keys(self, text: str) -> Optional[List[str]]:
        """Which object keys may start at the current prefix, if the prefix
        ends inside/at a top-level key position."""
        # count completed top-level keys = number of '"key":' at depth 1
        try:
            done = _count_top_level_keys(text)
        except ValueError:
            return None
        remaining = [k for k, _ in self.properties[done:]]
        return remaining


def _count_top_level_keys(text: str) -> int:
    depth = 0
    in_str = False
    esc = False
    keys = 0
    expecting_key = False
    for ch in text:
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
            if depth == 1 and expecting_key:
                keys += 1
                expecting_key = False
        elif ch == "{":
            depth += 1
            if depth == 1:
                expecting_key = True
        elif ch == "}":
            depth -= 1
        elif ch == "," and depth == 1:
            expecting_key = True
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
    return keys


class JsonConstrainedSampler:
    """Pick the best token whose bytes keep the output a valid JSON prefix.

    Used by GenerationEngine when generation_config.response_format is set
    (reference: generate_content's response_format, llava_arch.py:912-917).
    """

    def __init__(
        self,
        tokenizer,
        schema: Optional[Dict[str, Any]] = None,
        top_k: int = 64,
    ) -> None:
        self.tokenizer = tokenizer
        self.validator = JsonPrefixValidator()
        self.guide = SchemaGuide(schema) if schema else None
        self.top_k = top_k
        self.text = ""
        self._ids: List[int] = []

    def done(self) -> bool:
        return self.validator.is_complete(self.text)

    def pick(self, logits: np.ndarray) -> Optional[int]:
        """logits: (V,) host array. Returns chosen token id or None when the
        JSON value is complete."""
        if self.done():
            return None
        order = np.argsort(logits)[::-1][: self.top_k]
        for tid in order:
            tid = int(tid)
            piece = self.tokenizer.decode(
                self._ids + [tid], skip_special_tokens=True
            )
            if not piece.startswith(self.text):
                continue  # token retro-edits text (special); skip
            if len(piece) <= len(self.text):
                continue  # no text progress (special/byte tokens)
            cand = piece
            if self.validator.is_valid_prefix(cand):
                if self.guide is not None and not self._schema_ok(cand):
                    continue
                self._ids.append(tid)
                self.text = cand
                return tid
        # Nothing valid in top-K: force a structural continuation.
        for forced in ("{", "}", "]", '"', ",", ":", "0"):
            cand = self.text + forced
            if self.validator.is_valid_prefix(cand):
                ids = self.tokenizer(forced, add_special_tokens=False).input_ids
                if ids:
                    self._ids.extend(ids)
                    self.text = self.tokenizer.decode(
                        self._ids, skip_special_tokens=True
                    )
                    return ids[0]
        return None

    def _schema_ok(self, cand: str) -> bool:
        keys = self.guide.expected_keys(cand)
        if keys is None:
            return True
        # If we are mid-key at depth 1, the partial key must prefix an
        # expected key.
        partial = _current_partial_key(cand)
        if partial is None:
            return True
        return any(k.startswith(partial) for k in keys)


def _current_partial_key(text: str) -> Optional[str]:
    """If the prefix ends inside a top-level object key, return its partial
    text, else None."""
    depth = 0
    in_str = False
    esc = False
    expecting_key = False
    buf: Optional[List[str]] = None
    for ch in text:
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
                buf = None
            elif buf is not None:
                buf.append(ch)
        elif ch == '"':
            in_str = True
            if depth == 1 and expecting_key:
                buf = []
                expecting_key = False
        elif ch == "{":
            depth += 1
            if depth == 1:
                expecting_key = True
        elif ch == "}":
            depth -= 1
        elif ch == "," and depth == 1:
            expecting_key = True
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
    if in_str and buf is not None:
        return "".join(buf)
    return None
