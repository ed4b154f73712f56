"""Real-benchmark evaluators: scoring math, prompt building, MC parsing,
registry wiring, and the lmms-eval wrapper (standalone mode)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from vila_tpu.eval import benchmarks as B


# ---------------------------------------------------------------------------
# scoring primitives
# ---------------------------------------------------------------------------


def test_vqa_normalize():
    assert B.vqa_normalize("The Cat.") == "cat"
    assert B.vqa_normalize("two") == "2"
    assert B.vqa_normalize("1,000") == "1000"
    assert B.vqa_normalize("dont") == "don't"


def test_vqa_accuracy_official_formula():
    humans = ["cat"] * 3 + ["dog"] * 7
    assert B.vqa_accuracy("cat", humans) == 1.0  # 3 matches / 3
    assert B.vqa_accuracy("dog", humans) == 1.0
    humans = ["cat", "dog", "dog", "dog", "bird"] + ["fish"] * 5
    assert B.vqa_accuracy("cat", humans) == pytest.approx(1 / 3)
    assert B.vqa_accuracy("zebra", humans) == 0.0


def test_parse_choice():
    choices = ["red", "green", "blue"]
    assert B.parse_choice("B", choices) == "B"
    assert B.parse_choice("(C) blue", choices) == "C"
    assert B.parse_choice("The answer is A.", choices) == "A"
    assert B.parse_choice("I think it's green", choices) == "B"
    assert B.parse_choice("no idea", choices) is None
    # letters beyond the choice list don't parse
    assert B.parse_choice("D", choices) is None


def test_format_mc_prompt():
    p = B.format_mc_prompt("What color?", ["red", "green"])
    assert "A. red" in p and "B. green" in p
    assert "letter" in p


# ---------------------------------------------------------------------------
# end-to-end over a fake engine (prompting + aggregation)
# ---------------------------------------------------------------------------


class FakeEngine:
    """Answers by looking up a canned table keyed on the question text."""

    def __init__(self, table):
        self.table = table
        self.prompts = []

    def generate_content(self, prompt, gen=None):
        self.prompts.append(prompt)
        text = prompt[-1]
        for key, ans in self.table.items():
            if key in text:
                return ans
        return "unknown"


def test_run_textvqa():
    ds = [
        {"image": None, "question": "what is shown",
         "answers": ["cat"] * 10},
        {"image": None, "question": "how many",
         "answers": ["two"] * 5 + ["three"] * 5},
    ]
    eng = FakeEngine({"what is shown": "a cat", "how many": "2"})
    out = B.run_benchmark(eng, "textvqa", ds)
    assert out["metrics"]["textvqa/accuracy"] == 1.0
    # short-answer instruction appended
    assert "single word or phrase" in eng.prompts[0][-1]


def test_run_scienceqa_and_gqa():
    ds = [{"image": None, "question": "pick one",
           "choices": ["apple", "pear"], "answer": 1}]
    eng = FakeEngine({"pick one": "B. pear"})
    out = B.run_benchmark(eng, "scienceqa", ds)
    assert out["metrics"]["scienceqa/accuracy"] == 1.0

    ds = [{"image": None, "question": "what fruit", "answer": "the apple"}]
    eng = FakeEngine({"what fruit": "Apple."})
    out = B.run_benchmark(eng, "gqa", ds)
    assert out["metrics"]["gqa/accuracy"] == 1.0


def test_run_pope_f1():
    ds = [
        {"image": None, "question": "is there a dog", "answer": "yes"},
        {"image": None, "question": "is there a cat", "answer": "no"},
        {"image": None, "question": "is there a car", "answer": "yes"},
    ]
    eng = FakeEngine({
        "dog": "Yes, there is.", "cat": "yes", "car": "No.",
    })
    out = B.run_benchmark(eng, "pope", ds)
    m = out["metrics"]
    # tp=1 (dog), fp=1 (cat), fn=1 (car)
    assert m["pope/accuracy"] == pytest.approx(1 / 3)
    assert m["pope/precision"] == pytest.approx(0.5)
    assert m["pope/recall"] == pytest.approx(0.5)
    assert m["pope/f1"] == pytest.approx(0.5)


def test_run_videomme():
    ds = [{"video": None, "question": "what happens",
           "choices": ["runs", "sits", "eats", "sleeps"], "answer": "C"}]
    eng = FakeEngine({"what happens": "C"})
    out = B.run_benchmark(eng, "videomme", ds)
    assert out["metrics"]["videomme/accuracy"] == 1.0


def test_registry_has_real_benchmarks():
    from vila_tpu.cli.eval import load_registry

    reg = load_registry()
    for task in ("textvqa", "gqa", "scienceqa", "pope", "videomme"):
        assert task in reg, task
        assert "benchmark" in reg[task]["tags"]
        assert "accuracy" in reg[task]["metrics"]


# ---------------------------------------------------------------------------
# lmms-eval wrapper (standalone mode)
# ---------------------------------------------------------------------------


def test_lmms_wrapper_generate_until(monkeypatch, tmp_path):
    import vila_tpu
    from vila_tpu.eval.lmms import VILA

    eng = FakeEngine({"describe": "a scene"})
    monkeypatch.setattr(vila_tpu, "load", lambda path, **kw: eng)
    model = VILA(model_path="dummy", cache_dir=str(tmp_path))
    reqs = [{"context": "describe this", "media": [],
             "gen_kwargs": {"max_new_tokens": 8}}]
    out = model.generate_until(reqs)
    assert out == ["a scene"]
    # second call hits the response cache, not the engine
    n_before = len(eng.prompts)
    out2 = model.generate_until(reqs)
    assert out2 == ["a scene"]
    assert len(eng.prompts) == n_before
    assert any(f.endswith(".json") for f in os.listdir(tmp_path))


def test_run_refcoco_iou():
    ds = [{"image": None, "question": "find the dog",
           "answer": [0.1, 0.1, 0.5, 0.5]}]
    eng = FakeEngine({"find the dog": "The box is [0.1, 0.1, 0.5, 0.5]."})
    out = B.run_benchmark(eng, "refcoco", ds)
    assert out["metrics"]["refcoco/accuracy"] == 1.0
    assert out["metrics"]["refcoco/mean_iou"] == pytest.approx(1.0)

    eng = FakeEngine({"find the dog": "[0.6, 0.6, 0.9, 0.9]"})
    out = B.run_benchmark(eng, "refcoco", ds)
    assert out["metrics"]["refcoco/accuracy"] == 0.0


def test_run_mathvista_numeric():
    ds = [{"image": None, "question": "what is 2+2", "answer": 4}]
    eng = FakeEngine({"2+2": "The answer is 4."})
    out = B.run_benchmark(eng, "mathvista", ds)
    assert out["metrics"]["mathvista/accuracy"] == 1.0
    # MC records route through the scienceqa scorer
    ds = [{"image": None, "question": "pick", "choices": ["1", "2"],
           "answer": 1}]
    eng = FakeEngine({"pick": "B"})
    out = B.run_benchmark(eng, "mathvista", ds)
    assert out["metrics"]["mathvista/accuracy"] == 1.0


def test_box_and_number_parsers():
    assert B.parse_box("no box here") is None
    assert B.parse_box("at [0.2,0.3, 0.4 ,0.5] roughly") == [0.2, 0.3, 0.4, 0.5]
    assert B.box_iou([0, 0, 1, 1], [0, 0, 1, 1]) == 1.0
    assert B.box_iou([0, 0, 1, 1], [1, 1, 2, 2]) == 0.0
    assert B.extract_number("first 3 then 4.5") == 4.5
    assert B.extract_number("1,234 items") == 1234.0
    assert B.extract_number("none") is None
