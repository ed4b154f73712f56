"""Quantized-accuracy measurement (VERDICT r3 #2): bf16 vs W4-RTN vs
W4-AWQ on the committed pope-mini fixture, using the trained probe model
(data_prepare/train_quant_probe.py).

Reports, per engine:
  * pope-mini accuracy / F1 (genuine ground truth, the model was trained
    to competence on this task)
  * first-token top-1 agreement and mean |logit diff| vs the bf16 engine
    over all fixture prompts (weight-independent fidelity signal)

Writes QUANT_ACC_r{N}.json at the repo root.

Run: JAX_PLATFORMS=cpu python scripts/quant_acc.py --round 4
(on a TPU host, omit JAX_PLATFORMS to use the real W4 kernels)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def first_token_logits(engine, prep):
    """Full first-token logits through the engine's prefill path."""
    import jax.numpy as jnp

    from vila_tpu.inference.generate import (
        PROMPT_BUCKETS, _bucket, _round_up,
    )
    from vila_tpu.models import qwen2

    cfg = engine.cfg
    ids_np = prep["input_ids"]
    prompt_len = int(ids_np.shape[0])
    s_pad = _bucket(prompt_len, PROMPT_BUCKETS)
    ids = np.zeros((1, s_pad), np.int32)
    ids[0, :prompt_len] = ids_np
    valid = np.zeros((1, s_pad), bool)
    valid[0, :prompt_len] = True
    media_embeds = engine.encode_media(prep["media"])
    mp = np.full((media_embeds.shape[0],), 1 << 30, np.int32)
    mp[: len(prep["media_pos"])] = prep["media_pos"]
    cache = qwen2.init_cache(
        cfg.llm, batch=1, max_len=_round_up(s_pad + 8, 256)
    )
    logits, _ = engine._prefill(
        engine.params, jnp.asarray(ids), jnp.asarray(valid),
        media_embeds, jnp.asarray(mp), cache,
        jnp.asarray([prompt_len - 1], np.int32),
    )
    return np.asarray(logits[0], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument(
        "--model", default=os.path.join(
            REPO, "vila_tpu", "eval", "fixtures", "quant_probe"),
    )
    args = ap.parse_args()

    import jax.numpy as jnp

    from vila_tpu import entry
    from vila_tpu.eval.benchmarks import (
        load_dataset, resolve_dataset, run_benchmark,
    )
    from vila_tpu.inference.generate import GenerationEngine
    from vila_tpu.ops.awq import awq_quantize_llm
    from vila_tpu.ops.quant import quantize_llm_params

    engine = entry.load(args.model)
    cfg, tok = engine.cfg, engine.tokenizer
    bf16_llm = engine.params["llm"]

    # Calibration ids: the fixture questions themselves (text-only walk,
    # same recipe as llm-awq's calibration on a small text corpus).
    ds_path = resolve_dataset("fixture:mini/pope.jsonl")
    dataset = load_dataset(ds_path)
    if args.limit:
        dataset = dataset[: args.limit]
    media_root = os.path.dirname(ds_path)

    calib_texts = [r["question"] for r in dataset[:32]]
    calib = np.zeros((len(calib_texts), 48), np.int32)
    for i, t in enumerate(calib_texts):
        ids = tok(t, add_special_tokens=False).input_ids[:48]
        calib[i, : len(ids)] = ids

    engines = {"bf16": engine}
    engines["w4_rtn"] = GenerationEngine(
        {**engine.params,
         "llm": quantize_llm_params(bf16_llm, bits=4, fuse=True,
                                    cfg=cfg.llm)},
        cfg, tok,
    )
    engines["w4_awq"] = GenerationEngine(
        {**engine.params,
         "llm": awq_quantize_llm(bf16_llm, cfg.llm, jnp.asarray(calib))},
        cfg, tok,
    )

    out = {"task": "pope-mini", "n_examples": len(dataset),
           "model": "trained tiny probe (data_prepare/train_quant_probe.py)"}
    meta_path = os.path.join(args.model, "probe_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out["probe_meta"] = json.load(f)

    # task accuracy per engine
    for name, eng in engines.items():
        r = run_benchmark(eng, "pope", dataset, max_new_tokens=4,
                          media_root=media_root)
        out[name] = {k: round(float(v), 4) for k, v in r["metrics"].items()}
        print(name, out[name], flush=True)

    # logit fidelity vs bf16 on every prompt's first token
    preps = []
    for r in dataset:
        from PIL import Image

        img = Image.open(os.path.join(media_root, r["image"]))
        preps.append(engine.prepare_inputs(
            [img, r["question"] + "\nAnswer the question with yes or no."]))
    ref_logits = [first_token_logits(engines["bf16"], p) for p in preps]
    for name in ("w4_rtn", "w4_awq"):
        agree, l1 = 0, 0.0
        for p, rl in zip(preps, ref_logits):
            ql = first_token_logits(engines[name], p)
            agree += int(np.argmax(ql) == np.argmax(rl))
            l1 += float(np.mean(np.abs(ql - rl)))
        out[name]["first_token_top1_agreement"] = round(
            agree / len(preps), 4)
        out[name]["mean_abs_logit_diff"] = round(l1 / len(preps), 4)
        print(name, "agreement", out[name]["first_token_top1_agreement"],
              flush=True)

    acc = "pope/accuracy"
    out["acc_delta_rtn"] = round(out["bf16"][acc] - out["w4_rtn"][acc], 4)
    out["acc_delta_awq"] = round(out["bf16"][acc] - out["w4_awq"][acc], 4)
    fname = os.path.join(
        REPO,
        f"QUANT_ACC_r{args.round:02d}.json" if args.round
        else "QUANT_ACC.json",
    )
    with open(fname, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", fname)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
