#!/usr/bin/env python
"""One-command fidelity harness: vila_tpu vs the HF/torch reference stack
on a real NVILA component checkpoint (llm/ vision_tower/ mm_projector/ —
llava/model/llava_arch.py:158-204).

The torch side is composed from stock transformers classes (Qwen2/Llama
causal LM, SigLIP/CLIP vision model) plus a faithful torch replica of the
reference projector nn.Sequential (multimodal_projector/base_projector.py)
and the reference's media-embedding splice (`_embed`,
llava_arch.py:412-490). Both sides consume identical host-preprocessed
inputs (tiles + expanded token ids from vila_tpu's GenerationEngine), so
the comparison isolates model numerics.

Subcommands
-----------
logits    run BOTH sides in one process; report fp32 max|Δlogit|, mean,
          top-1 agreement for a text-only and a single-image prompt, plus
          greedy transcripts. `--w4` additionally quantizes the LLM with
          quantize_llm_params (TinyChat-parity W4A16) and reports the
          bf16→W4 logit/top-1 delta and transcript.
gen-golden  run ONLY the torch side; save a .npz golden fixture (inputs +
          fp32 logits + greedy continuation). Run this on any machine
          where the checkpoint + torch exist.
check     run ONLY the vila_tpu side against a golden .npz (no torch
          needed); exits non-zero if --assert-max-abs is exceeded.

Examples
--------
  python scripts/parity_vs_hf.py logits --ckpt /path/NVILA-Lite-2B \
      --image demo.jpg --out parity_report.json --w4
  python scripts/parity_vs_hf.py gen-golden --ckpt ... --out golden.npz
  python scripts/parity_vs_hf.py check --ckpt ... --golden golden.npz \
      --assert-max-abs 5e-2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# vila_tpu side
# ---------------------------------------------------------------------------


def load_vila(ckpt: str, dtype: str = "float32"):
    import vila_tpu

    return vila_tpu.load(ckpt, dtype=dtype)


def build_prompt_inputs(engine, image_path):
    """(text_only_inputs, image_inputs) via the engine's host pipeline."""
    from vila_tpu.media import Image

    text_prompt = "What is the capital of France?"
    img_prompt_text = "Describe this image in detail."
    text_inputs = engine.prepare_inputs(text_prompt)
    if image_path:
        img = Image(image_path)
    else:  # deterministic synthetic image (driver hosts have no assets)
        rng = np.random.default_rng(0)
        img = Image(rng.integers(0, 255, (336, 448, 3), np.uint8))
    image_inputs = engine.prepare_inputs([img, img_prompt_text])
    return text_inputs, image_inputs


def vila_logits(engine, inputs):
    """fp32 logits (S, V) over the expanded prompt, plus greedy ids."""
    import jax.numpy as jnp

    from vila_tpu.models import qwen2, vlm

    params, cfg = engine.params, engine.cfg
    ids = np.asarray(inputs["input_ids"], np.int32)[None]
    embeds = qwen2.embed_tokens(params["llm"], cfg.llm, jnp.asarray(ids))
    media_embeds = engine.encode_media(inputs["media"])
    if media_embeds is not None:
        mp = np.full((media_embeds.shape[0],), 1 << 30, np.int32)
        mp[: len(inputs["media_pos"])] = inputs["media_pos"]
        embeds = vlm.splice_media(embeds, media_embeds, jnp.asarray(mp))
    logits, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=embeds)
    return np.asarray(logits[0], np.float32)


def vila_generate(engine, inputs, max_new: int):
    from vila_tpu.inference.generate import GenerationConfig

    ids = engine.generate_ids(
        inputs, GenerationConfig(max_new_tokens=max_new)
    )
    return ids, engine.tokenizer.decode(ids, skip_special_tokens=True)


def quantize_engine(engine):
    """Return a copy of the engine whose LLM runs the W4A16 decode path."""
    import copy

    from vila_tpu.ops.quant import quantize_llm_params

    q = copy.copy(engine)
    qparams = dict(engine.params)
    qparams["llm"] = quantize_llm_params(
        engine.params["llm"], bits=4, cfg=engine.cfg.llm
    )
    q.params = qparams
    # cached jitted closures capture params only via arguments; but the
    # cached_property closures capture cfg — clear them to be safe
    for name in ("_prefill", "_decode", "_decode_one"):
        q.__dict__.pop(name, None)
    return q


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------


def _torch_projector(proj_dir: str, proj_cfg):
    """Torch replica of the reference projector nn.Sequential
    (base_projector.py:140-225). Reuses the single-source `VILAProjector`
    from the HF export module so the parity harness and the exported
    remote code cannot silently diverge (tests/test_projector_parity.py
    keeps its own independent oracle)."""
    from vila_tpu.export.modeling_vila import VILAProjector
    from vila_tpu.models import projector as projector_lib

    proj = VILAProjector(projector_lib.build_spec(proj_cfg))

    from safetensors.torch import load_file
    import glob

    sd = {}
    for f in sorted(glob.glob(os.path.join(proj_dir, "*.safetensors"))):
        sd.update(load_file(f))
    remapped = {}
    for k, v in sd.items():
        k = k.removeprefix("mm_projector.")
        if not k.startswith("layers."):
            k = "layers." + k
        remapped[k] = v
    proj.load_state_dict(remapped)
    return proj.float().eval()


def load_torch(ckpt: str, cfg):
    """(llm, vision_tower, projector) torch models for the checkpoint."""
    import torch
    from transformers import AutoModelForCausalLM

    llm = AutoModelForCausalLM.from_pretrained(
        os.path.join(ckpt, "llm"),
        torch_dtype=torch.float32,
        attn_implementation="eager",
    ).eval()

    vt_dir = os.path.join(ckpt, "vision_tower")
    if cfg.vision_tower_type == "clip":
        from transformers import CLIPVisionModel

        vt = CLIPVisionModel.from_pretrained(vt_dir, torch_dtype=torch.float32)
    else:
        from transformers import SiglipVisionModel

        vt = SiglipVisionModel.from_pretrained(
            vt_dir, torch_dtype=torch.float32,
            attn_implementation="eager",
        )
    vt = vt.eval()
    proj = _torch_projector(os.path.join(ckpt, "mm_projector"), cfg.projector)
    return llm, vt, proj


def torch_logits(models, cfg, inputs):
    """fp32 logits (S, V): the reference `_embed` splice in torch."""
    import torch

    llm, vt, proj = models
    ids = torch.tensor(np.asarray(inputs["input_ids"], np.int64)[None])
    emb = llm.get_input_embeddings()(ids).float()  # (1, S, D)

    media_pos = np.asarray(inputs["media_pos"], np.int64)
    if len(media_pos):
        tiles = np.concatenate(
            [e["tiles"] for e in inputs["media"]]
        )  # (N, H, W, 3) uint8
        mean = np.asarray(cfg.vision.image_mean, np.float32) * 255.0
        std = np.asarray(cfg.vision.image_std, np.float32) * 255.0
        px = (tiles.astype(np.float32) - mean) / std
        px = torch.tensor(px.transpose(0, 3, 1, 2))
        with torch.no_grad():
            out = vt(px, output_hidden_states=True)
            h = out.hidden_states[cfg.vision_feature_layer]
            if cfg.vision_select == "patch" and cfg.vision_tower_type in (
                "clip", "internvit", "radio",
            ):
                h = h[:, 1:]  # drop CLS (vision_encoder.py:44-52)
            feats = proj(h.float())  # (N, T, D)
        flat = feats.reshape(-1, feats.shape[-1])
        emb[0, media_pos] = flat[: len(media_pos)]

    with torch.no_grad():
        logits = llm(inputs_embeds=emb).logits
    return logits[0].float().numpy()


def torch_greedy(models, cfg, inputs, max_new: int, stop_ids):
    """Greedy continuation via repeated full forwards (reference-exact)."""
    import torch

    out = []
    cur = dict(inputs)
    for _ in range(max_new):
        lg = torch_logits(models, cfg, cur)
        t = int(np.argmax(lg[-1]))
        if t in stop_ids:
            break
        out.append(t)
        cur = dict(cur)
        cur["input_ids"] = np.concatenate(
            [np.asarray(cur["input_ids"], np.int32), [t]]
        )
    return out


# ---------------------------------------------------------------------------
# comparison / report
# ---------------------------------------------------------------------------


def compare(a: np.ndarray, b: np.ndarray):
    d = np.abs(a - b)
    return {
        "max_abs": float(d.max()),
        "mean_abs": float(d.mean()),
        "top1_agreement": float(
            (np.argmax(a, -1) == np.argmax(b, -1)).mean()
        ),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("logits", "gen-golden", "check"):
        p = sub.add_parser(name)
        p.add_argument("--ckpt", required=True)
        p.add_argument("--image", default=None)
        p.add_argument("--out", default=None)
        p.add_argument("--max-new", type=int, default=16)
        if name == "logits":
            p.add_argument("--w4", action="store_true")
        if name == "check":
            p.add_argument("--golden", required=True)
            p.add_argument("--assert-max-abs", type=float, default=None)
    args = ap.parse_args(argv)

    if args.cmd in ("logits", "check"):
        engine = load_vila(args.ckpt, dtype="float32")
        text_inputs, image_inputs = build_prompt_inputs(engine, args.image)

    if args.cmd == "gen-golden":
        # torch side needs the config + host preprocessing, but not JAX
        # numerics; the engine is still the cheapest way to get identical
        # inputs. (It only runs JAX if you call generate.)
        engine = load_vila(args.ckpt, dtype="float32")
        text_inputs, image_inputs = build_prompt_inputs(engine, args.image)
        models = load_torch(args.ckpt, engine.cfg)
        stop = set(engine.stop_token_ids)
        fix = {
            "text_ids": np.asarray(text_inputs["input_ids"], np.int32),
            "text_logits": torch_logits(models, engine.cfg, text_inputs),
            "img_ids": np.asarray(image_inputs["input_ids"], np.int32),
            "img_media_pos": np.asarray(image_inputs["media_pos"], np.int32),
            "img_tiles": np.concatenate(
                [e["tiles"] for e in image_inputs["media"]]
            ),
            "img_logits": torch_logits(models, engine.cfg, image_inputs),
            "img_greedy": np.asarray(
                torch_greedy(models, engine.cfg, image_inputs,
                             args.max_new, stop),
                np.int32,
            ),
        }
        out = args.out or "golden.npz"
        np.savez_compressed(out, **fix)
        print(f"[parity] golden fixture written to {out}")
        return 0

    if args.cmd == "check":
        fix = np.load(args.golden)
        # identical prompts are rebuilt host-side; verify they match the
        # fixture so the logit comparison is apples-to-apples
        assert np.array_equal(
            np.asarray(text_inputs["input_ids"], np.int32), fix["text_ids"]
        ), "text tokenization drifted vs fixture"
        assert np.array_equal(
            np.asarray(image_inputs["input_ids"], np.int32), fix["img_ids"]
        ), "image prompt expansion drifted vs fixture"
        report = {
            "text_only": compare(
                vila_logits(engine, text_inputs), fix["text_logits"]
            ),
            "single_image": compare(
                vila_logits(engine, image_inputs), fix["img_logits"]
            ),
        }
        ids, text = vila_generate(engine, image_inputs, args.max_new)
        report["greedy_match_vs_golden"] = bool(
            list(ids[: len(fix["img_greedy"])])
            == list(fix["img_greedy"][: len(ids)])
        )
        report["vila_transcript"] = text
        print(json.dumps(report, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
        if args.assert_max_abs is not None:
            worst = max(
                report["text_only"]["max_abs"],
                report["single_image"]["max_abs"],
            )
            if worst > args.assert_max_abs:
                print(
                    f"[parity] FAIL max|Δlogit| {worst} > {args.assert_max_abs}"
                )
                return 1
        return 0

    # logits: both sides in one process
    models = load_torch(args.ckpt, engine.cfg)
    stop = set(engine.stop_token_ids)
    report = {}
    vl_text = vila_logits(engine, text_inputs)
    th_text = torch_logits(models, engine.cfg, text_inputs)
    report["text_only"] = compare(vl_text, th_text)
    vl_img = vila_logits(engine, image_inputs)
    th_img = torch_logits(models, engine.cfg, image_inputs)
    report["single_image"] = compare(vl_img, th_img)

    ids, text = vila_generate(engine, image_inputs, args.max_new)
    hf_ids = torch_greedy(models, engine.cfg, image_inputs, args.max_new, stop)
    report["greedy"] = {
        "vila_ids": ids,
        "hf_ids": hf_ids,
        "match": ids == hf_ids,
        "vila_transcript": text,
        "hf_transcript": engine.tokenizer.decode(
            hf_ids, skip_special_tokens=True
        ),
    }

    if args.w4:
        qengine = quantize_engine(engine)
        q_img = vila_logits(qengine, image_inputs)
        report["w4_vs_bf16"] = compare(q_img, vl_img)
        q_ids, q_text = vila_generate(qengine, image_inputs, args.max_new)
        report["w4_vs_bf16"]["greedy_match"] = q_ids == ids
        report["w4_vs_bf16"]["w4_transcript"] = q_text

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
