#!/usr/bin/env python
"""One-command fidelity harness: vila_tpu vs the HF/torch reference stack
on a real NVILA component checkpoint (llm/ vision_tower/ mm_projector/ —
llava/model/llava_arch.py:158-204).

The torch side is composed from stock transformers classes (Qwen2/Llama
causal LM, SigLIP/CLIP vision model) plus a faithful torch replica of the
reference projector nn.Sequential (multimodal_projector/base_projector.py),
the reference's media-embedding splice (`_embed`, llava_arch.py:412-490),
the dynamic-S2 chessboard merge (llava_arch.py:256-394) and TSP video
pooling (encoders/video/tsp.py). Both sides consume identical
host-preprocessed inputs (tiles + expanded token ids from vila_tpu's
GenerationEngine), so the comparison isolates model numerics.

The PROMPT SUITE adapts to the checkpoint's config: text-only,
single-image, and multi-image always; the single-image entry exercises
dynamic-S2 when the checkpoint config enables it; a video entry is added
for TSP-video checkpoints. (VERDICT r3 #3: goldens cover every
BASELINE.json config shape.)

Subcommands
-----------
logits    run BOTH sides in one process; report fp32 max|Δlogit|, mean,
          top-1 agreement per suite entry, plus greedy transcripts.
          `--w4` additionally quantizes the LLM with quantize_llm_params
          (TinyChat-parity W4A16) and reports the bf16→W4 delta.
gen-golden  run ONLY the torch side; save a .npz golden fixture (inputs +
          fp32 logits + greedy continuation). `--logit-rows N` stores only
          the last N positions' logits — committed goldens stay small.
check     run ONLY the vila_tpu side against a golden .npz (no torch
          needed); exits non-zero if --assert-max-abs is exceeded. `--w4`
          also reports the W4 engine's transcript vs the golden.

Examples
--------
  python scripts/parity_vs_hf.py logits --ckpt /path/NVILA-Lite-2B \
      --image demo.jpg --out parity_report.json --w4
  python scripts/parity_vs_hf.py gen-golden --ckpt ... --out golden.npz \
      --logit-rows 8
  python scripts/parity_vs_hf.py check --ckpt ... --golden golden.npz \
      --assert-max-abs 5e-2 --w4
"""

from __future__ import annotations

import argparse
import json
import math
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


def _synth(shape, seed):
    return np.random.default_rng(seed).integers(0, 255, shape, np.uint8)


def build_prompt_suite(engine, image_path=None):
    """Config-adaptive {name: inputs} through the engine's host pipeline.

    With a dynamic-S2 checkpoint the single_image entry takes the S2 path;
    with a TSP checkpoint a video entry is added — so `check` covers every
    media path the checkpoint can serve."""
    from vila_tpu.media import Image, Video

    cfg = engine.cfg
    img = Image(image_path) if image_path else Image(_synth((336, 448, 3), 0))
    img2 = Image(_synth((280, 400, 3), 1))
    suite = {
        "text_only": engine.prepare_inputs("What is the capital of France?"),
        "single_image": engine.prepare_inputs(
            [img, "Describe this image in detail."]
        ),
        "multi_image": engine.prepare_inputs(
            [img, "and", img2, "Compare these two images."]
        ),
    }
    if cfg.video_encoder == "tsp":
        frames = [
            _synth((200, 300, 3), 10 + i) for i in range(cfg.num_video_frames)
        ]
        suite["video"] = engine.prepare_inputs(
            [Video(frames), "Describe the video."]
        )
    return suite


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


def _torch_tower(models, cfg, tiles_u8):
    """uint8 tiles -> (N, T, C) fp32 selected tower features."""
    import torch

    _, vt, _ = models
    mean = np.asarray(_vis_cfg(cfg).image_mean, np.float32) * 255.0
    std = np.asarray(_vis_cfg(cfg).image_std, np.float32) * 255.0
    px = (tiles_u8.astype(np.float32) - mean) / std
    px = torch.tensor(px.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out = vt(px, output_hidden_states=True)
    h = out.hidden_states[cfg.vision_feature_layer]
    if cfg.vision_select == "patch" and cfg.vision_tower_type in (
        "clip", "internvit", "radio",
    ):
        h = h[:, 1:]  # drop CLS (vision_encoder.py:44-52)
    return h.float()


def _vis_cfg(cfg):
    return cfg.vision.vit if cfg.vision_tower_type == "ps3" else cfg.vision


def _merge_grid_np(tiles: np.ndarray, gh: int, gw: int) -> np.ndarray:
    n, t, c = tiles.shape
    side = int(round(math.sqrt(t)))
    x = tiles.reshape(gh, gw, side, side, c).transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * side, gw * side, c)


def _split_grid_np(fmap: np.ndarray, gh: int, gw: int) -> np.ndarray:
    h, w, c = fmap.shape
    th, tw = h // gh, w // gw
    x = fmap.reshape(gh, th, gw, tw, c).transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * gw, th * tw, c)


def _area_resize_np(fmap: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """torch F.interpolate(mode='area') as row/col averaging matrices."""
    from vila_tpu.models.s2 import _adaptive_avg_matrix

    h, w, _ = fmap.shape
    x = fmap.astype(np.float32)
    if h != oh:
        x = np.einsum("oh,hwc->owc", _adaptive_avg_matrix(h, oh), x)
    if w != ow:
        x = np.einsum("ow,hwc->hoc", _adaptive_avg_matrix(w, ow), x)
    return x


def torch_media_feats(models, cfg, entries) -> np.ndarray:
    """Torch replica of engine.encode_media over heterogeneous entries:
    plain tiles, dynamic-S2 merge (llava_arch.py:256-394), TSP pooling
    (encoders/video/tsp.py). Returns flat (M, llm_hidden) fp32."""
    import torch

    _, _, proj = models
    parts = []
    for e in entries:
        if e["kind"] == "plain":
            h = _torch_tower(models, cfg, e["tiles"])
            with torch.no_grad():
                f = proj(h)
            parts.append(f.reshape(-1, f.shape[-1]).numpy())
        elif e["kind"] == "s2":
            h = _torch_tower(models, cfg, e["tiles"]).numpy()
            from vila_tpu.models.s2 import _scale_grids, output_block_size

            grids = _scale_grids(cfg)
            maps, idx = [], 0
            for n in grids[:-1]:
                maps.append(_merge_grid_np(h[idx: idx + n * n], n, n))
                idx += n * n
            bh, bw = e["block_size"]
            maps.append(_merge_grid_np(h[idx: idx + bh * bw], bh, bw))
            oi = cfg.s2_resize_output_to_scale_idx
            th_, tw_ = maps[oi].shape[0], maps[oi].shape[1]
            merged = np.concatenate(
                [_area_resize_np(m, th_, tw_) for m in maps], axis=-1
            )
            obh, obw = output_block_size(cfg, e["block_size"])
            tile_feats = _split_grid_np(merged, obh, obw)
            with torch.no_grad():
                f = proj(torch.tensor(tile_feats)).numpy()
            out_map = _merge_grid_np(f, obh, obw)
            parts.append(out_map.reshape(-1, out_map.shape[-1]))
        elif e["kind"] == "tsp":
            h = _torch_tower(models, cfg, e["tiles"])
            with torch.no_grad():
                f = proj(h).numpy()  # (T, S, H)
            t, s, d = f.shape
            nl = int(round(s ** 0.5))
            for (pt, ph, pw) in e["pool_sizes"]:
                x = f.reshape(t // pt, pt, nl // ph, ph, nl // pw, pw, d)
                x = x.mean(axis=(1, 3, 5))
                parts.append(x.reshape(-1, d))
        else:
            raise NotImplementedError(f"torch replica for {e['kind']!r}")
    return np.concatenate(parts) if parts else None


def torch_logits(models, cfg, inputs):
    """fp32 logits (S, V): the reference `_embed` splice in torch."""
    import torch

    llm, _, _ = models
    ids = torch.tensor(np.asarray(inputs["input_ids"], np.int64)[None])
    emb = llm.get_input_embeddings()(ids).float()  # (1, S, D)

    media_pos = np.asarray(inputs["media_pos"], np.int64)
    if len(media_pos):
        flat = torch_media_feats(models, cfg, inputs["media"])
        emb[0, media_pos] = torch.tensor(flat[: len(media_pos)])

    with torch.no_grad():
        logits = llm(inputs_embeds=emb).logits
    return logits[0].float().numpy()


def torch_greedy(models, cfg, inputs, max_new: int, stop_ids):
    """Greedy continuation via repeated full forwards (reference-exact)."""
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


def _rows_for(n_rows: int, limit: int) -> np.ndarray:
    if not limit or limit >= n_rows:
        return np.arange(n_rows)
    return np.arange(n_rows - limit, n_rows)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("logits", "gen-golden", "check"):
        p = sub.add_parser(name)
        p.add_argument("--ckpt", required=True)
        p.add_argument("--image", default=None)
        p.add_argument("--out", default=None)
        p.add_argument("--max-new", type=int, default=16)
        if name in ("logits", "check"):
            p.add_argument("--w4", action="store_true")
        if name == "gen-golden":
            p.add_argument(
                "--logit-rows", type=int, default=0,
                help="store only the last N positions' logits (0 = all); "
                "committed goldens use 8 to stay small",
            )
        if name == "check":
            p.add_argument("--golden", required=True)
            p.add_argument("--assert-max-abs", type=float, default=None)
    args = ap.parse_args(argv)

    engine = load_vila(args.ckpt, dtype="float32")
    suite = build_prompt_suite(engine, args.image)
    greedy_entry = "single_image"

    if args.cmd == "gen-golden":
        models = load_torch(args.ckpt, engine.cfg)
        stop = set(engine.stop_token_ids)
        fix = {"suite": np.asarray(sorted(suite), "U32")}
        for name, inputs in suite.items():
            lg = torch_logits(models, engine.cfg, inputs)
            rows = _rows_for(lg.shape[0], args.logit_rows)
            fix[f"{name}__ids"] = np.asarray(inputs["input_ids"], np.int32)
            fix[f"{name}__rows"] = rows.astype(np.int32)
            fix[f"{name}__logits"] = lg[rows]
        fix["greedy_ids"] = np.asarray(
            torch_greedy(models, engine.cfg, suite[greedy_entry],
                         args.max_new, stop),
            np.int32,
        )
        out = args.out or "golden.npz"
        np.savez_compressed(out, **fix)
        print(f"[parity] golden fixture written to {out} "
              f"({os.path.getsize(out)} bytes, suite={sorted(suite)})")
        return 0

    if args.cmd == "check":
        fix = np.load(args.golden)
        golden_suite = [str(s) for s in fix["suite"]]
        report = {}
        worst = 0.0
        for name in golden_suite:
            if name not in suite:
                report[name] = "MISSING from this checkpoint's suite"
                worst = float("inf")
                continue
            inputs = suite[name]
            # identical prompts are rebuilt host-side; verify they match
            # the fixture so the comparison is apples-to-apples
            assert np.array_equal(
                np.asarray(inputs["input_ids"], np.int32),
                fix[f"{name}__ids"],
            ), f"{name}: tokenization/expansion drifted vs fixture"
            lg = vila_logits(engine, inputs)[fix[f"{name}__rows"]]
            report[name] = compare(lg, fix[f"{name}__logits"])
            worst = max(worst, report[name]["max_abs"])
        ids, text = vila_generate(engine, suite[greedy_entry], args.max_new)
        gold = list(fix["greedy_ids"])
        report["greedy_match_vs_golden"] = bool(
            list(ids[: len(gold)]) == gold[: len(ids)]
        )
        report["vila_transcript"] = text
        if args.w4:
            qengine = quantize_engine(engine)
            q_ids, q_text = vila_generate(
                qengine, suite[greedy_entry], args.max_new
            )
            report["w4"] = {
                "transcript": q_text,
                "greedy_match_vs_golden": bool(
                    list(q_ids[: len(gold)]) == gold[: len(q_ids)]
                ),
                "vs_bf16": compare(
                    vila_logits(qengine, suite[greedy_entry])[
                        fix[f"{greedy_entry}__rows"]
                    ],
                    vila_logits(engine, suite[greedy_entry])[
                        fix[f"{greedy_entry}__rows"]
                    ],
                ),
            }
        print(json.dumps(report, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
        if args.assert_max_abs is not None and worst > args.assert_max_abs:
            print(f"[parity] FAIL max|Δlogit| {worst} > {args.assert_max_abs}")
            return 1
        return 0

    # logits: both sides in one process
    models = load_torch(args.ckpt, engine.cfg)
    stop = set(engine.stop_token_ids)
    report = {}
    for name, inputs in suite.items():
        report[name] = compare(
            vila_logits(engine, inputs), torch_logits(models, engine.cfg, inputs)
        )

    ids, text = vila_generate(engine, suite[greedy_entry], args.max_new)
    hf_ids = torch_greedy(
        models, engine.cfg, suite[greedy_entry], args.max_new, stop
    )
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
        vl_img = vila_logits(engine, suite[greedy_entry])
        qengine = quantize_engine(engine)
        q_img = vila_logits(qengine, suite[greedy_entry])
        report["w4_vs_bf16"] = compare(q_img, vl_img)
        q_ids, q_text = vila_generate(qengine, suite[greedy_entry], args.max_new)
        report["w4_vs_bf16"]["greedy_match"] = q_ids == ids
        report["w4_vs_bf16"]["w4_transcript"] = q_text

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
