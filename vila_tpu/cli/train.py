"""`vila-train`: flag-driven training entry.

Capability parity: `train()` + `torchrun train_mem.py` shell recipes
(llava/train/train.py:419, scripts/NVILA-Lite/*.sh) condensed into one CLI.
Stage recipes (align / stage15 / pretrain / sft) differ only in tune flags,
LRs and the data mixture — all exposed as flags here, matching the
reference's stage scripts (README.md:140-183).
"""

from __future__ import annotations

import argparse
import dataclasses

from vila_tpu.train.trainer import TrainArgs


STAGE_PRESETS = {
    # mirror scripts/NVILA-Lite/{align,stage15,pretrain,sft}.sh tune flags
    "align": dict(
        tune_language_model=False,
        tune_vision_tower=False,
        tune_mm_projector=True,
        learning_rate=1e-3,
    ),
    "stage15": dict(
        tune_language_model=False,
        tune_vision_tower=True,
        tune_mm_projector=True,
        learning_rate=5e-5,
    ),
    "pretrain": dict(
        tune_language_model=True,
        tune_vision_tower=False,
        tune_mm_projector=True,
        learning_rate=5e-5,
    ),
    "sft": dict(
        tune_language_model=True,
        tune_vision_tower=True,
        tune_mm_projector=True,
        learning_rate=2e-5,
        vision_tower_lr=2e-6,
    ),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vila-train")
    p.add_argument("--model-path", required=True,
                   help="component checkpoint dir (llm/, vision_tower/, mm_projector/)")
    p.add_argument("--stage", choices=sorted(STAGE_PRESETS), default=None)
    for f in dataclasses.fields(TrainArgs):
        name = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=f.default)
        else:
            p.add_argument(name, type=type(f.default) if f.default is not None else str,
                           default=f.default)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import vila_tpu
    from vila_tpu.data.builder import build_dataset
    from vila_tpu.data.collate import Collator, PackingCollator
    from vila_tpu.entry import build_config, load_params, load_tokenizer
    from vila_tpu.train.trainer import Trainer

    tokenizer = load_tokenizer(args.model_path)
    cfg = build_config(args.model_path)
    params = load_params(args.model_path, cfg)

    kw = {
        f.name: getattr(args, f.name) for f in dataclasses.fields(TrainArgs)
    }
    if args.stage:
        kw.update(STAGE_PRESETS[args.stage])
    targs = TrainArgs(**kw)

    dataset = build_dataset(targs.data_mixture, tokenizer, cfg)
    # zigzag ring layout needs S % (2 * sp * su) == 0
    seq_mult = max(targs.sp * targs.su, 1)
    if targs.sp_attention and targs.ring_layout == "zigzag" and targs.sp > 1:
        seq_mult *= 2
    if targs.pack_rows > 0:
        collator = PackingCollator(
            seq_len=targs.seq_len, rows=targs.pack_rows,
            pad_token_id=tokenizer.pad_token_id or 0,
            seq_multiple=seq_mult,
            tile_size=cfg.vision.image_size,
        )
    else:
        collator = Collator(
            seq_len=targs.seq_len,
            pad_token_id=tokenizer.pad_token_id or 0,
            seq_multiple=seq_mult,
            tile_size=cfg.vision.image_size,
        )
    trainer = Trainer(cfg, params, dataset, collator, targs)
    trainer.train()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
