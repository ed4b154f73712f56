"""CLI wrapper for the NIAH harness (registry task `niah`).

Synthetic mode mirroring scripts/eval/needle.sh's three phases in one run:
haystack embeddings from the model's own vision tower over random frames,
a needle embedding block, teacher-forced retrieval accuracy over the
(context, depth) grid, heatmap-style metrics.json output.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser("vila_tpu.eval.niah_cli")
    p.add_argument("--model-path", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--contexts", type=int, nargs="+", default=[1024, 2048])
    p.add_argument("--depths", type=float, nargs="+",
                   default=[0.0, 0.25, 0.5, 0.75, 1.0])
    p.add_argument("--num-frames", type=int, default=32)
    p.add_argument("--answer", default="the secret word is needle")
    p.add_argument("--sp", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import vila_tpu
    from vila_tpu.eval import niah

    engine = vila_tpu.load(args.model_path)
    cfg = engine.cfg
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    frames = rng.integers(
        0, 255, (args.num_frames, size, size, 3), np.uint8
    )
    haystack = niah.build_haystack_embeddings(engine.params, cfg, frames)
    needle = haystack[:8] * 0 + jnp.asarray(
        rng.normal(size=(8, haystack.shape[-1])).astype(np.float32)
    )
    answer_ids = np.asarray(
        engine.tokenizer(args.answer, add_special_tokens=False).input_ids,
        np.int64,
    )

    mesh = None
    if args.sp > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[: args.sp]), ("sp",))

    results = niah.run_niah(
        engine.params["llm"], cfg.llm, haystack, needle, answer_ids,
        niah.NIAHConfig(context_lengths=args.contexts, depths=args.depths),
        mesh=mesh,
    )
    mean_acc = float(np.mean([r["acc"] for r in results]))
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump({"niah/mean_acc": mean_acc, "niah/grid": results}, f)
    print(json.dumps({"niah/mean_acc": mean_acc}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
