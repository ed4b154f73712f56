"""Smoke evaluation task: load model, run text/image generation, check the
pipeline end-to-end. Used by the registry's `regression` tag as the cheapest
always-runnable task."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--mode", choices=["text", "image"], default="text")
    args = parser.parse_args()

    import vila_tpu
    from vila_tpu.inference.generate import GenerationConfig

    engine = vila_tpu.load(args.model_path)
    n_pass, n_total = 0, 0

    prompts = ["Hello!", "What is the capital of France?"]
    if args.mode == "image":
        from PIL import Image as PILImage

        img = PILImage.fromarray(
            np.random.default_rng(0).integers(0, 255, (224, 224, 3), np.uint8)
        )
        prompts = [[vila_tpu.Image(img), p] for p in prompts]

    for p in prompts:
        n_total += 1
        try:
            out = engine.generate_content(p, GenerationConfig(max_new_tokens=16))
            if isinstance(out, str):
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"smoke failure: {e}")

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump({"smoke": {"pass_rate": n_pass / n_total}}, f)
    print(f"smoke: {n_pass}/{n_total} passed")


if __name__ == "__main__":
    main()
