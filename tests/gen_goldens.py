"""Regenerate the committed parity goldens (tests/goldens/*.npz).

Each golden is produced by the TORCH side of scripts/parity_vs_hf.py on a
deterministic seeded tiny checkpoint (tests/helpers.save_tiny_checkpoint),
sliced to the last 8 positions' logits so the files stay a few hundred KB.
tests/test_parity_goldens.py rebuilds the same checkpoints from seed and
runs `parity_vs_hf.py check` against these files — the exact command that
applies unchanged to a real NVILA checkpoint the moment one is reachable
(VERDICT r3 #3).

Run: JAX_PLATFORMS=cpu python tests/gen_goldens.py
(regenerate after a torch version bump changes initializer streams)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import helpers
import parity_vs_hf

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# name -> (save_tiny_checkpoint kwargs). The gqa8b flavor reproduces the
# NVILA-8B LLM's structural signature (7:1 GQA grouping, qkv bias, untied
# lm_head, 152k-class-scale vocab reduced to 8k) at test size.
FLAVORS = {
    "base": dict(hidden_size=128, intermediate_size=256),
    "dynamic_s2": dict(
        hidden_size=128, intermediate_size=256, mm_scales=2,
        top_overrides={
            "dynamic_s2": True,
            "s2_scales": [56, 112],
            "image_aspect_ratio": "dynamic_s2",
            "max_tiles": 12,
        },
    ),
    "video_tsp": dict(
        hidden_size=128, intermediate_size=256,
        top_overrides={
            "video_encoder": {
                "_target_": "llava.model.encoders.TSPVideoEncoder",
                "pool_sizes": [[1, 1, 1], [2, 2, 2]],
            },
        },
    ),
    "gqa8b": dict(
        hidden_size=896, intermediate_size=1536,
        num_attention_heads=14, num_key_value_heads=2, vocab_size=8192,
    ),
}


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, kw in FLAVORS.items():
        with tempfile.TemporaryDirectory() as d:
            helpers.save_tiny_checkpoint(d, seed=0, **kw)
            out = os.path.join(GOLDEN_DIR, f"{name}.npz")
            rc = parity_vs_hf.main([
                "gen-golden", "--ckpt", d, "--out", out,
                "--max-new", "4", "--logit-rows", "8",
            ])
            assert rc == 0, name
            print(f"[goldens] {name}: {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
