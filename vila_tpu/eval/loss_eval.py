"""Loss regression eval: deterministic CE on a fixed synthetic batch.

Capability parity: the reference's `--debug_e2e` loss-curve comparison
(llava/train/args.py:281-284, llava_trainer.py:849-854) — the de-facto
integration test for training-path changes. A fixed seed makes the number
comparable across commits.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--seq-len", type=int, default=64)
    args = parser.parse_args()

    import jax.numpy as jnp

    import vila_tpu
    from vila_tpu.models import vlm
    from vila_tpu.train.losses import causal_lm_loss

    engine = vila_tpu.load(args.model_path)
    cfg = engine.cfg

    rng = np.random.default_rng(0)
    b, s = 2, args.seq_len
    ids = rng.integers(1, min(cfg.llm.vocab_size, 1000), size=(b, s)).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "positions": jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s)),
        "segment_ids": jnp.ones((b, s), jnp.int32),
    }
    logits = vlm.forward_batch(engine.params, cfg, batch)
    loss, n = causal_lm_loss(logits, batch["labels"])

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump({"loss_eval": {"loss": float(loss), "n_tokens": int(n)}}, f)
    print(f"loss={float(loss):.6f} over {int(n)} tokens")


if __name__ == "__main__":
    main()
