"""Checkpoint weight utilities: deltas, consolidation, LoRA merge-and-save.

Capability parity: `llava/model/apply_delta.py` / `make_delta.py` (weight
deltas vs a base model), `llava/model/consolidate.py` (merge sharded
checkpoints), and `llava/utils/merge_lora_weights_and_save_hf_model.py`.

All operate on vila_tpu pytrees (numpy/jax leaves) or on safetensors files
in the component checkpoint layout.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def make_delta(base: Dict[str, Any], target: Dict[str, Any]) -> Dict[str, Any]:
    """delta = target - base, leafwise (make_delta.py behavior)."""
    return jax.tree.map(
        lambda t, b: (np.asarray(t, np.float32) - np.asarray(b, np.float32)),
        target, base,
    )


def apply_delta(base: Dict[str, Any], delta: Dict[str, Any]) -> Dict[str, Any]:
    """target = base + delta (apply_delta.py behavior)."""
    return jax.tree.map(
        lambda b, d: (np.asarray(b, np.float32) + np.asarray(d, np.float32)),
        base, delta,
    )


def consolidate_checkpoint(
    run_dir: str,
    template_state: Dict[str, Any],
    model_path: str,
    out_dir: str,
) -> str:
    """Training-run orbax checkpoint → deployable component checkpoint.

    The reference's `consolidate.py:48` turns training artifacts (sharded,
    optimizer-laden) into a single loadable model. Our equivalent: restore
    the latest step of a trainer run (state template `{"params":
    ..., "opt_state": ...}` — Trainer's save layout), drop everything but
    the params, and write the component layout (`llm/`, `vision_tower/`,
    `mm_projector/`) that `vila_tpu.load` consumes. Config/tokenizer come
    from the run's base model at `model_path`."""
    from vila_tpu import entry
    from vila_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(run_dir, async_save=False)
    step, state = mgr.restore_latest(template_state)
    mgr.close()
    assert step is not None, f"no checkpoint under {run_dir}"
    cfg = entry.build_config(model_path, dtype="float32")
    tokenizer = entry.load_tokenizer(model_path)
    entry.save(state["params"], cfg, tokenizer, out_dir)
    return out_dir


def merge_lora_and_save(
    model_path: str, lora_state: Dict[str, Any], lora_cfg, out_dir: str
):
    """Load a component checkpoint, merge LoRA factors into the base
    weights, and save back in the component layout
    (merge_lora_weights_and_save_hf_model.py parity)."""
    from vila_tpu import entry
    from vila_tpu.train import lora as lora_lib

    cfg = entry.build_config(model_path, dtype="float32")
    params = entry.load_params(model_path, cfg)
    tokenizer = entry.load_tokenizer(model_path)
    merged = lora_lib.merge_lora(params, lora_state, lora_cfg)
    entry.save(merged, cfg, tokenizer, out_dir)
    return out_dir
