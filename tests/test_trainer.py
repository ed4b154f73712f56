"""Trainer loop: loss decreases, checkpoints write, resume continues."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax

from vila_tpu.models import projector, qwen2, siglip, vlm
from vila_tpu.data.collate import Collator
from vila_tpu.train.trainer import TrainArgs, Trainer


def tiny_cfg():
    llm = qwen2.LLMConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
    )
    vis = siglip.SigLIPConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    proj = projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=24, hidden_size=32
    )
    return vlm.VLMConfig(llm=llm, vision=vis, projector=proj)


class ToyDataset:
    """Memorizable text-only sequences."""

    def __init__(self, n=16, seq=24, vocab=64):
        rng = np.random.default_rng(0)
        self.items = []
        for _ in range(n):
            ids = rng.integers(2, vocab, seq).astype(np.int32)
            self.items.append(
                {
                    "input_ids": ids,
                    "labels": ids.copy(),
                    "tiles": np.zeros((0, 28, 28, 3), np.uint8),
                    "media_positions": np.zeros((0,), np.int32),
                }
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.mark.slow
def test_trainer_loss_decreases_and_resumes(tmp_path):
    cfg = tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ds = ToyDataset()
    collator = Collator(seq_len=24)
    args = TrainArgs(
        output_dir=str(tmp_path / "run"),
        max_steps=8,
        per_device_batch_size=4,
        seq_len=24,
        learning_rate=1e-3,
        warmup_ratio=0.0,
        lr_schedule="constant",
        logging_steps=1,
        save_steps=4,
    )
    trainer = Trainer(cfg, params, ds, collator, args)
    out = trainer.train()
    hist = out["log_history"]
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert trainer.ckpt.latest_step() == 8

    # Resume: a fresh trainer picks up at step 8 and runs to 10.
    args2 = TrainArgs(
        output_dir=str(tmp_path / "run"),
        max_steps=10,
        per_device_batch_size=4,
        seq_len=24,
        learning_rate=1e-3,
        warmup_ratio=0.0,
        lr_schedule="constant",
        logging_steps=1,
        save_steps=100,
    )
    params2 = vlm.init_params(jax.random.PRNGKey(0), cfg)
    trainer2 = Trainer(cfg, params2, ds, collator, args2)
    assert trainer2.start_step == 8
    out2 = trainer2.train()
    # resumed loss continues from the trained state, not from scratch
    assert out2["log_history"][0]["loss"] < hist[0]["loss"]
