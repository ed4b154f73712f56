"""Multi-host runtime: two jax.distributed CPU processes train together —
disjoint data shards per host group, finite loss on both, rank-0 logging.
(Reference surface: torchrun/SLURM multi-node, scripts/NVILA-Lite/sft.sh.)
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

WORKER = r'''
import json, os, sys
pid = int(sys.argv[1])
out_root = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["VILA_COORDINATOR"] = "localhost:12377"
os.environ["VILA_NUM_PROCESSES"] = "2"
os.environ["VILA_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
# must run before any computation (param init below) touches the backend
from vila_tpu.parallel.distributed import init_distributed
init_distributed()

import numpy as np
from vila_tpu.models import projector, qwen2, siglip, vlm
from vila_tpu.data.collate import Collator
from vila_tpu.train.trainer import TrainArgs, Trainer

llm = qwen2.LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    dtype="float32")
vis = siglip.SigLIPConfig(hidden_size=24, intermediate_size=48,
    num_hidden_layers=2, num_attention_heads=4, image_size=28, patch_size=14)
proj = projector.ProjectorConfig(projector_type="mlp_downsample",
    mm_hidden_size=24, hidden_size=32)
cfg = vlm.VLMConfig(llm=llm, vision=vis, projector=proj)

class ToyDataset:
    def __init__(self, n=32, seq=24, vocab=64):
        rng = np.random.default_rng(0)
        self.items = []
        self.accessed = []
        for _ in range(n):
            ids = rng.integers(2, vocab, seq).astype(np.int32)
            self.items.append({
                "input_ids": ids, "labels": ids.copy(),
                "tiles": np.zeros((0, 28, 28, 3), np.uint8),
                "media_positions": np.zeros((0,), np.int32),
            })
    def __len__(self):
        return len(self.items)
    def __getitem__(self, i):
        self.accessed.append(int(i))
        return self.items[i]

params = vlm.init_params(jax.random.PRNGKey(0), cfg)
ds = ToyDataset()
args = TrainArgs(
    output_dir=os.path.join(out_root, "run"),
    max_steps=3, per_device_batch_size=8, seq_len=24,
    dp=8, learning_rate=1e-3, warmup_ratio=0.0, lr_schedule="constant",
    logging_steps=1, save_steps=100, resume=False, distributed=True,
)
trainer = Trainer(cfg, params, ds, Collator(seq_len=24), args)
assert trainer.process_count == 2, trainer.process_count
assert jax.device_count() == 8
out = trainer.train()
losses = [m["loss"] for m in out["log_history"]]
with open(os.path.join(out_root, f"worker{pid}.json"), "w") as f:
    json.dump({"losses": losses, "accessed": ds.accessed}, f)
'''


@pytest.mark.timeout(600)
@pytest.mark.slow
def test_two_process_training_disjoint_data(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    w = []
    for pid in (0, 1):
        with open(tmp_path / f"worker{pid}.json") as f:
            w.append(json.load(f))
    # losses replicated across hosts and finite
    assert w[0]["losses"] == pytest.approx(w[1]["losses"], rel=1e-5)
    assert all(np.isfinite(w[0]["losses"]))
    # each host drew a DISJOINT shard of the dataset
    a0, a1 = set(w[0]["accessed"]), set(w[1]["accessed"])
    assert a0 and a1 and not (a0 & a1), (sorted(a0), sorted(a1))
    # rank 0 wrote the log history artifact
    assert (tmp_path / "run" / "log_history.json").exists()
