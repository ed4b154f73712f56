"""Training checkpoints: orbax-backed save/restore with preemption handling.

Capability parity:
  * step checkpoints + resume-from-latest — HF Trainer/DeepSpeed checkpoints
    and `get_checkpoint_path` (llava/train/utils.py:59-79,
    llava/train/train.py:893);
  * save-before-walltime — `TimeoutTerminateCallback`
    (llava/train/slurm_utils.py:84-111) which checkpoints and exits 124
    shortly before the SLURM limit;
  * external preemption signal — `AutoResumeCallback`
    (llava/train/callbacks/autoresume_callback.py:38-63), here a SIGTERM
    handler (the TPU-pod preemption signal) that requests a save+stop.

TPU-first: orbax async checkpointing of the raw param/opt pytrees (sharded
arrays save per-host shards); a tiny JSON sidecar carries step/config.
"""

from __future__ import annotations

import json
import os
import re
import signal
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """save(step, state) / restore_latest() over `dir/checkpoint-<step>/`.

    `state` is any pytree of arrays (params, opt_state, data-loader state).
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        async_save: bool = True,
    ) -> None:
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        ocp = _ocp()
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            step_prefix="checkpoint",
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metadata: Optional[Dict] = None):
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if metadata is not None:
            with open(
                os.path.join(self.directory, f"metadata-{step}.json"), "w"
            ) as f:
                json.dump(metadata, f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: int, template: Any) -> Any:
        """Restore into the shapes/shardings of `template` (abstract ok)."""
        ocp = _ocp()
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def restore_latest(self, template: Any) -> Tuple[Optional[int], Any]:
        step = self.latest_step()
        if step is None:
            return None, template
        return step, self.restore(step, template)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


class PreemptionGuard:
    """Cooperative save-and-stop on SIGTERM/walltime.

    Usage: check `guard.should_stop(step)` each step; when True the caller
    saves and exits with code 124 (the reference's timeout convention, which
    `vila-run` retries indefinitely — llava/cli/run.py:117-131).
    """

    EXIT_CODE = 124

    def __init__(
        self,
        total_time_limit_s: Optional[float] = None,
        save_margin_s: float = 300.0,
        signals=(signal.SIGTERM,),
    ) -> None:
        self._start = time.monotonic()
        self._limit = total_time_limit_s
        self._margin = save_margin_s
        self._signaled = False
        for sig in signals:
            try:
                signal.signal(sig, self._handler)
            except ValueError:
                pass  # not in main thread

    def _handler(self, signum, frame):
        self._signaled = True

    @property
    def preempted(self) -> bool:
        return self._signaled

    def should_stop(self, step: int = 0) -> bool:
        if self._signaled:
            return True
        if self._limit is not None:
            return (
                time.monotonic() - self._start
                >= self._limit - self._margin
            )
        return False
