"""Profiling + metrics observability.

Capability parity & upgrade: the reference has only GPU-memory prints and
optional NVIDIA one_logger telemetry (llava/train/train.py:431-468,887-891);
SURVEY.md §5 calls for baked-in `jax.profiler` tracing on the TPU build.

  * `trace(logdir)` — context manager around `jax.profiler.trace`, dumping
    xplane protos viewable in TensorBoard/XProf.
  * `annotate(name)` — TraceAnnotation for host-side phases.
  * `MetricsLogger` — JSONL metrics stream (+ optional wandb if installed),
    the counterpart of the reference's wandb reporting (train.py:58-60).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(
        logdir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side named region (shows up in the trace timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, Any]:
    """Per-device memory stats (parity: GPU memory prints, train.py:887)."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


class MetricsLogger:
    """Append-only metrics.jsonl + optional wandb mirror."""

    def __init__(
        self,
        output_dir: str,
        project: Optional[str] = None,
        run_name: Optional[str] = None,
    ) -> None:
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._wandb = None
        if project:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=run_name, dir=output_dir
                )
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = dict(metrics)
        if step is not None:
            rec["step"] = step
        rec["time"] = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()
