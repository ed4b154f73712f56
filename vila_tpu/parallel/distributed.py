"""Multi-host runtime: process bootstrap + host-sharded data plumbing.

Capability parity: the reference's multi-node surface — torchrun/SLURM env
wiring (`scripts/NVILA-Lite/sft.sh`, `llava/cli/run.py:30-135`) and
`llava/utils/distributed.py` (init/rank/size helpers) — rebuilt on
`jax.distributed`: one Python process per host, every host sees the global
device mesh, collectives ride ICI/DCN, and each host feeds only its own
batch shard (`jax.make_array_from_process_local_data`).

Environment contract (any one of):
  * single process — no setup needed (the default);
  * explicit: VILA_COORDINATOR / VILA_NUM_PROCESSES / VILA_PROCESS_ID;
  * SLURM: jax.distributed.initialize() auto-detects SLURM_* variables.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed (idempotent). Returns process_index.

    With no args, reads VILA_COORDINATOR/VILA_NUM_PROCESSES/VILA_PROCESS_ID,
    falling back to jax.distributed's own auto-detection (SLURM, GKE). A
    single-process run (no env, no args) is a no-op.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_index()

    coordinator_address = coordinator_address or os.environ.get(
        "VILA_COORDINATOR"
    )
    if num_processes is None and "VILA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VILA_NUM_PROCESSES"])
    if process_id is None and "VILA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VILA_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        auto = any(k in os.environ for k in ("SLURM_JOB_ID", "SLURM_PROCID"))
        if not auto:
            return 0  # single-process
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _INITIALIZED = True
    return jax.process_index()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def host_local_batch(global_batch: dict, shardings: dict) -> dict:
    """Assemble global device arrays from this host's local batch shard.

    Each host passes only its own slice of the global batch (leading batch
    dim sharded over processes); the returned pytree contains fully
    addressable-global `jax.Array`s matching `shardings`.
    """
    out = {}
    for k, v in global_batch.items():
        sh = shardings.get(k)
        if sh is None:
            out[k] = v
        elif jax.process_count() > 1:
            out[k] = jax.make_array_from_process_local_data(
                sh, np.asarray(v)
            )
        else:
            out[k] = jax.device_put(v, sh)
    return out
