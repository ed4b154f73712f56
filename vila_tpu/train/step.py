"""Sharded training step.

Capability parity: the reference's training loop core —
`LlavaLlamaModel.forward` + HF Trainer backward under DeepSpeed ZeRO-3
(llava/model/language_model/llava_llama.py:94, llava/train/train.py:419) —
as one jitted function over a `jax.sharding.Mesh`. ZeRO-3's param
all-gather / grad reduce-scatter become GSPMD-inserted collectives from the
FSDP sharding specs in vila_tpu.parallel.mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vila_tpu.models import vlm
from vila_tpu.parallel import mesh as mesh_lib
from vila_tpu.train.losses import causal_lm_loss, chunked_causal_lm_loss


def loss_fn(
    params, cfg, batch, ce_chunk_size: Optional[int] = None
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    if ce_chunk_size:
        # Fused chunked CE: lm_head projection never materializes (B,S,V).
        hidden = vlm.forward_batch(params, cfg, batch, return_hidden=True)
        loss, n_tokens = chunked_causal_lm_loss(
            hidden, params["llm"], cfg.llm,
            batch["labels"], chunk_size=ce_chunk_size,
        )
    else:
        logits = vlm.forward_batch(params, cfg, batch)
        loss, n_tokens = causal_lm_loss(logits, batch["labels"])
    return loss, {"loss": loss, "n_tokens": n_tokens}


def train_step(
    params, opt_state, batch, *, cfg, optimizer, ce_chunk_size=None
):
    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(p, cfg, batch, ce_chunk_size), has_aux=True
    )
    (loss, metrics), grads = grad_fn(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return params, opt_state, metrics


def make_sharded_train_step(
    cfg: vlm.VLMConfig,
    params: Dict[str, Any],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    ce_chunk_size: Optional[int] = None,
):
    """Returns (step_fn, sharded_params, sharded_opt_state, batch_shardings).

    `step_fn(params, opt_state, batch)` is jitted with donated state and
    GSPMD shardings: FSDP(+TP) params, dp×sp activations.
    """
    param_specs = mesh_lib.vlm_param_specs(cfg, params, mesh)
    param_sh = mesh_lib.to_shardings(param_specs, mesh)
    params = jax.tree.map(jax.device_put, params, param_sh)

    # Eager init: optax builds mu/nu with zeros_like(param), inheriting the
    # FSDP shardings; scalar counts are replicated.
    replicated = NamedSharding(mesh, P())
    opt_state = optimizer.init(params)
    opt_state = jax.tree.map(
        lambda x: x
        if hasattr(x, "sharding")
        and isinstance(x.sharding, NamedSharding)
        else jax.device_put(x, replicated),
        opt_state,
    )

    bspec = {
        "input_ids": P("dp", "sp"),
        "labels": P("dp", "sp"),
        "positions": P("dp", "sp"),
        "segment_ids": P("dp", "sp"),
        "pixel_values": P("dp"),
        "media_positions": P("dp"),
    }
    batch_sh = {k: NamedSharding(mesh, v) for k, v in bspec.items()}

    step = jax.jit(
        functools.partial(
            train_step, cfg=cfg, optimizer=optimizer,
            ce_chunk_size=ce_chunk_size,
        ),
        donate_argnums=(0, 1),
    )
    return step, params, opt_state, batch_sh
