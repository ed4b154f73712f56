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
    params,
    cfg,
    batch,
    ce_chunk_size: Optional[int] = None,
    sp=None,
    token_selection_loss_weight: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    # Under the zigzag ring layout, parallel.sp.zigzag_batch pre-shifted the
    # labels (array order is not causal order); skip the in-loss shift then.
    shift = not (
        sp is not None
        and sp.layout_for(batch["input_ids"].shape[1]) == "zigzag"
    )
    ps3 = cfg.vision_tower_type == "ps3"
    sel_probs = []
    if ce_chunk_size:
        # Fused chunked CE: lm_head projection never materializes (B,S,V).
        if ps3:
            hidden, sel_probs = vlm.forward_batch_ps3(
                params, cfg, batch, return_hidden=True, sp=sp
            )
        else:
            hidden = vlm.forward_batch(
                params, cfg, batch, return_hidden=True, sp=sp
            )
        loss, n_tokens = chunked_causal_lm_loss(
            hidden, params["llm"], cfg.llm,
            batch["labels"], chunk_size=ce_chunk_size, shift=shift,
        )
    else:
        if ps3:
            logits, sel_probs = vlm.forward_batch_ps3(
                params, cfg, batch, sp=sp
            )
        else:
            logits = vlm.forward_batch(params, cfg, batch, sp=sp)
        loss, n_tokens = causal_lm_loss(
            logits, batch["labels"], shift=shift
        )
    metrics = {"loss": loss, "n_tokens": n_tokens}
    if ps3 and sel_probs and batch.get("gt_selection_maps") is not None:
        # PS3 top-down trainer: LM loss + weighted BCE+dice selection loss
        # (LLaVATopDownTrainer.compute_loss, llava_trainer.py:917-998).
        from vila_tpu.train.losses import token_selection_loss

        gt = batch["gt_selection_maps"]
        gt = gt.reshape((-1,) + gt.shape[2:])
        sel = token_selection_loss(sel_probs, gt)
        loss = loss + token_selection_loss_weight * sel
        metrics["token_selection_loss"] = sel
        metrics["loss"] = loss
    return loss, metrics


def train_step(
    params, opt_state, batch, *, cfg, optimizer, ce_chunk_size=None, sp=None
):
    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(p, cfg, batch, ce_chunk_size, sp), has_aux=True
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
    sp_attention: bool = False,
    ring_layout: str = "zigzag",
):
    """Returns (step_fn, sharded_params, sharded_opt_state, batch_shardings).

    `step_fn(params, opt_state, batch)` is jitted with donated state and
    GSPMD shardings: FSDP(+TP) params, dp×sp activations.

    With `sp_attention` and a mesh whose sp×su > 1, every decoder attention
    runs as explicit ring/Ulysses/hybrid MM-SP under shard_map instead of
    letting GSPMD all-gather the sequence — attention memory stays
    O(S_local²·ring) per device. Feed batches through
    `parallel.sp.zigzag_batch` when `ring_layout="zigzag"`.
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

    batch_sh = {
        k: NamedSharding(mesh, v)
        for k, v in mesh_lib.batch_specs(mesh).items()
    }

    sp = None
    if sp_attention:
        from vila_tpu.parallel.sp import SPConfig

        sp = SPConfig(mesh=mesh, ring_layout=ring_layout)
        if not sp.active:
            sp = None

    step = jax.jit(
        functools.partial(
            train_step, cfg=cfg, optimizer=optimizer,
            ce_chunk_size=ce_chunk_size, sp=sp,
        ),
        donate_argnums=(0, 1),
    )
    return step, params, opt_state, batch_sh
