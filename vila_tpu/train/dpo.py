"""Direct Preference Optimization — functional JAX.

Capability parity: the reference's DPO stack — vendored TRL
`DPOTrainer` subset (llava/trl/trainer/dpo_trainer.py), `VILADPOTrainer`
(llava/train/llava_trainer.py:441) and the DPO data path
(`DPODataset`/`DPODataCollator`, llava/train/train.py:224-416).

TPU-first: one jitted step evaluates policy and (frozen) reference model on
the chosen/rejected pair batch; the reference forward runs under
`stop_gradient` with the same sharded params — no second model copy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vila_tpu.constants import IGNORE_INDEX
from vila_tpu.models import vlm


@dataclasses.dataclass(frozen=True)
class DPOConfig:
    beta: float = 0.1
    label_smoothing: float = 0.0
    loss_type: str = "sigmoid"  # sigmoid | ipo (dpo_trainer.py loss_type)
    # sequence-logp chunking (never materialize (B, S, V)); None = one
    # full-logits projection (tiny models / debugging only)
    chunk_size: Optional[int] = 1024


def sequence_logp(
    params,
    cfg,
    batch_side: Dict[str, jnp.ndarray],
    chunk_size: Optional[int] = 1024,
) -> jnp.ndarray:
    """Sum log p(labels) per sequence. batch_side is a collated batch
    (input_ids, labels, positions, segment_ids, optional media).

    With `chunk_size`, the lm_head projection + log-softmax run chunk-wise
    under `jax.checkpoint` (losses.chunked_sequence_logp) so peak memory is
    O(B * chunk * V) instead of O(B * S * V)."""
    if chunk_size:
        from vila_tpu.train.losses import chunked_sequence_logp

        hidden = vlm.forward_batch(params, cfg, batch_side, return_hidden=True)
        return chunked_sequence_logp(
            hidden, params["llm"], cfg.llm, batch_side["labels"], chunk_size
        )
    logits = vlm.forward_batch(params, cfg, batch_side)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = batch_side["labels"][:, 1:]
    valid = targets != IGNORE_INDEX
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, tok_logp, 0.0).sum(-1)


def dpo_loss(
    policy_chosen: jnp.ndarray,
    policy_rejected: jnp.ndarray,
    ref_chosen: jnp.ndarray,
    ref_rejected: jnp.ndarray,
    dcfg: DPOConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """TRL-parity sigmoid/IPO DPO objective (dpo_trainer.py dpo_loss)."""
    pi_ratio = policy_chosen - policy_rejected
    ref_ratio = ref_chosen - ref_rejected
    h = pi_ratio - ref_ratio
    if dcfg.loss_type == "ipo":
        loss = jnp.mean(jnp.square(h - 1.0 / (2.0 * dcfg.beta)))
    else:
        loss = -jnp.mean(
            (1.0 - dcfg.label_smoothing)
            * jax.nn.log_sigmoid(dcfg.beta * h)
            + dcfg.label_smoothing * jax.nn.log_sigmoid(-dcfg.beta * h)
        )
    chosen_reward = dcfg.beta * (policy_chosen - ref_chosen)
    rejected_reward = dcfg.beta * (policy_rejected - ref_rejected)
    metrics = {
        "rewards_chosen": chosen_reward.mean(),
        "rewards_rejected": rejected_reward.mean(),
        "reward_margin": (chosen_reward - rejected_reward).mean(),
        "reward_accuracy": (chosen_reward > rejected_reward).mean(),
    }
    return loss, metrics


def dpo_step_fn(
    params,
    ref_params,
    batch: Dict[str, Dict[str, jnp.ndarray]],  # {"chosen": ..., "rejected": ...}
    *,
    cfg,
    dcfg: DPOConfig,
    optimizer,
    opt_state,
):
    def loss_fn(p):
        cs = dcfg.chunk_size
        pc = sequence_logp(p, cfg, batch["chosen"], cs)
        pr = sequence_logp(p, cfg, batch["rejected"], cs)
        rc = jax.lax.stop_gradient(
            sequence_logp(ref_params, cfg, batch["chosen"], cs)
        )
        rr = jax.lax.stop_gradient(
            sequence_logp(ref_params, cfg, batch["rejected"], cs)
        )
        loss, metrics = dpo_loss(pc, pr, rc, rr, dcfg)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics["loss"] = loss
    return params, opt_state, metrics


class DPOCollator:
    """Pairs of (chosen, rejected) examples -> two collated batches."""

    def __init__(self, base_collator) -> None:
        self.base = base_collator

    def __call__(self, pairs):
        chosen = self.base([p["chosen"] for p in pairs])
        rejected = self.base([p["rejected"] for p in pairs])
        return {"chosen": chosen, "rejected": rejected}
