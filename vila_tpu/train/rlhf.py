"""RLHF trainers: reward modeling + PPO with a value head — functional JAX.

Capability parity with the reference's vendored TRL tree beyond DPO
(llava/trl/trainer/{reward_trainer,ppo_trainer,sft_trainer}.py and
llava/trl/models/modeling_value_head.py). The reference vendors ~11k LoC
of TRL; VILA's own recipes only exercise DPO (train/train.py:224-416), so
these are the compact TPU-native equivalents of the remaining surface:

 * **Reward model**: the LLM with a scalar head on the last-token hidden
   state; pairwise Bradley–Terry loss `-log σ(r_chosen − r_rejected)`
   (trl reward_trainer.py compute_loss).
 * **PPO**: value head on the policy trunk (modeling_value_head.py),
   per-token KL-shaped rewards against a frozen reference policy, GAE,
   clipped surrogate + clipped value loss (trl ppo_trainer.py train_minibatch
   semantics: `cliprange`, `cliprange_value`, `vf_coef`, whitened
   advantages).
 * **SFT**: TRL's sft_trainer is plain causal-LM fine-tuning — in this
   repo that IS `train/trainer.py` (stage recipes); `sft_step_fn` below is
   the iterative-SFT-style single step for API completeness
   (trl iterative_sft_trainer.py).

Deliberately out of scope: trl's DDPO (ddpo_trainer.py) — Denoising
Diffusion Policy Optimization is a Stable-Diffusion trainer with no call
site anywhere in the reference's VLM stack.

TPU-first notes: everything here is a pure jittable step over sharded
params — experience-making (old logp / values / KL rewards / GAE) is one
fused forward pass, the reference policy runs under `stop_gradient` with
its own (frozen) param tree, and GAE is a reversed `lax.scan`, not a
Python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vila_tpu.constants import IGNORE_INDEX
from vila_tpu.models import qwen2, vlm


# ---------------------------------------------------------------------------
# Shared: per-token logp and value head
# ---------------------------------------------------------------------------


def init_value_head(rng: jax.Array, hidden_size: int, dtype=jnp.float32):
    """Scalar head (trl modeling_value_head.ValueHead: dropout + linear)."""
    k = jax.random.normal(rng, (hidden_size, 1), dtype) * (
        hidden_size ** -0.5
    )
    return {"kernel": k, "bias": jnp.zeros((1,), dtype)}


def _hidden(params, cfg, batch) -> jnp.ndarray:
    """(B, S, D) final hidden states for a collated batch (media-aware)."""
    return vlm.forward_batch(params, cfg, batch, return_hidden=True)


def value_forward(head, hidden: jnp.ndarray) -> jnp.ndarray:
    """(B, S) value estimates from (B, S, D) hidden states."""
    h = hidden.astype(head["kernel"].dtype)
    return (h @ head["kernel"] + head["bias"])[..., 0]


def token_logp(params, cfg, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token log p(input_ids[t+1] | <=t) plus hidden states.

    Returns (logp (B, S-1), hidden (B, S, D)). Memory note: materializes
    (B, S-1, V) logits — PPO rollouts are short (prompt+response); for long
    sequences use losses.chunked_* like the DPO path.
    """
    hidden = _hidden(params, cfg, batch)
    logits = qwen2.compute_logits(params["llm"], cfg.llm, hidden)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = batch["input_ids"][:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return tok, hidden


# ---------------------------------------------------------------------------
# Reward modeling (trl reward_trainer.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    center_coef: float = 0.0  # optional reward-centering L2 (trl margin-free)


def sequence_reward(params, head, cfg, batch,
                    valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B,) scalar rewards: value head on the LAST VALID token's hidden.

    `valid` (B, S) bool marks real tokens. Defaults to the collator's
    ``segment_ids != 0`` (0 is padding by construction, `data/collate.py`);
    only without segment_ids does it fall back to inferring from pad-id-0
    input_ids — which conflates a legitimate token id 0 with padding, so
    callers with custom batches should pass the mask explicitly."""
    hidden = _hidden(params, cfg, batch)
    if valid is None:
        if "segment_ids" in batch:
            valid = batch["segment_ids"] != 0
        else:
            valid = batch["input_ids"] != 0
            if "labels" in batch:
                valid = valid | (batch["labels"] != IGNORE_INDEX)
    last = jnp.maximum(
        valid.shape[1] - 1 - jnp.argmax(valid[:, ::-1], axis=1), 0
    )
    h_last = hidden[jnp.arange(hidden.shape[0]), last]
    return (h_last.astype(head["kernel"].dtype) @ head["kernel"]
            + head["bias"])[..., 0]


def reward_loss(
    r_chosen: jnp.ndarray, r_rejected: jnp.ndarray, rcfg: RewardConfig
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Pairwise Bradley–Terry loss (reward_trainer.py compute_loss)."""
    loss = -jax.nn.log_sigmoid(r_chosen - r_rejected).mean()
    if rcfg.center_coef:
        loss = loss + rcfg.center_coef * (
            jnp.square(r_chosen) + jnp.square(r_rejected)
        ).mean()
    metrics = {
        "reward_accuracy": (r_chosen > r_rejected).mean(),
        "reward_margin": (r_chosen - r_rejected).mean(),
    }
    return loss, metrics


def reward_step_fn(
    params, head, batch, *, cfg, rcfg: RewardConfig, optimizer, opt_state
):
    """One reward-model update on a {"chosen","rejected"} pair batch.
    Trains (params, head) jointly — freeze parts via optax.multi_transform
    exactly like the main trainer's tune flags."""

    def loss_fn(trainable):
        p, h = trainable
        rc = sequence_reward(p, h, cfg, batch["chosen"])
        rr = sequence_reward(p, h, cfg, batch["rejected"])
        return reward_loss(rc, rr, rcfg)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        (params, head)
    )
    updates, opt_state = optimizer.update(grads, opt_state, (params, head))
    params, head = optax.apply_updates((params, head), updates)
    metrics["loss"] = loss
    return params, head, opt_state, metrics


# ---------------------------------------------------------------------------
# PPO (trl ppo_trainer.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    kl_coef: float = 0.05  # per-token KL penalty vs reference (init_kl_coef)
    gamma: float = 1.0
    lam: float = 0.95
    cliprange: float = 0.2
    cliprange_value: float = 0.2
    vf_coef: float = 0.1
    whiten_advantages: bool = True


def compute_gae(
    rewards: jnp.ndarray,  # (B, T)
    values: jnp.ndarray,  # (B, T)
    mask: jnp.ndarray,  # (B, T) 1.0 on response tokens
    gamma: float,
    lam: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized advantage estimation as a reversed lax.scan.

    TRL semantics (ppo_trainer.compute_advantages, trl/trainer/
    ppo_trainer.py:1141): values and rewards are zeroed by the mask BEFORE
    the recursion, so garbage value-head outputs on padded / post-response
    positions never enter a delta or the carry (the boundary bootstrap is
    gamma * 0, and padding steps contribute delta == 0); the recursion
    itself is then unmasked. Returns (advantages, returns)."""
    values = values * mask
    rewards = rewards * mask

    def step(carry, xs):
        next_adv, next_value = carry
        r, v = xs
        delta = r + gamma * next_value - v
        adv = delta + gamma * lam * next_adv
        return (adv, v), adv

    xs = (rewards.T, values.T)  # scan over time, reversed
    (_, _), adv_t = jax.lax.scan(
        step,
        (jnp.zeros(rewards.shape[0]), jnp.zeros(rewards.shape[0])),
        xs,
        reverse=True,
    )
    advantages = adv_t.T * mask
    returns = advantages + values
    return advantages, returns


def _whiten(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.maximum(mask.sum(), 1.0)
    mean = (x * mask).sum() / n
    var = (jnp.square(x - mean) * mask).sum() / n
    return (x - mean) * jax.lax.rsqrt(var + 1e-8) * mask


def make_experience(
    params,
    ref_params,
    value_head,
    batch: Dict[str, jnp.ndarray],  # collated prompt+response rows
    response_mask: jnp.ndarray,  # (B, S-1) 1.0 where t+1 is a response token
    scores: jnp.ndarray,  # (B,) terminal rewards from the reward model
    *,
    cfg,
    pcfg: PPOConfig,
) -> Dict[str, jnp.ndarray]:
    """One fused pass building the PPO rollout buffer: old per-token logp,
    values, KL-shaped per-token rewards (score added at the last response
    token — ppo_trainer.compute_rewards), GAE advantages and returns."""
    old_logp, hidden = token_logp(params, cfg, batch)
    ref_logp, _ = token_logp(ref_params, cfg, batch)
    old_logp = jax.lax.stop_gradient(old_logp)
    ref_logp = jax.lax.stop_gradient(ref_logp)
    values = jax.lax.stop_gradient(
        value_forward(value_head, hidden)[:, :-1]
    )

    kl = old_logp - ref_logp
    rewards = -pcfg.kl_coef * kl * response_mask
    # terminal score lands on the LAST response token; a row with an empty
    # response mask has no terminal token — its score is dropped rather
    # than landing on argmax-of-zeros (position T-1)
    has_resp = response_mask.sum(axis=1) > 0
    idx = jnp.maximum(
        response_mask.shape[1] - 1
        - jnp.argmax(response_mask[:, ::-1], axis=1),
        0,
    )
    rewards = rewards.at[jnp.arange(rewards.shape[0]), idx].add(
        jnp.where(has_resp, scores, 0.0)
    )

    advantages, returns = compute_gae(
        rewards, values, response_mask, pcfg.gamma, pcfg.lam
    )
    if pcfg.whiten_advantages:
        advantages = _whiten(advantages, response_mask)
    return {
        "old_logp": old_logp,
        "values": values,
        "advantages": jax.lax.stop_gradient(advantages),
        "returns": jax.lax.stop_gradient(returns),
        "kl": (kl * response_mask).sum() / jnp.maximum(
            response_mask.sum(), 1.0
        ),
    }


def ppo_loss(
    logp: jnp.ndarray,  # (B, T) new per-token logp
    vpred: jnp.ndarray,  # (B, T) new values
    exp: Dict[str, jnp.ndarray],
    mask: jnp.ndarray,
    pcfg: PPOConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Clipped surrogate + clipped value loss (ppo_trainer.loss)."""
    n = jnp.maximum(mask.sum(), 1.0)
    ratio = jnp.exp(logp - exp["old_logp"])
    pg1 = -exp["advantages"] * ratio
    pg2 = -exp["advantages"] * jnp.clip(
        ratio, 1.0 - pcfg.cliprange, 1.0 + pcfg.cliprange
    )
    pg_loss = (jnp.maximum(pg1, pg2) * mask).sum() / n

    v_clip = exp["values"] + jnp.clip(
        vpred - exp["values"], -pcfg.cliprange_value, pcfg.cliprange_value
    )
    vf1 = jnp.square(vpred - exp["returns"])
    vf2 = jnp.square(v_clip - exp["returns"])
    vf_loss = 0.5 * (jnp.maximum(vf1, vf2) * mask).sum() / n

    loss = pg_loss + pcfg.vf_coef * vf_loss
    metrics = {
        "pg_loss": pg_loss,
        "vf_loss": vf_loss,
        "ratio_mean": (ratio * mask).sum() / n,
        "clipfrac": ((jnp.abs(ratio - 1.0) > pcfg.cliprange) * mask).sum()
        / n,
    }
    return loss, metrics


def ppo_step_fn(
    params,
    value_head,
    batch,
    response_mask,
    exp: Dict[str, jnp.ndarray],
    *,
    cfg,
    pcfg: PPOConfig,
    optimizer,
    opt_state,
):
    """One PPO minibatch update over (policy params, value head)."""

    def loss_fn(trainable):
        p, vh = trainable
        logp, hidden = token_logp(p, cfg, batch)
        vpred = value_forward(vh, hidden)[:, :-1]
        return ppo_loss(logp, vpred, exp, response_mask, pcfg)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        (params, value_head)
    )
    updates, opt_state = optimizer.update(
        grads, opt_state, (params, value_head)
    )
    params, value_head = optax.apply_updates((params, value_head), updates)
    metrics["loss"] = loss
    return params, value_head, opt_state, metrics


# ---------------------------------------------------------------------------
# SFT single step (trl sft_trainer / iterative_sft_trainer)
# ---------------------------------------------------------------------------


def sft_step_fn(params, batch, *, cfg, optimizer, opt_state,
                chunk_size: Optional[int] = 1024):
    """Plain causal-LM step — TRL's sft_trainer is exactly this; the full
    training loop with freezing/mixtures/recipes lives in train/trainer.py.
    Provided for iterative-SFT-style use (alternate PPO and SFT updates)."""
    from vila_tpu.train.losses import chunked_causal_lm_loss

    def loss_fn(p):
        hidden = _hidden(p, cfg, batch)
        loss, _count = chunked_causal_lm_loss(
            hidden, p["llm"], cfg.llm, batch["labels"],
            chunk_size or batch["labels"].shape[1],
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss}
