"""Training losses.

Capability parity: HF causal-LM CE (shift inside, IGNORE_INDEX=-100) plus
the reference's `soft_cross_entropy` for time tokens
(llava/model/loss.py:11-48). The packed/SP loss renormalization
(`calculate_loss_weight`, llava/train/utils.py:149-165) is implicit here:
the mean is taken over *all* valid tokens globally, which under GSPMD is
exactly the globally-correct weighting the reference reconstructs by hand.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.constants import IGNORE_INDEX


def causal_lm_loss(
    logits: jnp.ndarray,  # (B, S, V) float32
    labels: jnp.ndarray,  # (B, S) int32 with IGNORE_INDEX masking
    z_loss: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Next-token cross entropy. Returns (loss, n_valid_tokens)."""
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe_targets = jnp.where(valid, targets, 0)

    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    target_logit = jnp.take_along_axis(
        logits, safe_targets[..., None], axis=-1
    )[..., 0]
    nll = logz - target_logit
    if z_loss > 0.0:
        nll = nll + z_loss * jnp.square(logz)
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(valid.sum(), 1)
    return nll.sum() / n, valid.sum()


def soft_cross_entropy(
    logits: jnp.ndarray,  # (B, S, V)
    labels: jnp.ndarray,  # (B, S)
    soft_tokens: jnp.ndarray,  # (K,) candidate token ids (time tokens)
    std: float = 1.0,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Gaussian-soft CE over a token subset (llava/model/loss.py:11-48).

    For positions whose label is one of `soft_tokens`, the target is a
    gaussian distribution over the soft-token ids centred on the label.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]

    k = soft_tokens.shape[0]
    # index of each target within soft_tokens, -1 if absent
    eq = targets[..., None] == soft_tokens  # (B, S-1, K)
    is_soft = eq.any(-1)
    tgt_idx = jnp.argmax(eq, axis=-1)

    positions = jnp.arange(k, dtype=jnp.float32)
    dist = positions[None, None, :] - tgt_idx[..., None].astype(jnp.float32)
    soft_target = jax.nn.softmax(-0.5 * jnp.square(dist / std), axis=-1)

    sub_logits = logits[..., soft_tokens]  # (B, S-1, K)
    logp = jax.nn.log_softmax(sub_logits, axis=-1)
    nll = -(soft_target * logp).sum(-1)

    valid = is_soft & (targets != ignore_index)
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
