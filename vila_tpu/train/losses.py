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
    shift: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Next-token cross entropy. Returns (loss, n_valid_tokens).

    shift=False expects labels already aligned to logits (labels[i] is the
    target for position i) — required under the zigzag ring layout where
    array order is not causal order (parallel.sp.zigzag_batch pre-shifts).
    """
    if shift:
        logits = logits[:, :-1]
        targets = labels[:, 1:]
    else:
        targets = labels
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


def chunked_causal_lm_loss(
    hidden: jnp.ndarray,  # (B, S, D) final hidden states (pre lm_head)
    llm_params,
    llm_cfg,
    labels: jnp.ndarray,  # (B, S) int32 with IGNORE_INDEX masking
    chunk_size: int = 1024,
    z_loss: float = 0.0,
    shift: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused chunked cross entropy — the TPU answer to liger's fused CE
    kernel (llava/model/liger/cross_entropy.py:24).

    The (B, S, V) logits tensor dominates training memory at large vocab
    (Qwen2: V=152k). Instead of one big projection we scan over sequence
    chunks; each chunk's `hidden @ lm_head` + CE is wrapped in
    `jax.checkpoint`, so the backward pass recomputes chunk logits on the
    fly and peak memory is O(chunk * V) instead of O(S * V). XLA fuses the
    projection with the logsumexp reduction within a chunk.
    """
    from vila_tpu.models import qwen2

    b, s, d = hidden.shape
    # next-token shift (unless labels are pre-aligned), then flatten tokens
    if shift:
        h = hidden[:, :-1].reshape(-1, d)
        t = labels[:, 1:].reshape(-1)
    else:
        h = hidden.reshape(-1, d)
        t = labels.reshape(-1)
    n = h.shape[0]

    pad = (-n) % chunk_size
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        t = jnp.pad(t, (0, pad), constant_values=IGNORE_INDEX)
    n_chunks = h.shape[0] // chunk_size
    h = h.reshape(n_chunks, chunk_size, d)
    t = t.reshape(n_chunks, chunk_size)

    @jax.checkpoint
    def chunk_nll(hc, tc):
        logits = qwen2.compute_logits(
            llm_params, llm_cfg, hc
        ).astype(jnp.float32)  # (chunk, V)
        valid = tc != IGNORE_INDEX
        safe = jnp.where(valid, tc, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        nll = logz - tl
        if z_loss > 0.0:
            nll = nll + z_loss * jnp.square(logz)
        nll = jnp.where(valid, nll, 0.0)
        return nll.sum(), valid.sum()

    def body(carry, xs):
        tot, cnt = carry
        nll, nv = chunk_nll(*xs)
        return (tot + nll, cnt + nv), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (h, t)
    )
    return total / jnp.maximum(count, 1), count


def chunked_sequence_logp(
    hidden: jnp.ndarray,  # (B, S, D) final hidden states (pre lm_head)
    llm_params,
    llm_cfg,
    labels: jnp.ndarray,  # (B, S) int32 with IGNORE_INDEX masking
    chunk_size: int = 1024,
) -> jnp.ndarray:
    """Per-sequence sum of target log-probs without materializing (B, S, V).

    The DPO objective needs sum_t log p(y_t) per sequence; at Qwen2 vocab
    (V=152k) the naive log_softmax over full logits dominates memory. Same
    recipe as `chunked_causal_lm_loss`: scan over sequence chunks with the
    lm_head projection + log-softmax inside `jax.checkpoint`, accumulating a
    per-row (B,) sum. Applies the next-token shift internally.
    """
    from vila_tpu.models import qwen2

    h = hidden[:, :-1]
    t = labels[:, 1:]
    b, s, d = h.shape
    pad = (-s) % chunk_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        t = jnp.pad(t, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    n_chunks = h.shape[1] // chunk_size
    h = h.reshape(b, n_chunks, chunk_size, d).transpose(1, 0, 2, 3)
    t = t.reshape(b, n_chunks, chunk_size).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_logp(hc, tc):  # (B, C, D), (B, C) -> (B,)
        logits = qwen2.compute_logits(llm_params, llm_cfg, hc).astype(
            jnp.float32
        )
        valid = tc != IGNORE_INDEX
        safe = jnp.where(valid, tc, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, tl - logz, 0.0).sum(-1)

    def body(acc, xs):
        return acc + chunk_logp(*xs), None

    total, _ = jax.lax.scan(body, jnp.zeros((b,), jnp.float32), (h, t))
    return total


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


def dice_loss(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-6):
    """DICE loss over (N, H·W) flattened maps
    (LLaVATopDownTrainer.dice_loss, llava/train/llava_trainer.py:861-883)."""
    p = probs.reshape(probs.shape[0], -1).astype(jnp.float32)
    t = targets.reshape(targets.shape[0], -1).astype(jnp.float32)
    num = 2.0 * (p * t).sum(-1)
    den = p.sum(-1) + t.sum(-1)
    return 1.0 - (num + eps) / (den + eps)


def token_selection_loss(
    selection_probs,  # list of (N, g, g) f32 per high-res scale
    gt_selection_maps: jnp.ndarray,  # (N, H, W) binary; all-zero = no gt
) -> jnp.ndarray:
    """PS3 token-selection supervision: BCE + dice per scale, averaged over
    scales; instances without a gt map (all-zero) are masked out
    (LLaVATopDownTrainer.token_selection_loss, llava_trainer.py:885-915)."""
    from vila_tpu.models.ps3 import _area_resize

    gt_f = gt_selection_maps.astype(jnp.float32)
    has_gt = (gt_f.sum(axis=(-1, -2)) > 0).astype(jnp.float32)  # (N,)
    denom = jnp.maximum(has_gt.sum(), 1.0)

    total = jnp.zeros((), jnp.float32)
    for probs in selection_probs:
        g = probs.shape[1]
        gt = (_area_resize(gt_f, g, g) > 0).astype(jnp.float32)
        p = jnp.clip(probs.astype(jnp.float32), 1e-6, 1.0 - 1e-6)
        bce = -(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p))
        bce = (bce.mean(axis=(-1, -2)) * has_gt).sum() / denom
        dice = (dice_loss(p, gt) * has_gt).sum() / denom
        total = total + bce + dice
    return total / max(len(selection_probs), 1)
