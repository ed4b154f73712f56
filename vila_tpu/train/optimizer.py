"""Optimizer construction: AdamW with per-module learning rates and
tune-flag freezing.

Capability parity: `LLaVATrainer.create_optimizer` grouped parameters with
`mm_projector_lr` / `vision_tower_lr` (llava/train/llava_trainer.py:667-806)
and the `tune_{language_model,vision_tower,mm_projector}` freeze flags
(llava/train/train.py:690-750), expressed as `optax.multi_transform`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None
    vision_tower_lr: Optional[float] = None
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    schedule: str = "cosine"  # cosine | linear | constant
    max_grad_norm: float = 1.0
    optimizer: str = "adamw"  # adamw | fp8_adamw (COAT-parity fp8 states)
    tune_language_model: bool = True
    tune_vision_tower: bool = True
    tune_mm_projector: bool = True


def make_schedule(cfg: OptimizerConfig, peak_lr: float):
    warmup = max(int(cfg.warmup_ratio * cfg.total_steps), 1)
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, peak_lr, warmup, max(cfg.total_steps, warmup + 1)
        )
    if cfg.schedule == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, peak_lr, warmup),
                optax.linear_schedule(
                    peak_lr, 0.0, max(cfg.total_steps - warmup, 1)
                ),
            ],
            [warmup],
        )
    return optax.constant_schedule(peak_lr)


def _adamw(cfg: OptimizerConfig, lr: float):
    if cfg.optimizer == "fp8_adamw":
        from vila_tpu.train.fp8_adamw import fp8_adamw

        inner = fp8_adamw(
            make_schedule(cfg, lr),
            b1=cfg.b1,
            b2=cfg.b2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    else:
        inner = optax.adamw(
            make_schedule(cfg, lr),
            b1=cfg.b1,
            b2=cfg.b2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm), inner
    )


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """AdamW with component-wise lr/freeze (mirrors grouped param logic)."""
    transforms: Dict[str, optax.GradientTransformation] = {
        "llm": _adamw(cfg, cfg.learning_rate)
        if cfg.tune_language_model
        else optax.set_to_zero(),
        "vision_tower": _adamw(cfg, cfg.vision_tower_lr or cfg.learning_rate)
        if cfg.tune_vision_tower
        else optax.set_to_zero(),
        "mm_projector": _adamw(cfg, cfg.mm_projector_lr or cfg.learning_rate)
        if cfg.tune_mm_projector
        else optax.set_to_zero(),
    }

    def label_fn(params):
        return {k: jax.tree.map(lambda _: k, v) for k, v in params.items()}

    return optax.multi_transform(transforms, label_fn)
