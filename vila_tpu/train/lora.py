"""LoRA / DoRA low-rank adaptation — functional JAX.

Capability parity: the reference's peft integration (`lora_enable`,
`get_peft_state_maybe_zero_3`, llava/train/train.py:690-800) and the
LoRA-merge tooling (`llava/utils/merge_lora_weights_and_save_hf_model.py`).

TPU-first design: instead of wrapping modules (torch peft), LoRA is a
*parameter pytree transform*. Base params stay frozen; a parallel pytree of
(A, B) factors is the only trainable state. `apply_lora` materializes
`W + (alpha/r) * A @ B` functionally inside the loss, so the same model
forward code runs unchanged and XLA fuses the rank-r update into the
parameter load. `merge_lora` produces plain merged weights for saving.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# LLM linear slots eligible for adaptation (stacked (L, din, dout) kernels).
DEFAULT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 32.0
    targets: Sequence[str] = DEFAULT_TARGETS
    use_dora: bool = False  # weight-norm decomposed variant

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _target_kernels(llm_params: Params, cfg: LoRAConfig):
    """Yield (name, kernel) for each adapted stacked kernel (L, din, dout)."""
    for name in cfg.targets:
        slot = llm_params["layers"].get(name)
        if slot is not None and "kernel" in slot:
            yield name, slot["kernel"]


def init_lora(
    rng: jax.Array, llm_params: Params, cfg: LoRAConfig,
    param_dtype=jnp.float32,
) -> Params:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 — the standard LoRA init so the
    adapted model starts exactly at the base model."""
    lora: Params = {}
    names = [n for n, _ in _target_kernels(llm_params, cfg)]
    keys = jax.random.split(rng, max(len(names), 1))
    for key, name in zip(keys, names):
        k = llm_params["layers"][name]["kernel"]
        L, din, dout = k.shape
        a = jax.random.normal(key, (L, din, cfg.rank), jnp.float32)
        a = (a / jnp.sqrt(cfg.rank)).astype(param_dtype)
        entry = {
            "a": a,
            "b": jnp.zeros((L, cfg.rank, dout), param_dtype),
        }
        if cfg.use_dora:
            # DoRA: trainable per-column magnitude, init to ||W||_col.
            entry["magnitude"] = jnp.linalg.norm(
                k.astype(jnp.float32), axis=1
            ).astype(param_dtype)
        lora[name] = entry
    return lora


def _merged_kernel(kernel, entry, cfg: LoRAConfig):
    w = kernel.astype(jnp.float32)
    delta = cfg.scale * jnp.einsum(
        "lir,lro->lio",
        entry["a"].astype(jnp.float32),
        entry["b"].astype(jnp.float32),
    )
    merged = w + delta
    if cfg.use_dora and "magnitude" in entry:
        norm = jnp.linalg.norm(merged, axis=1, keepdims=True)
        merged = merged / jnp.maximum(norm, 1e-6) * entry["magnitude"][
            :, None, :
        ].astype(jnp.float32)
    return merged.astype(kernel.dtype)


def apply_lora(params: Params, lora: Params, cfg: LoRAConfig) -> Params:
    """Return a params pytree with adapted kernels (non-destructive)."""
    llm = dict(params["llm"])
    layers = dict(llm["layers"])
    for name, entry in lora.items():
        slot = dict(layers[name])
        slot["kernel"] = _merged_kernel(slot["kernel"], entry, cfg)
        layers[name] = slot
    llm["layers"] = layers
    out = dict(params)
    out["llm"] = llm
    return out


# merge == apply; separate name for the save-time contract
merge_lora = apply_lora


def lora_loss_fn(base_params: Params, cfg_vlm, lora_cfg: LoRAConfig):
    """Wrap the standard loss so only LoRA factors receive gradients."""
    from vila_tpu.train.step import loss_fn

    def fn(lora: Params, batch, ce_chunk_size: Optional[int] = None):
        merged = apply_lora(
            jax.lax.stop_gradient(base_params), lora, lora_cfg
        )
        return loss_fn(merged, cfg_vlm, batch, ce_chunk_size)

    return fn
