"""LLM context extension — LongVILA stage 4.

Capability parity: `longvila/train/4_extend_llm_{64k,256k,512k,1M}.sh` +
`llava/train/train_llm_to_long.py:85-111`: the LLM alone is trained on long
text chunks with (a) rope_theta raised (64k recipe: 15.3e6), (b) optional
linear RoPE position scaling, (c) LoRA low-rank updates that are merged
back into the base weights afterwards, then the VLM components are
re-assembled around the extended LLM.

TPU-first: ring attention over the mesh `sp` axis carries the long
sequences (the reference monkey-patches zigzag ring flash-attn over NCCL);
here the same `qwen2.forward` runs under shard_map via the standard
sharded train step — no patching.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class ContextExtendArgs:
    target_context: int = 65536
    rope_theta: float = 15.3e6  # 4_extend_llm_64k.sh:16
    rope_linear_scaling: float = 1.0
    lora_rank: int = 16
    lora_alpha: float = 32.0
    learning_rate: float = 2e-5
    steps: int = 40  # ctx-64k = 40 steps in the reference recipe
    seq_len: int = 65536
    sp: int = 1


def extend_llm(
    llm_params: Dict[str, Any],
    llm_cfg,
    text_batches,  # iterable of (B, S) int32 token arrays
    args: ContextExtendArgs,
):
    """Train LoRA factors on long chunks with extended RoPE; return
    (merged_params, extended_cfg, losses)."""
    from vila_tpu.constants import IGNORE_INDEX
    from vila_tpu.train import lora as lora_lib
    from vila_tpu.train.losses import causal_lm_loss
    from vila_tpu.models import qwen2

    ext_cfg = dataclasses.replace(
        llm_cfg,
        rope_theta=args.rope_theta,
        rope_linear_scaling=args.rope_linear_scaling,
        max_position_embeddings=args.target_context,
    )

    lcfg = lora_lib.LoRAConfig(rank=args.lora_rank, alpha=args.lora_alpha)
    lora = lora_lib.init_lora(jax.random.PRNGKey(0), llm_params, lcfg)
    opt = optax.adamw(args.learning_rate)
    opt_state = opt.init(lora)

    base = {"llm": llm_params}

    def loss_fn(lo, ids):
        merged = lora_lib.apply_lora(
            jax.lax.stop_gradient(base), lo, lcfg
        )["llm"]
        logits, _ = qwen2.forward(merged, ext_cfg, input_ids=ids)
        labels = jnp.where(ids >= 0, ids, IGNORE_INDEX)
        loss, _ = causal_lm_loss(logits, labels)
        return loss

    @jax.jit
    def step(lo, opt_state, ids):
        loss, g = jax.value_and_grad(loss_fn)(lo, ids)
        updates, opt_state = opt.update(g, opt_state, lo)
        lo = optax.apply_updates(lo, updates)
        return lo, opt_state, loss

    losses = []
    for i, ids in enumerate(text_batches):
        if i >= args.steps:
            break
        lora, opt_state, loss = step(lora, opt_state, jnp.asarray(ids))
        losses.append(float(loss))

    merged = lora_lib.merge_lora(base, lora, lcfg)["llm"]
    return merged, ext_cfg, losses


def chunk_text_dataset(
    token_stream: np.ndarray, seq_len: int, batch: int = 1
):
    """SlimPajama-style chunking: a flat token stream -> (B, S) batches
    (train_llm_to_long.py's chunked loader)."""
    n = (len(token_stream) // (seq_len * batch)) * seq_len * batch
    arr = np.asarray(token_stream[:n], np.int32).reshape(-1, batch, seq_len)
    for b in arr:
        yield b
