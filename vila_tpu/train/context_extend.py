"""LLM context extension — LongVILA stage 4, under the SP mesh.

Capability parity: `longvila/train/4_extend_llm_{64k,256k,512k,1M}.sh` +
`llava/train/train_llm_to_long.py:85-111`: the LLM alone is trained on long
text chunks with (a) rope_theta raised (64k recipe: 15.3e6), (b) optional
linear RoPE position scaling, (c) LoRA low-rank updates that are merged
back into the base weights afterwards, then the VLM components are
re-assembled around the extended LLM.

TPU-first: the long sequences are sharded over a (sp × su) mesh and every
decoder attention runs the explicit zigzag-ring / hybrid MM-SP kernels
(vila_tpu.parallel.sp) — the same math the reference monkey-patches in via
zigzag ring flash-attn over NCCL — with base weights FSDP-sharded,
remat on the layer scan, and the chunked fused CE so neither the (S, S)
scores nor the (B, S, V) logits ever materialize.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


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
    # mesh: ring degree × Ulysses degree (sp_degree = sp × su)
    sp: int = 1
    su: int = 1
    ring_layout: str = "zigzag"
    remat: bool = True
    ce_chunk_size: int = 1024


def extend_llm(
    llm_params: Dict[str, Any],
    llm_cfg,
    text_batches,  # iterable of (B, S) int32 token arrays
    args: ContextExtendArgs,
):
    """Train LoRA factors on long chunks with extended RoPE; return
    (merged_params, extended_cfg, losses)."""
    from vila_tpu.constants import IGNORE_INDEX
    from vila_tpu.models import qwen2
    from vila_tpu.parallel import mesh as mesh_lib
    from vila_tpu.parallel.sp import SPConfig
    from vila_tpu.parallel.ring_attention import zigzag_order
    from vila_tpu.train import lora as lora_lib
    from vila_tpu.train.losses import causal_lm_loss, chunked_causal_lm_loss

    ext_cfg = dataclasses.replace(
        llm_cfg,
        rope_theta=args.rope_theta,
        rope_linear_scaling=args.rope_linear_scaling,
        max_position_embeddings=args.target_context,
        remat=args.remat,
    )

    sp_plan = None
    mesh = None
    if args.sp * args.su > 1:
        mesh = mesh_lib.make_mesh(sp=args.sp, su=args.su)
        sp_plan = SPConfig(mesh=mesh, ring_layout=args.ring_layout)

    lcfg = lora_lib.LoRAConfig(rank=args.lora_rank, alpha=args.lora_alpha)
    lora = lora_lib.init_lora(jax.random.PRNGKey(0), llm_params, lcfg)
    opt = optax.adamw(args.learning_rate)

    if mesh is not None:
        # FSDP-shard the frozen base; LoRA factors are tiny — replicate.
        param_sh = mesh_lib.to_shardings(
            mesh_lib.llm_param_specs(ext_cfg, mesh), mesh
        )
        llm_params = jax.tree.map(jax.device_put, llm_params, param_sh)
        replicated = NamedSharding(mesh, P())
        lora = jax.tree.map(lambda x: jax.device_put(x, replicated), lora)
        ids_sharding = NamedSharding(mesh, P(None, sp_plan.seq_axes))
    opt_state = opt.init(lora)

    base = {"llm": llm_params}

    def loss_fn(lo, ids, positions, labels):
        # labels are pre-shifted on the host (next-token target aligned to
        # position i) so the loss is layout-independent: shift=False.
        merged = lora_lib.apply_lora(
            jax.lax.stop_gradient(base), lo, lcfg
        )["llm"]
        if args.ce_chunk_size:
            hidden, _ = qwen2.forward(
                merged, ext_cfg, input_ids=ids, positions=positions,
                return_hidden=True, sp=sp_plan,
            )
            loss, _ = chunked_causal_lm_loss(
                hidden, merged, ext_cfg, labels,
                chunk_size=args.ce_chunk_size, shift=False,
            )
        else:
            logits, _ = qwen2.forward(
                merged, ext_cfg, input_ids=ids, positions=positions,
                sp=sp_plan,
            )
            loss, _ = causal_lm_loss(logits, labels, shift=False)
        return loss

    @jax.jit
    def step(lo, opt_state, ids, positions, labels):
        loss, g = jax.value_and_grad(loss_fn)(lo, ids, positions, labels)
        updates, opt_state = opt.update(g, opt_state, lo)
        lo = optax.apply_updates(lo, updates)
        return lo, opt_state, loss

    losses = []
    for i, ids in enumerate(text_batches):
        if i >= args.steps:
            break
        ids = np.asarray(ids, np.int32)
        s = ids.shape[1]
        positions = np.broadcast_to(
            np.arange(s, dtype=np.int32), ids.shape
        ).copy()
        labels = np.full_like(ids, IGNORE_INDEX)
        labels[:, :-1] = np.where(
            ids[:, 1:] >= 0, ids[:, 1:], IGNORE_INDEX
        )
        if sp_plan is not None and sp_plan.layout_for(s) == "zigzag":
            order = zigzag_order(s, sp_plan.ring_degree)
            ids = np.ascontiguousarray(ids[:, order])
            positions = np.ascontiguousarray(positions[:, order])
            labels = np.ascontiguousarray(labels[:, order])
        arrs = [jnp.asarray(x) for x in (ids, positions, labels)]
        if mesh is not None:
            arrs = [jax.device_put(x, ids_sharding) for x in arrs]
        lora, opt_state, loss = step(lora, opt_state, *arrs)
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
