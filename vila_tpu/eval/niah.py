"""Needle-in-a-haystack long-context eval over a sequence-parallel mesh.

Capability parity: `llava/eval/vision_niah_vila/` —
`produce_haystack_embedding.py` (vision tower over N frames -> embeddings),
`produce_needle_embedding.py`, and `eval_vision_niah.py` (zigzag-ring-attn
multi-GPU inference over ~1M-token embeds, accuracy heatmap over
(context length, needle depth)).

TPU-first: instead of monkey-patched ring attention over NCCL ranks, the
embedding sequence is sharded over the mesh `sp` axis and the decoder runs
under `shard_map` with the ppermute ring attention kernel
(vila_tpu.parallel.ring_attention). Single-host testable with the virtual
CPU mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class NIAHConfig:
    context_lengths: Sequence[int] = (1024, 2048)
    depths: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0)
    answer_len: int = 8


def build_haystack_embeddings(
    params: Dict[str, Any], cfg, frames: np.ndarray, batch_tiles: int = 8
) -> jnp.ndarray:
    """Vision tower + projector over frames -> (N * tokens_per_image, D).

    Mirrors produce_haystack_embedding.py (frame-batched encode)."""
    from vila_tpu.models import vlm

    outs = []
    for i in range(0, frames.shape[0], batch_tiles):
        chunk = jnp.asarray(frames[i : i + batch_tiles])
        feats = vlm.encode_images(params, cfg, chunk)
        outs.append(feats.reshape(-1, feats.shape[-1]))
    return jnp.concatenate(outs)


def splice_needle(
    haystack: jnp.ndarray,  # (S, D) embeddings
    needle: jnp.ndarray,  # (T, D)
    depth: float,
) -> Tuple[jnp.ndarray, int]:
    """Insert needle embeddings at a relative depth. Returns (seq, pos)."""
    s = haystack.shape[0]
    pos = int(depth * s)
    out = jnp.concatenate([haystack[:pos], needle, haystack[pos:]])
    return out, pos


def forward_embeds_sharded(
    llm_params: Dict[str, Any],
    llm_cfg,
    embeds: jnp.ndarray,  # (1, S, D) — S divisible by the SP degree
    mesh,
    positions: Optional[jnp.ndarray] = None,
    ring_layout: str = "zigzag",
) -> jnp.ndarray:
    """Causal forward over pre-computed embeddings with the sequence sharded
    on the mesh sequence axes, running **explicit ring/hybrid attention**
    (vila_tpu.parallel.sp) inside every decoder layer — per-device attention
    memory is O(S_local · S_local) per ring step, never the full (S, S)
    scores. Returns logits (1, S, V) in the original token order.

    TPU equivalent of eval_vision_niah.py's zigzag-ring monkey-patch
    (llava/eval/vision_niah_vila/zigzag_ring_attn/monkey_patch.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vila_tpu.models import qwen2
    from vila_tpu.parallel.sp import SPConfig
    from vila_tpu.parallel.ring_attention import (
        inverse_zigzag_order,
        zigzag_order,
    )

    s = embeds.shape[1]
    if positions is None:
        positions = jnp.arange(s, dtype=jnp.int32)[None, :]

    sp_plan = None
    seq_spec: Any = None
    if mesh is not None and hasattr(mesh, "axis_names"):
        sp_plan = SPConfig(mesh=mesh, ring_layout=ring_layout)
        if not sp_plan.active:
            sp_plan = None
        else:
            assert s % sp_plan.degree == 0, (s, sp_plan.degree)
            seq_spec = P(None, sp_plan.seq_axes)

    layout = sp_plan.layout_for(s) if sp_plan is not None else "contiguous"
    if layout == "zigzag":
        order = zigzag_order(s, sp_plan.ring_degree)
        inv = inverse_zigzag_order(s, sp_plan.ring_degree)
        embeds = embeds[:, order]
        positions = positions[:, order]

    def fwd(p, e, pos):
        logits, _ = qwen2.forward(
            p, llm_cfg, inputs_embeds=e, positions=pos,
            attn_impl="auto", sp=sp_plan,
        )
        return logits

    if sp_plan is None:
        return jax.jit(fwd)(llm_params, embeds, positions)

    fn = jax.jit(
        fwd,
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P(None, sp_plan.seq_axes, None)),
            NamedSharding(mesh, P(None, sp_plan.seq_axes)),
        ),
        out_shardings=NamedSharding(mesh, P(None, sp_plan.seq_axes, None)),
    )
    logits = fn(llm_params, embeds, positions)
    if layout == "zigzag":
        logits = logits[:, inv]
    return logits


def run_niah(
    llm_params: Dict[str, Any],
    llm_cfg,
    haystack: jnp.ndarray,  # (S_max, D)
    needle: jnp.ndarray,  # (T, D)
    answer_ids: np.ndarray,  # (A,) token ids the model should produce
    niah: NIAHConfig,
    mesh=None,
    query: Optional[jnp.ndarray] = None,  # (Q, D) retrieval cue at the end
) -> List[Dict[str, Any]]:
    """Evaluate retrieval accuracy over (context_length, depth) grid.

    Accuracy = fraction of answer tokens greedily predicted at the needle's
    position (teacher-forced, like eval_vision_niah.py's argmax check).

    `query` embeddings, when given, are appended after the spliced haystack
    and before the teacher-forced answer — the "what was the secret?"
    question of a text NIAH (eval_vision_niah.py's `question_embedding`)."""
    results = []
    a = len(answer_ids)
    qn = 0 if query is None else query.shape[0]
    for ctx in niah.context_lengths:
        hs = haystack[: ctx - needle.shape[0] - qn - a]
        for depth in niah.depths:
            seq, pos = splice_needle(hs, needle, depth)
            if query is not None:
                seq = jnp.concatenate([seq, query])
            # teacher-forced answer embeddings appended at the end
            from vila_tpu.models import qwen2

            ans_embeds = qwen2.embed_tokens(
                llm_params, llm_cfg, jnp.asarray(answer_ids[None])
            )[0]
            full = jnp.concatenate([seq, ans_embeds])[None]
            if mesh is not None:
                sp = mesh.shape.get("sp", 1) * mesh.shape.get("su", 1)
                # 2·sp multiple so the zigzag ring layout applies
                pad = (-full.shape[1]) % max(2 * sp, 1)
                if pad:
                    full = jnp.pad(full, ((0, 0), (0, pad), (0, 0)))
            logits = forward_embeds_sharded(
                llm_params, llm_cfg, full, mesh
            )
            start = seq.shape[0] - 1
            pred = np.asarray(
                jnp.argmax(logits[0, start : start + a], axis=-1)
            )
            acc = float((pred == answer_ids).mean())
            results.append(
                {"context": int(ctx), "depth": float(depth), "acc": acc}
            )
    return results


