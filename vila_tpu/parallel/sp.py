"""MM-SP model integration: sequence-parallel attention inside the decoder.

Capability parity: the reference wires hybrid Ulysses×Ring attention into
every LLM attention call by monkey-patching HF's `_flash_attention_forward`
(llava/train/sequence_parallel/monkey_patch.py:133-239, hybrid_attn.py:93-190).
The TPU equivalent is explicit: `qwen2.forward(..., sp=SPConfig)` routes the
per-layer attention through a `shard_map` over the mesh's sequence axes,
calling the differentiable ring/Ulysses/hybrid kernels in
vila_tpu.parallel.ring_attention. No patching, no global state.

Mesh convention (vila_tpu.parallel.mesh): axes ("dp", "sp", "su", "tp") with
`sp` = ring axis (outer, contiguous sequence chunks) and `su` = Ulysses axis
(inner). sp_degree = ring × ulysses, matching the reference's
`sp = ring_degree × ulysses_degree` (globals.py:41-43).

Zigzag layout: the host permutes each batch row with `zigzag_order(S, ring)`
before feeding the device (`zigzag_batch`); device r of the ring then owns
global chunks (r, 2·ring−1−r), the causal load-balance layout of
ring/zigzag_ring_flash_attn_varlen.py:31-63.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from vila_tpu.parallel.ring_attention import (
    hybrid_attention,
    ring_flash_attention,
    ulysses_attention,
    zigzag_order,
)


@dataclasses.dataclass(frozen=True)
class SPConfig:
    """Static sequence-parallel plan threaded into qwen2.forward.

    mesh axes used: `ring_axis` (outer sequence chunks, ppermute ring),
    `ulysses_axis` (inner, head-scatter all-to-all), `dp_axis` (batch),
    `head_axis` (tensor-parallel head split, or None to replicate heads).
    """

    mesh: Mesh
    ring_axis: str = "sp"
    ulysses_axis: str = "su"
    dp_axis: str = "dp"
    head_axis: Optional[str] = "tp"
    ring_layout: str = "zigzag"  # "contiguous" | "zigzag"
    impl: str = "auto"

    @property
    def ring_degree(self) -> int:
        return self.mesh.shape.get(self.ring_axis, 1)

    @property
    def ulysses_degree(self) -> int:
        return self.mesh.shape.get(self.ulysses_axis, 1)

    @property
    def degree(self) -> int:
        return self.ring_degree * self.ulysses_degree

    @property
    def seq_axes(self):
        """Mesh axes the sequence dim is sharded over (ring major). Axes
        absent from the mesh (e.g. a pure-ring 1-axis mesh) are skipped."""
        return tuple(
            a
            for a in (self.ring_axis, self.ulysses_axis)
            if a in self.mesh.axis_names
        )

    @property
    def active(self) -> bool:
        return self.degree > 1

    def layout_for(self, seq_len: int) -> str:
        """Zigzag needs each ring shard to split in half; fall back to the
        contiguous layout when shapes don't allow it."""
        if self.ring_layout != "zigzag" or self.ring_degree == 1:
            return "contiguous"
        if seq_len % (2 * self.degree) != 0:
            return "contiguous"
        return "zigzag"


def sp_attention(
    q: jnp.ndarray,  # (B, S, Hq, D) — global shapes (inside jit)
    k: jnp.ndarray,  # (B, S, Hkv, D)
    v: jnp.ndarray,
    sp: SPConfig,
    *,
    causal: bool = True,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S)
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Sequence-parallel attention: shard_map over (dp, ring, ulysses[, tp]).

    Replaces `multi_head_attention` for the cache-free (training / long
    prefill) path when SP is active. Differentiable: the ring carries a
    custom VJP, Ulysses' collectives transpose natively.
    """
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    mesh = sp.mesh
    layout = sp.layout_for(s)

    dp_ax = sp.dp_axis if sp.dp_axis in mesh.axis_names else None
    if dp_ax is not None and b % mesh.shape[dp_ax] != 0:
        dp_ax = None
    head_ax = (
        sp.head_axis
        if sp.head_axis is not None and sp.head_axis in mesh.axis_names
        else None
    )
    if head_ax is not None:
        n_tp = mesh.shape[head_ax]
        if hq % n_tp or hkv % n_tp:
            head_ax = None  # replicate heads; attention is head-parallel

    n_u = sp.ulysses_degree
    local_hq = hq // (mesh.shape.get(head_ax, 1) if head_ax else 1)
    if n_u > 1 and local_hq % n_u != 0:
        raise ValueError(
            f"Ulysses degree {n_u} must divide the {local_hq} local query "
            f"heads (reference replicates KV heads only: ulysses_attn.py:26)"
        )

    qspec = P(dp_ax, sp.seq_axes, head_ax, None)
    seg_spec = P(dp_ax, sp.seq_axes)

    ring_axis, ulysses_axis = sp.ring_axis, sp.ulysses_axis
    n_r = sp.ring_degree
    impl = sp.impl

    def local(q_, k_, v_, seg_):
        if n_u > 1 and n_r > 1:
            return hybrid_attention(
                q_, k_, v_, ulysses_axis, ring_axis,
                causal=causal, q_segment_ids=seg_, kv_segment_ids=seg_,
                impl=impl, ring_layout=layout,
            )
        if n_u > 1:
            return ulysses_attention(
                q_, k_, v_, ulysses_axis,
                causal=causal, q_segment_ids=seg_, kv_segment_ids=seg_,
                impl=impl,
            )
        return ring_flash_attention(
            q_, k_, v_, ring_axis,
            causal=causal, q_segment_ids=seg_, kv_segment_ids=seg_,
            impl=impl, layout=layout,
        )

    if segment_ids is None:
        fn = jax.shard_map(
            lambda q_, k_, v_: local(q_, k_, v_, None),
            mesh=mesh,
            in_specs=(qspec, qspec, qspec),
            out_specs=qspec,
            check_vma=False,
        )
        return fn(q, k, v)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(qspec, qspec, qspec, seg_spec),
        out_specs=qspec,
        check_vma=False,
    )
    return fn(q, k, v, segment_ids)


# --------------------------------------------------------------------------
# Host-side batch layout for the zigzag ring
# --------------------------------------------------------------------------

_SEQ_KEYS = ("input_ids", "labels", "positions", "segment_ids", "token_valid")


def shift_labels(labels: np.ndarray, ignore_index: int = -100) -> np.ndarray:
    """labels[i] := labels[i+1] (next-token target aligned to position i)."""
    out = np.full_like(labels, ignore_index)
    out[:, :-1] = labels[:, 1:]
    return out


def zigzag_batch(
    batch: Dict[str, np.ndarray], sp: SPConfig
) -> Dict[str, np.ndarray]:
    """Permute a collated batch into the zigzag ring layout (host side).

    Every per-token array is reordered with `zigzag_order(S, ring)` applied
    at ring-chunk granularity (the Ulysses inner split is order-preserving),
    and `media_positions` are remapped so the media scatter still lands on
    the right tokens. RoPE positions travel with their tokens, so rotary
    phases stay exact; only the ring's work distribution changes
    (ref: zigzag_ring_flash_attn_varlen.py:31-63).

    `labels` are **pre-shifted** before permuting (labels[i] := labels[i+1]
    in the original order) because array order is no longer causal order —
    consumers must call the loss with shift=False, which
    `train.step.loss_fn` does automatically whenever the zigzag layout is
    in effect for the batch's sequence length.
    """
    seq_arrays = [batch[k] for k in _SEQ_KEYS if k in batch]
    if not seq_arrays:
        return batch
    s = seq_arrays[0].shape[1]
    if sp.layout_for(s) != "zigzag":
        return batch
    order = zigzag_order(s, sp.ring_degree)
    inv = np.empty_like(order)
    inv[order] = np.arange(s)

    out = dict(batch)
    if "labels" in out:
        out["labels"] = shift_labels(out["labels"])
    for key in _SEQ_KEYS:
        if key in out:
            out[key] = np.ascontiguousarray(out[key][:, order])
    mp = out.get("media_positions")
    if mp is not None:
        # row-local indices; OOB sentinels stay OOB
        out["media_positions"] = np.where(mp < s, inv[np.clip(mp, 0, s - 1)], mp)
    return out


def unzigzag_logits(logits: jnp.ndarray, sp: SPConfig) -> jnp.ndarray:
    """Undo the zigzag permutation on a (B, S, ...) device array."""
    s = logits.shape[1]
    if sp.layout_for(s) != "zigzag":
        return logits
    inv = np.empty(s, np.int32)
    inv[zigzag_order(s, sp.ring_degree)] = np.arange(s)
    return logits[:, inv]
