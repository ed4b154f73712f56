"""AdamW with FP8-quantized moment states — COAT optimizer parity.

Capability parity: `CoatAdamW` and its fused CUDA kernels
(llava/model/coat/optimizer/fp8_adamw.py:33,
llava/model/coat/optimizer/kernels/*.cu): AdamW whose first moment is stored
in E4M3 and second moment in E5M2, with per-group (block-128) scales, cutting
optimizer memory 4x vs fp32 states.

TPU-first design: instead of hand-written CUDA, the quantize/dequantize are
plain XLA ops (ops/fp8.py) inside one jitted update — XLA fuses the dequant ->
adam math -> requant chain into a single HBM pass per parameter, which is what
the fused CUDA kernel buys on GPU.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vila_tpu.ops.fp8 import (
    DEFAULT_BLOCK,
    E4M3,
    E5M2,
    dequantize_blockwise,
    quantize_blockwise,
)


class QMoment(NamedTuple):
    q: jnp.ndarray  # (nb, block) fp8
    scale: jnp.ndarray  # (nb,) f32


class FP8AdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any  # pytree of QMoment
    nu: Any  # pytree of QMoment


def _quant(x, dtype, block):
    q, s, _ = quantize_blockwise(x, dtype, block)
    return QMoment(q, s)


def _dequant(qm: QMoment, shape):
    return dequantize_blockwise(qm.q, qm.scale, shape, jnp.float32)


def scale_by_fp8_adam(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block: int = DEFAULT_BLOCK,
) -> optax.GradientTransformation:
    """Adam scaling with E4M3 mu / E5M2 nu states (per-block scales)."""

    def init_fn(params):
        zeros = jax.tree.map(
            lambda p: _quant(jnp.zeros(p.shape, jnp.float32), E4M3, block),
            params,
        )
        zeros2 = jax.tree.map(
            lambda p: _quant(jnp.zeros(p.shape, jnp.float32), E5M2, block),
            params,
        )
        return FP8AdamWState(jnp.zeros((), jnp.int32), zeros, zeros2)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, qmu, qnu):
            g32 = g.astype(jnp.float32)
            mu = b1 * _dequant(qmu, g.shape) + (1.0 - b1) * g32
            nu = b2 * _dequant(qnu, g.shape) + (1.0 - b2) * jnp.square(g32)
            step = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            return (
                step.astype(g.dtype),
                _quant(mu, E4M3, block),
                _quant(nu, E5M2, block),
            )

        g_flat, treedef = jax.tree.flatten(updates)
        is_q = lambda x: isinstance(x, QMoment)
        mu_flat = jax.tree.leaves(state.mu, is_leaf=is_q)
        nu_flat = jax.tree.leaves(state.nu, is_leaf=is_q)
        triples = [upd(g, m, n) for g, m, n in zip(g_flat, mu_flat, nu_flat)]
        steps = treedef.unflatten([t[0] for t in triples])
        mus = treedef.unflatten([t[1] for t in triples])
        nus = treedef.unflatten([t[2] for t in triples])
        return steps, FP8AdamWState(count, mus, nus)

    return optax.GradientTransformation(init_fn, update_fn)


def fp8_adamw(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block: int = DEFAULT_BLOCK,
) -> optax.GradientTransformation:
    """Drop-in `optax.adamw` replacement with fp8 moment storage."""
    tx = [scale_by_fp8_adam(b1, b2, eps, block)]
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay))
    tx.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*tx)
