"""Multimodal projector — NVILA's token-compression module, functional JAX.

Capability parity: llava/model/multimodal_projector/base_projector.py.
Supports every reference variant: `identity`, `linear`, `mlp_downsample`,
`mlp_downsample_2x2_fix`, `mlp_downsample_3x3_fix`, `mlp_downsample_3x3_s2`,
`mlp_downsample_3x3_s2_new`, `mlp{N}x_gelu`.

The 2x2/3x3 "flat_square" spatial downsample is a pure layout transform
(pixel-unshuffle with the reference's exact channel ordering,
base_projector.py:84-125) — on TPU it lowers to reshape/transpose which XLA
fuses into the following LayerNorm+GEMM.

Parameters are keyed by the reference's nn.Sequential indices ("1", "2", ...)
so HF projector checkpoints map 1:1 (see utils/hf_import.py).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from vila_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    projector_type: str = "mlp_downsample"
    mm_hidden_size: int = 1152  # vision feature dim (x num_scales for S2)
    hidden_size: int = 1536  # LLM embedding dim
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def downsample_rate(self) -> int:
        if self.projector_type in ("mlp_downsample", "mlp_downsample_2x2_fix"):
            return 2
        if self.projector_type.startswith("mlp_downsample_3x3"):
            return 3
        return 1


def _pad_to_multiple(x: jnp.ndarray, m: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    ph = (m - h % m) % m
    pw = (m - w % m) % m
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x


def flat_square(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Reference pixel-unshuffle (base_projector.py flat_square_{2x2,3x3}).

    x: (N, H, W, C) -> (N, H/r, W/r, C*r*r) with the reference's exact
    channel interleaving (adjacent columns first, then adjacent rows).
    """
    x = _pad_to_multiple(x, r)
    n, h, w, c = x.shape
    x = x.reshape(n, h, w // r, c * r)
    x = x.transpose(0, 2, 1, 3)  # (n, w/r, h, c*r)
    x = x.reshape(n, w // r, h // r, c * r * r)
    x = x.transpose(0, 2, 1, 3)  # (n, h/r, w/r, c*r*r)
    return x


Spec = List[Tuple[str, int, int]]  # (op, dim_in, dim_out)


def build_spec(cfg: ProjectorConfig) -> Spec:
    m, h = cfg.mm_hidden_size, cfg.hidden_size
    t = cfg.projector_type
    if t == "identity":
        return []
    if t == "linear":
        return [("linear", m, h)]
    if t in ("mlp_downsample", "mlp_downsample_2x2_fix"):
        return [
            ("down2", 0, 0),
            ("ln", 4 * m, 4 * m),
            ("linear", 4 * m, h),
            ("gelu", 0, 0),
            ("linear", h, h),
        ]
    if t == "mlp_downsample_3x3_fix":
        return [
            ("down3", 0, 0),
            ("ln", 9 * m, 9 * m),
            ("linear", 9 * m, 3 * m),
            ("gelu", 0, 0),
            ("ln", 3 * m, 3 * m),
            ("linear", 3 * m, h),
            ("gelu", 0, 0),
            ("linear", h, h),
        ]
    if t == "mlp_downsample_3x3_s2":
        dims = [9 * m, 3 * m, m, m // 3, h, h]
    elif t == "mlp_downsample_3x3_s2_new":
        dims = [9 * m, 4 * m, 2 * m, m, m // 3, h, h]
    else:
        match = re.match(r"^mlp(\d+)x_gelu$", t)
        if match:
            depth = int(match.group(1))
            spec: Spec = [("linear", m, h)]
            for _ in range(1, depth):
                spec += [("gelu", 0, 0), ("linear", h, h)]
            return spec
        raise ValueError(f"unknown projector type: {t}")

    # The *_s2 family: down3x3 then alternating [ln, linear, gelu] blocks,
    # ending with a plain linear (no trailing gelu+ln before it).
    spec = [("down3", 0, 0)]
    for i in range(len(dims) - 2):
        spec.append(("ln", dims[i], dims[i]))
        spec.append(("linear", dims[i], dims[i + 1]))
        spec.append(("gelu", 0, 0))
    spec.append(("linear", dims[-2], dims[-1]))
    return spec


def init_params(rng: jax.Array, cfg: ProjectorConfig, param_dtype=jnp.float32) -> Params:
    spec = build_spec(cfg)
    params: Params = {}
    keys = iter(jax.random.split(rng, max(len(spec), 1)))
    for i, (op, din, dout) in enumerate(spec):
        if op == "linear":
            params[str(i)] = {
                "kernel": (
                    0.02 * jax.random.normal(next(keys), (din, dout), jnp.float32)
                ).astype(param_dtype),
                "bias": jnp.zeros((dout,), param_dtype),
            }
        elif op == "ln":
            params[str(i)] = {
                "scale": jnp.ones((din,), param_dtype),
                "bias": jnp.zeros((din,), param_dtype),
            }
    return params


def forward(params: Params, cfg: ProjectorConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: (N, S, mm_hidden) with S a perfect square per image/tile.

    Returns (N, S / rate^2, hidden).
    """
    dtype = cfg.compute_dtype
    x = x.astype(dtype)
    for i, (op, _, _) in enumerate(build_spec(cfg)):
        if op in ("down2", "down3"):
            r = 2 if op == "down2" else 3
            n, s, c = x.shape
            side = int(round(s**0.5))
            assert side * side == s, f"projector input not square: {s}"
            x = flat_square(x.reshape(n, side, side, c), r)
            x = x.reshape(n, -1, x.shape[-1])
        elif op == "ln":
            p = params[str(i)]
            x = layer_norm(x, p["scale"], p["bias"], eps=1e-5)
        elif op == "linear":
            p = params[str(i)]
            x = jnp.dot(x, p["kernel"].astype(dtype)) + p["bias"].astype(dtype)
        elif op == "gelu":
            x = jax.nn.gelu(x, approximate=False)
    return x
