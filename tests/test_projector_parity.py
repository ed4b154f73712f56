"""Projector parity vs a torch replica of the reference nn.Sequential
(llava/model/multimodal_projector/base_projector.py:140-225)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vila_tpu.models import projector
from vila_tpu.utils.hf_import import convert_projector_state_dict

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def torch_flat_square(x, r):
    # Reference semantics (base_projector.py flat_square_{2x2,3x3}).
    n, w, h, c = x.size()
    if w % r != 0:
        x = torch.cat(
            [x, torch.zeros((n, r - w % r, h, c), dtype=x.dtype)], dim=1
        ).contiguous()
        n, w, h, c = x.size()
    if h % r != 0:
        x = torch.cat(
            [x, torch.zeros((n, w, r - h % r, c), dtype=x.dtype)], dim=2
        ).contiguous()
        n, w, h, c = x.size()
    x = x.view(n, w, int(h / r), int(c * r))
    x = x.permute(0, 2, 1, 3).contiguous()
    x = x.view(n, int(h / r), int(w / r), int(c * r * r))
    x = x.permute(0, 2, 1, 3).contiguous()
    return x


class TorchDown(nn.Module):
    def __init__(self, r):
        super().__init__()
        self.r = r

    def forward(self, x):
        n, s, c = x.shape
        side = int(s**0.5)
        x = x.reshape(n, side, side, c)
        x = torch_flat_square(x, self.r)
        return x.reshape(n, -1, x.shape[-1])


def build_torch_sequential(cfg: projector.ProjectorConfig) -> nn.Sequential:
    mods = []
    for op, din, dout in projector.build_spec(cfg):
        if op == "down2":
            mods.append(TorchDown(2))
        elif op == "down3":
            mods.append(TorchDown(3))
        elif op == "ln":
            mods.append(nn.LayerNorm(din))
        elif op == "linear":
            mods.append(nn.Linear(din, dout))
        elif op == "gelu":
            mods.append(nn.GELU())
    return nn.Sequential(*mods)


@pytest.mark.parametrize(
    "ptype",
    [
        "linear",
        "mlp_downsample",
        "mlp_downsample_3x3_fix",
        "mlp_downsample_3x3_s2",
        "mlp_downsample_3x3_s2_new",
        "mlp2x_gelu",
    ],
)
def test_projector_parity(ptype):
    cfg = projector.ProjectorConfig(
        projector_type=ptype, mm_hidden_size=48, hidden_size=32
    )
    torch.manual_seed(0)
    seq = build_torch_sequential(cfg).eval()
    state = {f"layers.{k}": v for k, v in seq.state_dict().items()}
    params = convert_projector_state_dict(state)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 36, 48)).astype(np.float32)  # 6x6 grid

    with torch.no_grad():
        ref = seq(torch.tensor(x)).numpy()
    got = projector.forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_flat_square_odd_padding():
    """Odd grid sizes are zero-padded exactly like the reference."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 5, 8)).astype(np.float32)
    ref = torch_flat_square(torch.tensor(x), 2).numpy()
    got = np.asarray(projector.flat_square(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, ref, atol=0)

    ref3 = torch_flat_square(torch.tensor(x), 3).numpy()
    got3 = np.asarray(projector.flat_square(jnp.asarray(x), 3))
    np.testing.assert_allclose(got3, ref3, atol=0)
