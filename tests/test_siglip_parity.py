"""SigLIP vision tower parity vs HF transformers (torch CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vila_tpu.models import siglip
from vila_tpu.utils.hf_import import convert_siglip_state_dict

torch = pytest.importorskip("torch")


def make_tiny_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()
    cfg = siglip.SigLIPConfig.from_hf_config(hf_cfg.to_dict())
    params = convert_siglip_state_dict(model.state_dict(), cfg)
    return model, cfg, params


@pytest.mark.parametrize("feature_layer", [-2, -1])
def test_hidden_state_parity(feature_layer):
    model, cfg, params = make_tiny_siglip()
    rng = np.random.default_rng(0)
    # (B, C, H, W) in [-1, 1] as the siglip processor produces.
    pix_t = rng.uniform(-1, 1, size=(2, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        out = model(torch.tensor(pix_t), output_hidden_states=True)
    if feature_layer == -1:
        ref = out.last_hidden_state.numpy()  # post_layernorm applied
    else:
        ref = out.hidden_states[feature_layer].numpy()

    pix_j = jnp.asarray(pix_t.transpose(0, 2, 3, 1))  # NHWC
    got = siglip.forward(
        params, cfg, pix_j, feature_layer=feature_layer, select="cls_patch"
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_select_patch_drops_first_token():
    _, cfg, params = make_tiny_siglip()
    rng = np.random.default_rng(1)
    pix = jnp.asarray(rng.uniform(-1, 1, size=(1, 56, 56, 3)).astype(np.float32))
    full = siglip.forward(params, cfg, pix, select="cls_patch")
    patch = siglip.forward(params, cfg, pix, select="patch")
    np.testing.assert_array_equal(np.asarray(full[:, 1:]), np.asarray(patch))


def test_pos_embed_resize_matches_reference_math():
    """Linear pos-embed interpolation (vision_encoder.py:54-131)."""
    _, cfg, params = make_tiny_siglip()
    pe = params["position_embedding"]["embedding"]  # (16, 64)
    new = np.asarray(siglip.resize_position_embedding(jnp.asarray(pe), 31))

    # NOTE: the reference formula `(m-lo)*e[hi] + (hi-m)*e[lo]`
    # (vision_encoder.py:104-110) degenerates to 0 when m is an exact
    # integer (lo == hi). We implement the intended interpolation instead:
    # frac*e[hi] + (1-frac)*e[lo], identical everywhere else.
    old_n = pe.shape[0]
    mapped = np.arange(31) / 30 * (old_n - 1)
    lo = np.clip(np.floor(mapped).astype(int), 0, old_n - 1)
    hi = np.clip(np.ceil(mapped).astype(int), 0, old_n - 1)
    frac = (mapped - lo)[:, None]
    ref = frac * pe[hi] + (1.0 - frac) * pe[lo]
    np.testing.assert_allclose(new, ref, atol=1e-5)
