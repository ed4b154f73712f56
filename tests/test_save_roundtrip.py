"""Checkpoint save -> load roundtrip through the public API."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


def test_save_load_roundtrip(tmp_path):
    from helpers import save_tiny_checkpoint

    import vila_tpu
    from vila_tpu.inference.generate import GenerationConfig

    src = str(tmp_path / "src")
    os.makedirs(src)
    with torch.no_grad():
        save_tiny_checkpoint(src)
    engine = vila_tpu.load(src)

    out_dir = str(tmp_path / "resaved")
    vila_tpu.save(engine.params, engine.cfg, engine.tokenizer, out_dir)
    for sub in ("llm", "vision_tower", "mm_projector"):
        assert os.path.isdir(os.path.join(out_dir, sub)), sub

    engine2 = vila_tpu.load(out_dir)
    gc = GenerationConfig(max_new_tokens=6)
    from PIL import Image as PILImage

    img = PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (48, 60, 3), np.uint8)
    )
    prompt = [vila_tpu.Image(img), "hello"]
    a = engine.generate_content(prompt, gc)
    b = engine2.generate_content(prompt, gc)
    assert a == b, (a, b)
