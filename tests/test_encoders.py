"""Media encoder tests: TSP pooling numerics + end-to-end video generate."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vila_tpu.models.encoders import tsp_pool, tsp_tokens_per_video


def test_tsp_pool_matches_manual():
    rng = np.random.default_rng(0)
    t, nl, d = 4, 4, 6
    feats = jnp.asarray(rng.normal(size=(t, nl * nl, d)).astype(np.float32))
    out = tsp_pool(feats, (2, 2, 2))
    assert out.shape == (2, 4, d)

    # manual: reshape (t, nl, nl, d), average 2x2x2 blocks
    x = np.asarray(feats).reshape(t, nl, nl, d)
    manual = np.zeros((2, 2, 2, d), np.float32)
    for a in range(2):
        for b in range(2):
            for c in range(2):
                manual[a, b, c] = x[
                    2 * a : 2 * a + 2, 2 * b : 2 * b + 2, 2 * c : 2 * c + 2
                ].mean(axis=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out), manual.reshape(2, 4, d), rtol=1e-6
    )


def test_tsp_pool_identity():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 9, 3)).astype(np.float32))
    out = tsp_pool(feats, (1, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats))


def test_tsp_token_count():
    import dataclasses

    from vila_tpu.models import projector, qwen2, siglip, vlm

    llm = qwen2.LLMConfig(hidden_size=32, num_attention_heads=4,
                          num_key_value_heads=2, intermediate_size=64,
                          num_hidden_layers=2, vocab_size=64)
    vis = siglip.SigLIPConfig(hidden_size=24, intermediate_size=48,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=56, patch_size=14)
    proj = projector.ProjectorConfig(projector_type="mlp_downsample",
                                     mm_hidden_size=24, hidden_size=32)
    cfg = vlm.VLMConfig(llm=llm, vision=vis, projector=proj)
    # 56/14 = 4 patches/side, 2x2 downsample -> 2x2 grid = 4 tokens/image
    assert cfg.tokens_per_image == 4
    assert tsp_tokens_per_video(cfg, 8, [(2, 1, 1)]) == 4 * 4
    assert tsp_tokens_per_video(cfg, 8, [(2, 1, 1), (4, 2, 2)]) == 16 + 2


def test_video_tsp_generate_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from helpers import save_tiny_checkpoint

    import vila_tpu
    from vila_tpu.inference.generate import GenerationConfig

    path = str(tmp_path)
    with torch.no_grad():
        save_tiny_checkpoint(path)

    engine = vila_tpu.load(path)
    import dataclasses

    engine.cfg = dataclasses.replace(
        engine.cfg, video_encoder="tsp", tsp_pool_sizes=((2, 1, 1),),
        num_video_frames=4,
    )

    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 255, (40, 52, 3), np.uint8) for _ in range(4)
    ]
    video = vila_tpu.Video(frames)
    inputs = engine.prepare_inputs([video, "what happens?"])

    # 4 frames pooled by t=2 -> 2 pooled frames x tokens_per_image each
    tpi = engine.cfg.tokens_per_image
    assert len(inputs["media_pos"]) == 2 * tpi
    assert inputs["media"][0]["kind"] == "tsp"

    out = engine.generate_content(
        [video, "what happens?"], GenerationConfig(max_new_tokens=4)
    )
    assert isinstance(out, str)

    # feature parity: engine media embeds == manual encode+pool
    from vila_tpu.models import vlm as vlm_lib
    from vila_tpu.models.encoders import tsp_encode_video

    got = engine.encode_media(inputs["media"])
    want = tsp_encode_video(
        engine.params, engine.cfg,
        jnp.asarray(inputs["media"][0]["tiles"]), ((2, 1, 1),),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=1e-4
    )


def test_video_basic_path_still_works(tmp_path):
    torch = pytest.importorskip("torch")
    from helpers import save_tiny_checkpoint

    import vila_tpu
    from vila_tpu.inference.generate import GenerationConfig

    path = str(tmp_path)
    with torch.no_grad():
        save_tiny_checkpoint(path)
    engine = vila_tpu.load(path)

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (40, 52, 3), np.uint8) for _ in range(3)]
    inputs = engine.prepare_inputs([vila_tpu.Video(frames), "hi"])
    # basic: every frame spliced as one image
    tpi = engine.cfg.tokens_per_image
    # extract_media samples num_video_frames (default 8) but pre-extracted
    # frame lists pass through as-is
    assert len(inputs["media_pos"]) % tpi == 0
    out = engine.generate_content(
        [vila_tpu.Video(frames), "hi"], GenerationConfig(max_new_tokens=4)
    )
    assert isinstance(out, str)
