"""End-to-end: load a component checkpoint, generate with an image, and
verify next-token parity against a torch replica of the reference's media
fusion (`_embed`, llava_arch.py:412-490)."""

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from helpers import save_tiny_checkpoint  # noqa: E402

import vila_tpu  # noqa: E402
from vila_tpu.inference.generate import GenerationConfig  # noqa: E402


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("ckpt"))
    with torch.no_grad():
        llm, vit, proj = save_tiny_checkpoint(tmpdir)
    return tmpdir, llm, vit, proj


def test_load_and_generate_text_only(checkpoint):
    path, *_ = checkpoint
    engine = vila_tpu.load(path)
    out = engine.generate_content(
        "hello", GenerationConfig(max_new_tokens=8)
    )
    assert isinstance(out, str)


def test_generate_with_image_runs(checkpoint):
    path, *_ = checkpoint
    from PIL import Image as PILImage

    engine = vila_tpu.load(path)
    img = PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 80, 3), np.uint8)
    )
    out = engine.generate_content(
        [vila_tpu.Image(img), "what is this?"],
        GenerationConfig(max_new_tokens=8),
    )
    assert isinstance(out, str)


def test_prefill_logit_parity_with_torch_fusion(checkpoint):
    """The fused prefill's next-token logits must match a torch replica of
    the reference pipeline: same tokenization, same splice, same model."""
    path, llm, vit, proj = checkpoint
    from PIL import Image as PILImage

    engine = vila_tpu.load(path)
    rng = np.random.default_rng(1)
    img = PILImage.fromarray(rng.integers(0, 255, (64, 80, 3), np.uint8))

    inputs = engine.prepare_inputs([vila_tpu.Image(img), "describe"])
    expanded = inputs["input_ids"]
    media_pos = inputs["media_pos"]
    tiles = inputs["media"][0]["tiles"]

    # --- vila_tpu prefill logits (unpadded path, direct model call) ---
    from vila_tpu.models import qwen2, vlm

    embeds = qwen2.embed_tokens(
        engine.params["llm"], engine.cfg.llm, jnp.asarray(expanded[None])
    )
    feats = vlm.encode_images(engine.params, engine.cfg, jnp.asarray(tiles))
    embeds = vlm.splice_media(
        embeds, feats.reshape(-1, feats.shape[-1]), jnp.asarray(media_pos)
    )
    logits, _ = qwen2.forward(
        engine.params["llm"], engine.cfg.llm, inputs_embeds=embeds
    )
    got = np.asarray(logits[0, -1])

    # --- torch replica of the reference fusion ---
    with torch.no_grad():
        # normalize like the siglip processor: rescale + mean/std 0.5
        px = tiles.astype(np.float32) / 255.0
        px = (px - 0.5) / 0.5
        pt = torch.tensor(px.transpose(0, 3, 1, 2))
        hs = vit(pt, output_hidden_states=True).hidden_states[-2]
        feats_t = proj(hs)  # (N, T, D)
        emb_t = llm.model.embed_tokens(torch.tensor(expanded[None]))
        flat = emb_t.reshape(-1, emb_t.shape[-1]).clone()
        flat[media_pos] = feats_t.reshape(-1, feats_t.shape[-1])
        emb_t = flat.reshape(1, -1, emb_t.shape[-1])
        ref = llm(inputs_embeds=emb_t).logits[0, -1].numpy()

    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-2)
    assert got.argmax() == ref.argmax()


def test_engine_matches_unpadded_forward(checkpoint):
    """Bucketed/padded engine path == unpadded direct forward (greedy)."""
    path, *_ = checkpoint
    from PIL import Image as PILImage

    engine = vila_tpu.load(path)
    rng = np.random.default_rng(2)
    img = PILImage.fromarray(rng.integers(0, 255, (50, 50, 3), np.uint8))

    inputs = engine.prepare_inputs([vila_tpu.Image(img), "hi there"])
    out = engine.generate_ids(inputs, GenerationConfig(max_new_tokens=6))

    # Direct unpadded replay
    from vila_tpu.models import qwen2, vlm

    ids = inputs["input_ids"]
    feats = vlm.encode_images(
        engine.params, engine.cfg, jnp.asarray(inputs["media"][0]["tiles"])
    ).reshape(-1, engine.cfg.llm.hidden_size)
    cur = list(ids)
    produced = []
    for _ in range(len(out)):
        embeds = qwen2.embed_tokens(
            engine.params["llm"], engine.cfg.llm, jnp.asarray([cur])
        )
        embeds = vlm.splice_media(embeds, feats, jnp.asarray(inputs["media_pos"]))
        logits, _ = qwen2.forward(
            engine.params["llm"], engine.cfg.llm, inputs_embeds=embeds
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        produced.append(nxt)
        cur.append(nxt)
    assert produced == out


@pytest.mark.slow
def test_decode_correct_when_cache_clamped_to_prompt_bucket(checkpoint):
    """Fill-cursor regression: with cache_len clamped to the PADDED prompt
    bucket (max_cache_len == s_pad), decode must still write KV rows — the
    cursor has to rewind from s_pad to the real prompt length, else every
    write scatters out of range with mode="drop" and generated tokens
    silently stop attending to each other."""
    path, *_ = checkpoint

    from vila_tpu.inference.generate import PROMPT_BUCKETS, _bucket

    engine = vila_tpu.load(path)
    text = "the quick brown fox jumps over the lazy dog " * 4  # ~180 toks
    inputs = engine.prepare_inputs([text])
    prompt_len = int(inputs["input_ids"].shape[0])
    s_pad = _bucket(prompt_len, PROMPT_BUCKETS)
    assert s_pad - prompt_len > 5, (prompt_len, s_pad)  # real padding gap
    # clamp the cache to exactly the padded bucket: decode capacity exists
    # only if the cursor rewinds to prompt_len
    engine.max_cache_len = s_pad

    out = engine.generate_ids(inputs, GenerationConfig(max_new_tokens=40))
    assert len(out) >= 1

    from vila_tpu.models import qwen2

    cur = list(inputs["input_ids"])
    for i, tok in enumerate(out):
        logits, _ = qwen2.forward(
            engine.params["llm"], engine.cfg.llm,
            input_ids=jnp.asarray([cur], jnp.int32),
        )
        assert int(jnp.argmax(logits[0, -1])) == tok, i
        cur.append(tok)


def test_load_vision_int8_generates(checkpoint):
    """TinyChat vision recipe: load(vision_int8=True) quantizes the SigLIP
    tower to W8A8 and the engine still generates (image path)."""
    path, *_ = checkpoint
    from PIL import Image as PILImage

    engine = vila_tpu.load(path, vision_int8=True)
    lp = engine.params["vision_tower"]["layers"]
    assert "w8" in lp["q_proj"] and lp["q_proj"]["w8"].dtype == jnp.int8

    rng = np.random.default_rng(3)
    img = PILImage.fromarray(rng.integers(0, 255, (50, 50, 3), np.uint8))
    out = engine.generate_ids(
        engine.prepare_inputs([vila_tpu.Image(img), "hi"]),
        GenerationConfig(max_new_tokens=4),
    )
    assert isinstance(out, list)


def test_save_load_roundtrip(checkpoint, tmp_path):
    path, *_ = checkpoint
    engine = vila_tpu.load(path)
    from vila_tpu import entry

    out_dir = str(tmp_path / "resaved")
    entry.save(engine.params, engine.cfg, engine.tokenizer, out_dir)
    engine2 = vila_tpu.load(out_dir)

    ids = np.asarray([[5, 6, 7, 8]], np.int32)
    from vila_tpu.models import qwen2

    l1, _ = qwen2.forward(engine.params["llm"], engine.cfg.llm, input_ids=jnp.asarray(ids))
    l2, _ = qwen2.forward(engine2.params["llm"], engine2.cfg.llm, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


@pytest.mark.slow
def test_fuzz_greedy_consistency_across_shapes(checkpoint):
    """Randomized net over the bucketed engine: prompts of varying length
    (different PROMPT_BUCKETS, with/without image), decode lengths crossing
    chunk boundaries — every greedy token must equal the argmax of a
    cacheless forward over the full prefix."""
    path, *_ = checkpoint
    from PIL import Image as PILImage

    from vila_tpu.models import qwen2, vlm

    engine = vila_tpu.load(path)
    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
    cases = []
    for n_words, with_img, n_new in [(3, True, 5), (40, False, 9),
                                     (15, True, 3), (70, False, 7)]:
        text = " ".join(rng.choice(words, n_words))
        prompt = [text]
        if with_img:
            img = PILImage.fromarray(
                rng.integers(0, 255, (48, 56, 3), np.uint8))
            prompt = [vila_tpu.Image(img), text]
        cases.append((prompt, with_img, n_new))

    for prompt, with_img, n_new in cases:
        inputs = engine.prepare_inputs(prompt)
        out = engine.generate_ids(
            inputs, GenerationConfig(max_new_tokens=n_new))
        feats = None
        if with_img:
            feats = vlm.encode_images(
                engine.params, engine.cfg,
                jnp.asarray(inputs["media"][0]["tiles"]),
            ).reshape(-1, engine.cfg.llm.hidden_size)
        cur = list(inputs["input_ids"])
        for i, tok in enumerate(out):
            embeds = qwen2.embed_tokens(
                engine.params["llm"], engine.cfg.llm, jnp.asarray([cur]))
            if feats is not None:
                embeds = vlm.splice_media(
                    embeds, feats, jnp.asarray(inputs["media_pos"]))
            logits, _ = qwen2.forward(
                engine.params["llm"], engine.cfg.llm, inputs_embeds=embeds)
            assert int(jnp.argmax(logits[0, -1])) == tok, (prompt, i)
            cur.append(tok)
