"""Data layer: sentinel masking, media expansion, collators, registry."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from helpers import make_tiny_tokenizer

from vila_tpu.constants import IGNORE_INDEX, MEDIA_TOKENS
from vila_tpu.data import builder as builder_lib
from vila_tpu.data.collate import OOB, Collator, PackingCollator
from vila_tpu.data.tokenizer_utils import (
    add_media_tokens,
    infer_stop_tokens,
    preprocess_conversation,
    tokenize_conversation,
)


@pytest.fixture(scope="module")
def tok():
    t = make_tiny_tokenizer()
    add_media_tokens(t)
    return t


def test_sentinel_label_masking(tok):
    conv = [
        {"from": "human", "value": "what is 2+2?"},
        {"from": "gpt", "value": "four"},
        {"from": "human", "value": "and 3+3?"},
        {"from": "gpt", "value": "six"},
    ]
    data = preprocess_conversation(conv, tok)
    ids, labels = data["input_ids"], data["labels"]
    assert (labels != IGNORE_INDEX).any(), "no trainable tokens"
    # Trainable tokens must decode to (parts of) assistant responses.
    trainable = tok.decode(ids[labels != IGNORE_INDEX])
    assert "four" in trainable and "six" in trainable
    assert "2+2" not in trainable


def test_media_token_splicing(tok):
    conv = [{"from": "human", "value": f"{MEDIA_TOKENS['image']} describe"}]
    ids = tokenize_conversation(conv, tok, add_generation_prompt=True)
    img_id = tok.media_token_ids["image"]
    assert (ids == img_id).sum() == 1


def test_infer_stop_tokens(tok):
    stops = infer_stop_tokens(tok)
    assert tok.eos_token in stops


def _example(n_text, n_tiles, toks_per_tile=4, seed=0):
    rng = np.random.default_rng(seed)
    m = n_tiles * toks_per_tile
    ids = rng.integers(5, 50, size=(n_text + m,)).astype(np.int32)
    labels = ids.copy()
    media_pos = np.arange(2, 2 + m, dtype=np.int32)
    tiles = rng.integers(0, 255, size=(n_tiles, 28, 28, 3)).astype(np.uint8)
    return {
        "input_ids": ids,
        "labels": labels,
        "media_positions": media_pos,
        "tiles": tiles,
    }


def test_collator_shapes():
    c = Collator(seq_len=64)
    batch = c([_example(20, 1), _example(30, 2)])
    assert batch["input_ids"].shape == (2, 64)
    assert batch["pixel_values"].shape[:2] == (2, 2)
    assert (batch["segment_ids"][0, :24] == 1).all()
    assert (batch["segment_ids"][0, 24:] == 0).all()
    # second sample's second tile positions are real; first sample's
    # padded tile positions are OOB
    assert (batch["media_positions"][0, 4:] == OOB).all()
    assert (batch["media_positions"][1, :8] != OOB).all()


def test_packing_collator():
    c = PackingCollator(seq_len=96, rows=1)
    e1, e2 = _example(20, 1, seed=1), _example(25, 1, seed=2)
    batch = c([e1, e2])
    seg = batch["segment_ids"][0]
    n1 = len(e1["input_ids"])
    n2 = len(e2["input_ids"])
    assert (seg[:n1] == 1).all()
    assert (seg[n1 : n1 + n2] == 2).all()
    assert (seg[n1 + n2 :] == 0).all()
    # positions restart per segment
    assert batch["positions"][0, n1] == 0
    # first token of each packed sample is label-masked
    assert batch["labels"][0, 0] == IGNORE_INDEX
    assert batch["labels"][0, n1] == IGNORE_INDEX
    # media positions shifted by the packing offset
    assert batch["media_positions"][0, 4] == e2["media_positions"][0] + n1


def test_mixture_parsing():
    builder_lib.MIXTURES["mix_a"] = ["ds1", "ds2*2"]
    builder_lib.MIXTURES["mix_b"] = ["mix_a", "ds3"]
    names = builder_lib.parse_mixture("mix_b+ds4")
    assert names == sorted(["ds1", "ds2*2", "ds3", "ds4"])


def test_build_dataset_from_registry(tok, tmp_path):
    import json

    from vila_tpu.models import projector, qwen2, siglip, vlm

    data = [
        {
            "conversations": [
                {"from": "human", "value": "hi"},
                {"from": "gpt", "value": "hello"},
            ]
        }
    ] * 3
    p = tmp_path / "data.json"
    p.write_text(json.dumps(data))

    builder_lib.DATASETS["tiny_text"] = {
        "type": "supervised",
        "data_path": str(p),
    }
    cfg = vlm.VLMConfig(
        llm=qwen2.LLMConfig(vocab_size=512, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=1,
                            num_attention_heads=2, num_key_value_heads=1),
        vision=siglip.SigLIPConfig(hidden_size=16, intermediate_size=32,
                                   num_hidden_layers=1, num_attention_heads=2,
                                   image_size=28, patch_size=14),
        projector=projector_cfg(),
    )
    ds = builder_lib.build_dataset("tiny_text*2", tok, cfg)
    assert len(ds) == 6
    ex = ds[0]
    assert (ex["labels"] != IGNORE_INDEX).any()


def projector_cfg():
    from vila_tpu.models import projector

    return projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=16, hidden_size=32
    )


def test_longest_edge_mode():
    """RADIO-style longest-edge resize + bottom-right pad
    (multimodal_encoder/image_processor.py:219-285)."""
    from PIL import Image as PILImage

    from vila_tpu.data.preprocess import process_image

    img = PILImage.fromarray(
        np.full((50, 100, 3), 200, np.uint8)  # wide image
    )
    tiles, block = process_image(
        img, image_size=64, image_aspect_ratio="longest_edge"
    )
    assert tiles.shape == (1, 64, 64, 3) and block is None
    t = tiles[0]
    assert t[:32, :64].mean() > 150  # content in the top-left
    assert t[40:, :].max() == 0  # bottom padding


def test_collator_ps3_extras():
    from vila_tpu.data.collate import Collator

    rng = np.random.default_rng(0)
    ex = {
        "input_ids": np.arange(6, dtype=np.int32),
        "labels": np.arange(6, dtype=np.int32),
        "tiles": rng.integers(0, 255, (1, 28, 28, 3)).astype(np.uint8),
        "tiles_high": rng.integers(0, 255, (1, 56, 56, 3)).astype(np.uint8),
        "gt_selection_map": np.ones((1, 4, 4), np.float32),
        "media_positions": np.asarray([2], np.int32),
    }
    batch = Collator(seq_len=8)([ex, ex])
    assert batch["pixel_values_high"].shape == (2, 1, 56, 56, 3)
    assert batch["gt_selection_maps"].shape == (2, 1, 4, 4)


def test_short_video_filter(tmp_path):
    """Size-gated video record filtering (short_video_filter.py parity)."""
    import json

    from vila_tpu.data.filters import filter_videos, main

    vdir = tmp_path / "videos"
    vdir.mkdir()
    (vdir / "good.mp4").write_bytes(b"x" * 200_000)
    (vdir / "small.mp4").write_bytes(b"x" * 10)
    records = [
        {"video": "good.mp4", "q": 1},
        {"video": "small.mp4", "q": 2},
        {"video": "missing.mp4", "q": 3},
        {"id": "good", "q": 4},  # id -> good.mp4 convention
    ]
    kept = filter_videos(records, str(vdir))
    assert [r["q"] for r in kept] == [1, 4]

    inp = tmp_path / "in.json"
    outp = tmp_path / "out.json"
    inp.write_text(json.dumps(records))
    assert main(["--input", str(inp), "--output", str(outp),
                 "--video-dir", str(vdir)]) == 0
    assert len(json.loads(outp.read_text())) == 2
