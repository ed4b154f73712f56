"""Interleaved / caption-pair / webdataset dataset types."""

import io
import json
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from helpers import save_tiny_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    import vila_tpu
    from vila_tpu import entry

    path = str(tmp_path_factory.mktemp("ckpt"))
    with torch.no_grad():
        save_tiny_checkpoint(path)
    cfg = entry.build_config(path, dtype="float32")
    tok = entry.load_tokenizer(path)
    return cfg, tok


def _img(seed, tmpdir, name):
    from PIL import Image as PILImage

    arr = np.random.default_rng(seed).integers(0, 255, (40, 40, 3), np.uint8)
    p = os.path.join(tmpdir, name)
    PILImage.fromarray(arr).save(p)
    return p


def test_interleaved_dataset(env, tmp_path):
    from vila_tpu.data.interleaved import InterleavedDataset
    from vila_tpu.constants import IGNORE_INDEX

    cfg, tok = env
    imgs = [_img(i, str(tmp_path), f"{i}.png") for i in range(2)]
    inst = {
        "texts": ["first sentence.", "second sentence.", "third one."],
        "images": imgs,
        "matched_idx": [0, 2],
    }
    ds = InterleavedDataset(tok, cfg, instances=[inst])
    ex = ds[0]
    tpi = cfg.tokens_per_image
    assert ex["tiles"].shape[0] == 2
    assert len(ex["media_positions"]) == 2 * tpi
    # all-text autoregressive labels: non-placeholder tokens are labeled
    ids, labels = ex["input_ids"], ex["labels"]
    ph = np.zeros(len(ids), bool)
    ph[ex["media_positions"]] = True
    assert (labels[ph] == IGNORE_INDEX).all()
    n_text_labeled = (labels[~ph] != IGNORE_INDEX).sum()
    assert n_text_labeled > 0


def test_caption_pairs_packing(env, tmp_path):
    from vila_tpu.data.interleaved import CaptionPairDataset

    cfg, tok = env
    pairs = [
        {"image": _img(10 + i, str(tmp_path), f"c{i}.png"),
         "caption": f"caption number {i}"}
        for i in range(8)
    ]
    ds = CaptionPairDataset(tok, cfg, instances=pairs, n_samples_per_idx=4)
    assert len(ds) == 2
    ex = ds[1]
    assert ex["tiles"].shape[0] == 4
    assert len(ex["media_positions"]) == 4 * cfg.tokens_per_image


def test_webdataset_supervised(env, tmp_path):
    from PIL import Image as PILImage

    from vila_tpu.data.interleaved import WebDatasetSupervised

    cfg, tok = env
    shard = str(tmp_path / "shard-000000.tar")
    with tarfile.open(shard, "w") as tf:
        for i in range(3):
            arr = np.random.default_rng(i).integers(0, 255, (32, 32, 3), np.uint8)
            buf = io.BytesIO()
            PILImage.fromarray(arr).save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:05d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            meta = json.dumps({"caption": f"photo {i}"}).encode()
            info = tarfile.TarInfo(f"{i:05d}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))

    ds = WebDatasetSupervised(tok, cfg, [shard])
    assert len(ds) == 3
    ex = ds[2]
    assert ex["tiles"].shape[0] == 1
    assert len(ex["media_positions"]) == cfg.tokens_per_image


def test_registry_types():
    from vila_tpu.data.builder import DATASET_TYPES

    for t in ("supervised", "interleaved", "caption_pairs", "webdataset"):
        assert t in DATASET_TYPES
