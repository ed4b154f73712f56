"""Dataset zoo (dataset_impl equivalents): record conversion, templates,
time tokens, OCR bbox serialization, wds adapter, registry wiring."""

import io
import json
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest
from PIL import Image as PILImage

from helpers import make_tiny_tokenizer

from vila_tpu.constants import MEDIA_TOKENS
from vila_tpu.data import dataset_impl as zoo
from vila_tpu.data.tokenizer_utils import add_media_tokens
from vila_tpu.models import projector, qwen2, siglip, vlm


@pytest.fixture(scope="module")
def tok_cfg():
    tok = make_tiny_tokenizer()
    add_media_tokens(tok)
    cfg = vlm.VLMConfig(
        llm=qwen2.LLMConfig(
            vocab_size=len(tok), hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2,
            num_key_value_heads=2,
        ),
        vision=siglip.SigLIPConfig(
            hidden_size=24, intermediate_size=48, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        projector=projector.ProjectorConfig(
            projector_type="mlp_downsample", mm_hidden_size=24,
            hidden_size=32,
        ),
    )
    return tok, cfg


def _img():
    return PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 50, 3), np.uint8)
    )


def test_coyo_qa_samples_format(tok_cfg):
    tok, cfg = tok_cfg
    records = [{"image": _img(), "qa": {"spatial": "left of the cat"}}]
    ds = zoo.CoyoQADataset(tok, cfg, records)
    ex = ds[0]
    assert ex["tiles"].shape[0] == 1
    assert (ex["labels"] >= 0).any()  # answer supervised


def test_coyo_recap_prefers_recap(tok_cfg):
    tok, cfg = tok_cfg
    ds = zoo.CoyoRecapDataset(
        tok, cfg, [{"image": _img(), "recap": "long", "caption": "short"}]
    )
    inst = ds.to_instance(ds.records[0])
    assert inst["conversations"][1]["value"] == "long"


def test_textocr_bbox_serialization(tok_cfg):
    tok, cfg = tok_cfg
    rec = {
        "image": _img(), "width": 100, "height": 100,
        "anns": [
            {"utf8_string": "STOP", "points": [10, 10, 30, 10, 30, 20, 10, 20]},
            {"utf8_string": ".", "bbox": [0, 0, 1, 1]},  # illegible: dropped
        ],
    }
    ds = zoo.TextOCRDataset(tok, cfg, [rec])
    inst = ds.to_instance(rec)
    ans = inst["conversations"][1]["value"]
    assert "STOP [0.10,0.10,0.30,0.20]" in ans
    assert "." != ans.strip()


def test_hiertext_paragraph_order(tok_cfg):
    tok, cfg = tok_cfg
    rec = {
        "image": _img(),
        "paragraphs": [
            {"lines": [{"words": [{"text": "hello"}, {"text": "world"}]}]},
            {"lines": [{"words": [{"text": "second"}]}]},
        ],
    }
    ds = zoo.HierTextDataset(tok, cfg, [rec])
    inst = ds.to_instance(rec)
    assert inst["conversations"][1]["value"] == "hello world\nsecond"


def test_lita_time_tokens(tok_cfg):
    tok, cfg = tok_cfg
    rec = {
        "video": "v.mp4", "duration": 10.0,
        "events": [
            {"start": 0.0, "end": 5.0, "caption": "a"},
            {"start": 5.0, "end": 10.0, "caption": "b"},
        ],
    }
    ds = zoo.LITADataset(tok, cfg, [rec], num_time_tokens=11)
    inst = ds.to_instance(rec)
    ans = inst["conversations"][1]["value"]
    assert "<t0> <t5> a" in ans and "<t5> <t10> b" in ans
    assert MEDIA_TOKENS["video"] in inst["conversations"][0]["value"]


def test_llava_cot_stages(tok_cfg):
    tok, cfg = tok_cfg
    rec = {
        "image": _img(), "question": "why?",
        "summary": "s", "reasoning": "r", "conclusion": "c",
    }
    ds = zoo.LLaVACoTDataset(tok, cfg, [rec])
    ans = ds.to_instance(rec)["conversations"][1]["value"]
    assert ans.index("<SUMMARY>") < ans.index("<REASONING>") < ans.index(
        "<CONCLUSION>"
    )


def test_resample_on_failure(tok_cfg):
    tok, cfg = tok_cfg
    records = [
        {"image": _img(), "qa": {}},  # no usable formats -> error
        {"image": _img(), "qa": {"ocr": "text"}},
    ]
    ds = zoo.CoyoQADataset(tok, cfg, records)
    ex = ds[0]  # resamples to a working record
    assert ex["input_ids"].ndim == 1


def test_wds_adapter_and_registry(tok_cfg, tmp_path):
    tok, cfg = tok_cfg
    shard = tmp_path / "shard-000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(3):
            img = _img()
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            ti = tarfile.TarInfo(f"{i:05d}.jpg")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            meta = json.dumps({"qa": {"spatial": f"answer {i}"}}).encode()
            tj = tarfile.TarInfo(f"{i:05d}.json")
            tj.size = len(meta)
            tf.addfile(tj, io.BytesIO(meta))

    adapter = zoo.WDSRecordAdapter([str(shard)])
    assert len(adapter) == 3
    rec = adapter[1]
    assert "image" in rec and rec["qa"]["spatial"] == "answer 1"

    from vila_tpu.data.builder import DATASET_TYPES

    for name in ("coyo_qa", "textocr", "lita", "panda70m", "llava_cot",
                 "sam", "hiertext", "coyo_recap", "general_img_text"):
        assert name in DATASET_TYPES
    ds = DATASET_TYPES["coyo_qa"](
        tokenizer=tok, cfg=cfg, shards=[str(shard)]
    )
    ex = ds[2]
    assert ex["tiles"].shape[0] == 1


def test_data_prepare_shard_and_registry(tok_cfg, tmp_path):
    """data_prepare tools: jsonl -> tar shards -> registry entry ->
    build_dataset end-to-end (reference data_prepare/ flow)."""
    import subprocess
    import yaml

    tok, cfg = tok_cfg
    media = tmp_path / "imgs"
    media.mkdir()
    recs = []
    for i in range(5):
        name = f"im{i}.jpg"
        _img().save(media / name)
        recs.append({"image": name, "qa": {"ocr": f"text {i}"}})
    inp = tmp_path / "records.jsonl"
    inp.write_text("\n".join(json.dumps(r) for r in recs))

    root = os.path.dirname(os.path.dirname(__file__))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "data_prepare/shard_dataset.py"),
         "--input", str(inp), "--media-root", str(media),
         "--output-dir", str(tmp_path / "shards"), "--shard-size", "2",
         "--prefix", "toy"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout)["shards"] == 3

    reg_dir = tmp_path / "registry"
    out = subprocess.run(
        [sys.executable, os.path.join(root, "data_prepare/make_registry.py"),
         "--name", "toy_qa", "--type", "coyo_qa",
         "--shards", str(tmp_path / "shards" / "toy-*.tar"),
         "--registry", "toy", "--registry-dir", str(reg_dir)],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    entry = yaml.safe_load((reg_dir / "toy.yaml").read_text())["toy_qa"]
    assert len(entry["shards"]) == 3

    from vila_tpu.data import builder

    builder.DATASETS["toy_qa"] = entry
    try:
        ds = builder.build_dataset("toy_qa", tok, cfg)
        assert len(ds) == 5
        ex = ds[4]
        assert ex["tiles"].shape[0] == 1
    finally:
        builder.DATASETS.pop("toy_qa", None)
