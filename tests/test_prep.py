"""Data preparation library: shard writing (roundtrip through the native
indexed reader), converters, mmc4 filter, jsonl merge/split."""

import json
import os

import numpy as np
import pytest

from vila_tpu.data import prep
from vila_tpu.data.tario import IndexedTar, ShardedTarDataset


def test_shard_writer_roundtrip(tmp_path):
    samples = [
        {"txt": f"caption {i}".encode(), "jpg": bytes([i] * (10 + i))}
        for i in range(7)
    ]
    paths = prep.write_shards(
        iter(samples), str(tmp_path), prefix="pairs", samples_per_shard=3
    )
    assert len(paths) == 3  # 3+3+1
    # .count sidecars
    counts = [
        int(open(p.replace(".tar", ".count")).read()) for p in paths
    ]
    assert counts == [3, 3, 1]
    meta = json.load(open(tmp_path / "pairs-meta.json"))
    assert meta["total_samples"] == 7

    ds = ShardedTarDataset(paths)
    assert len(ds) == 7
    for i in range(7):
        s = ds[i]
        assert s["txt"] == f"caption {i}".encode()
        assert s["jpg"] == bytes([i] * (10 + i))


def test_shard_writer_native_readable(tmp_path):
    paths = prep.write_shards(
        [{"json": b"{}", "jpg": b"x" * 600}], str(tmp_path), prefix="s"
    )
    tar = IndexedTar(paths[0])
    names = {tar.name(i) for i in range(len(tar))}
    assert names == {"s-000000000.jpg", "s-000000000.json"}
    tar.close()


def test_shard_writer_deterministic(tmp_path):
    for d in ("a", "b"):
        prep.write_shards(
            [{"txt": b"hello", "jpg": b"img"}],
            str(tmp_path / d), prefix="x",
        )
    a = open(tmp_path / "a" / "x-000000.tar", "rb").read()
    b = open(tmp_path / "b" / "x-000000.tar", "rb").read()
    assert a == b


def test_shard_writer_rejects_bad_key(tmp_path):
    with prep.TarShardWriter(str(tmp_path)) as w:
        with pytest.raises(ValueError):
            w.add("a/b", {"txt": b"x"})


def test_linspace_subsample():
    idx = prep.linspace_subsample(100, 10)
    assert len(idx) == 10 and idx[0] == 0 and idx[-1] == 99
    assert idx == sorted(idx)
    assert prep.linspace_subsample(5, 10) == [0, 1, 2, 3, 4]
    assert prep.linspace_subsample(5, 1) == [0]


def test_converters():
    r = prep.flan_record("2+2?", "4", 3)
    assert r["id"] == "text_flan_00000003" and r["image"] == []

    r = prep.metamathqa_record({"type": "GSM", "query": "q", "response": "a"}, 1)
    assert r["conversations"][0] == {"from": "human", "value": "q"}
    assert r["conversations"][1]["from"] == "gpt"

    r = prep.m3it_record(
        {"instruction": "Look. ", "inputs": "What?", "outputs": "Cat",
         "image_base64_str": ["abc"]}, 0, "textcap")
    assert r["question"] == "Look. What?"
    assert r["image"] == ["abc"]

    r = prep.ocr_kv_record("img.png", {"total": "5.00", "date": "1/1"}, 0)
    assert "<image>" in r["conversations"][0]["value"]
    assert json.loads(r["conversations"][1]["value"]) == {
        "date": "1/1", "total": "5.00"}


def test_filter_interleaved():
    annos = [
        {"image_info": [1, 2], "text_list": ["a"]},
        {"image_info": [1], "text_list": ["b"]},
        {"image_info": [], "text_list": ["c"]},
    ]
    kept = prep.filter_interleaved(annos, {0: [b"x", b"y"]})
    assert len(kept) == 1 and kept[0]["org_idx"] == 0
    with pytest.raises(ValueError):
        prep.filter_interleaved(annos, {1: [b"x", b"y"]})  # count mismatch


def test_merge_jsonl_datasets(tmp_path):
    for name, rows in [("a_train.jsonl", 2), ("b_train.jsonl", 3)]:
        with open(tmp_path / name, "w") as f:
            for i in range(rows):
                f.write(json.dumps({"id": i, "conversations": []}) + "\n")
    merged = prep.merge_jsonl_datasets(
        [str(tmp_path / "a_train.jsonl"), str(tmp_path / "b_train.jsonl")]
    )
    assert [r["id"] for r in merged] == [0, 1, 2, 3, 4]
    only_b = prep.merge_jsonl_datasets(
        [str(tmp_path / "a_train.jsonl"), str(tmp_path / "b_train.jsonl")],
        include=["b_"],
    )
    assert len(only_b) == 3


def test_split_jsonl_shards(tmp_path):
    src = tmp_path / "big.jsonl"
    with open(src, "w") as f:
        for i in range(25):
            f.write(json.dumps({"i": i}) + "\n")
    paths = prep.split_jsonl_shards(str(src), str(tmp_path / "out"),
                                    shard_size=10)
    assert len(paths) == 3
    total = sum(1 for p in paths for _ in open(p))
    assert total == 25


def test_sft_json_to_shards(tmp_path):
    img = tmp_path / "media" / "x.jpg"
    os.makedirs(img.parent)
    img.write_bytes(b"\xff\xd8fakejpg")
    records = [
        {"id": 0, "image": "x.jpg",
         "conversations": [{"from": "human", "value": "<image>\nhi"},
                           {"from": "gpt", "value": "hello"}]},
        {"id": 1, "image": "missing.jpg", "conversations": []},  # skipped
        {"id": 2,
         "conversations": [{"from": "human", "value": "text only"},
                           {"from": "gpt", "value": "ok"}]},
    ]
    jp = tmp_path / "chat.json"
    jp.write_text(json.dumps(records))
    paths = prep.sft_json_to_shards(
        str(jp), str(tmp_path / "media"), str(tmp_path / "shards")
    )
    ds = ShardedTarDataset(paths)
    assert len(ds) == 2  # missing-media record dropped
    s0 = ds[0]
    assert s0["jpg"] == b"\xff\xd8fakejpg"
    assert json.loads(s0["json"])["id"] == 0
    assert "jpg" not in ds[1]
