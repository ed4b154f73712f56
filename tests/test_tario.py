"""Native indexed-tar reader vs python tarfile fallback."""

import io
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from vila_tpu.data.tario import IndexedTar, ShardedTarDataset, group_samples


def make_shard(path, samples):
    with tarfile.open(path, "w") as tf:
        for name, data in samples:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


@pytest.fixture()
def shard(tmp_path):
    rng = np.random.default_rng(0)
    samples = []
    for i in range(5):
        samples.append((f"{i:06d}.jpg", rng.bytes(100 + 37 * i)))
        samples.append((f"{i:06d}.json", b'{"caption": "s%d"}' % i))
    # a long filename (>100 chars) to exercise pax/GNU longname headers
    longname = "x" * 120 + ".jpg"
    samples.append((longname, b"LONG"))
    p = str(tmp_path / "shard-000000.tar")
    make_shard(p, samples)
    return p, samples


def test_native_matches_python(shard):
    path, samples = shard
    nat = IndexedTar(path)
    py = IndexedTar(path, force_python=True)
    assert len(nat) == len(py) == len(samples)
    for i in range(len(samples)):
        assert nat.name(i) == py.name(i)
        assert nat.read(i) == py.read(i)
    if not nat.is_native:
        pytest.skip("native lib unavailable (no g++)")
    assert nat.is_native and not py.is_native


def test_group_samples():
    names = ["000000.jpg", "000000.json", "000001.jpg", "000001.json"]
    g = group_samples(names)
    assert list(g.keys()) == ["000000", "000001"]
    assert set(g["000000"].keys()) == {"jpg", "json"}


def test_sharded_dataset(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for s in range(3):
        samples = []
        for i in range(4):
            samples.append((f"{s}_{i}.jpg", rng.bytes(64)))
            samples.append((f"{s}_{i}.txt", f"caption {s}/{i}".encode()))
        p = str(tmp_path / f"shard-{s:06d}.tar")
        make_shard(p, samples)
        paths.append(p)

    ds = ShardedTarDataset(paths, cache_size=2)
    assert len(ds) == 12
    item = ds[5]
    assert item["txt"] == b"caption 1/1"
    item = ds[11]
    assert item["txt"] == b"caption 2/3"
    # LRU eviction exercised by touching all shards
    for i in range(12):
        assert len(ds[i]["jpg"]) == 64
