"""Shard a JSON/JSONL multimodal dataset into indexed-tar webdataset shards.

Capability parity: the reference's `data_prepare/` scripts (mmc4/coyo
download+shard pipelines, `parallel_shards.sh`) — the output tar layout is
what `vila_tpu.data.tario.ShardedTarDataset` and
`data.dataset_impl.WDSRecordAdapter` read: per sample `<key>.jpg` (or the
original image bytes) + `<key>.json` (all other record fields).

Usage:
  python data_prepare/shard_dataset.py \
      --input records.jsonl --media-root /data/images \
      --output-dir /data/shards --shard-size 1000 --prefix coyo

Each input record: {"image": "relative/path.jpg", ...other fields...}.
Records without an image get only the .json member.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import tarfile
from typing import Any, Dict, Iterator, List


def iter_records(path: str) -> Iterator[Dict[str, Any]]:
    with open(path) as f:
        if path.endswith(".jsonl"):
            for line in f:
                if line.strip():
                    yield json.loads(line)
        else:
            yield from json.load(f)


def _add(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    ti = tarfile.TarInfo(name)
    ti.size = len(data)
    tf.addfile(ti, io.BytesIO(data))


def write_shards(
    records: Iterator[Dict[str, Any]],
    output_dir: str,
    media_root: str = "",
    shard_size: int = 1000,
    prefix: str = "shard",
) -> List[str]:
    os.makedirs(output_dir, exist_ok=True)
    paths: List[str] = []
    tf = None
    count = 0
    shard_idx = 0
    for i, rec in enumerate(records):
        if tf is None or count >= shard_size:
            if tf is not None:
                tf.close()
            shard_path = os.path.join(
                output_dir, f"{prefix}-{shard_idx:05d}.tar"
            )
            paths.append(shard_path)
            tf = tarfile.open(shard_path, "w")
            shard_idx += 1
            count = 0
        key = f"{i:09d}"
        rec = dict(rec)
        image = rec.pop("image", None)
        if image:
            img_path = os.path.join(media_root, image)
            ext = os.path.splitext(image)[1].lstrip(".") or "jpg"
            with open(img_path, "rb") as f:
                _add(tf, f"{key}.{ext}", f.read())
        _add(tf, f"{key}.json", json.dumps(rec).encode())
        count += 1
    if tf is not None:
        tf.close()
    return paths


def main(argv=None) -> int:
    p = argparse.ArgumentParser("shard_dataset")
    p.add_argument("--input", required=True, help="json or jsonl records")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--media-root", default="")
    p.add_argument("--shard-size", type=int, default=1000)
    p.add_argument("--prefix", default="shard")
    args = p.parse_args(argv)
    paths = write_shards(
        iter_records(args.input),
        args.output_dir,
        media_root=args.media_root,
        shard_size=args.shard_size,
        prefix=args.prefix,
    )
    print(json.dumps({"shards": len(paths), "paths": paths[:3]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
