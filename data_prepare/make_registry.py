"""Emit a vila_tpu dataset-registry YAML entry for prepared shards/JSONs.

Capability parity: the registration half of the reference's data_prepare
flow (datasets land in llava/data/registry/datasets/*.yaml). Writes or
appends to a registry file that `vila_tpu.data.builder.register_datasets`
loads (env VILA_DATASETS selects the file stem).

Usage:
  python data_prepare/make_registry.py --name coyo_qa_25m --type coyo_qa \
      --shards '/data/shards/coyo-*.tar' --registry my_datasets \
      [--media-dir /data/images] [--extra mode=qa]
"""

from __future__ import annotations

import argparse
import glob
import os

import yaml

REGISTRY_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vila_tpu", "data", "registry", "datasets",
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser("make_registry")
    p.add_argument("--name", required=True)
    p.add_argument("--type", required=True, help="DATASET_TYPES key")
    p.add_argument("--shards", default=None, help="glob of tar shards")
    p.add_argument("--data-path", default=None, help="json/jsonl records")
    p.add_argument("--media-dir", default=None)
    p.add_argument("--registry", default="local")
    p.add_argument(
        "--extra", nargs="*", default=[], help="extra k=v ctor kwargs"
    )
    p.add_argument("--registry-dir", default=REGISTRY_DIR)
    args = p.parse_args(argv)

    entry = {"type": args.type}
    if args.shards:
        shards = sorted(glob.glob(args.shards))
        if not shards:
            raise SystemExit(f"no shards match {args.shards}")
        entry["shards"] = shards
    if args.data_path:
        entry["data_path"] = args.data_path
    if args.media_dir:
        entry["media_dir"] = args.media_dir
    for kv in args.extra:
        k, v = kv.split("=", 1)
        entry[k] = yaml.safe_load(v)

    os.makedirs(args.registry_dir, exist_ok=True)
    path = os.path.join(args.registry_dir, f"{args.registry}.yaml")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = yaml.safe_load(f) or {}
    existing[args.name] = entry
    with open(path, "w") as f:
        yaml.safe_dump(existing, f, sort_keys=True)
    print(f"registered {args.name} in {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
