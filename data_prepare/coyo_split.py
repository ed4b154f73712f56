"""Split a large pair-corpus jsonl into fixed-size shards for parallel
download/packing workers (reference: data_prepare/coyo/coyo_splitter.py)."""

import argparse

from vila_tpu.data.prep import split_jsonl_shards


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("jsonl", help="input .jsonl")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--shard-size", type=int, default=10000)
    a = ap.parse_args()
    paths = split_jsonl_shards(a.jsonl, a.out_dir, shard_size=a.shard_size)
    print(f"wrote {len(paths)} shards")


if __name__ == "__main__":
    main()
