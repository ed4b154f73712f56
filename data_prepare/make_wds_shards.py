"""Pack a conversation-json SFT dataset (+ media dir) into indexed tar
shards for the native reader (reference analogue: the wids shard layout
consumed by llava/data/simple_vila_webdataset.py)."""

import argparse

from vila_tpu.data.prep import sft_json_to_shards


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("json_path", help="SFT conversations .json or .jsonl")
    ap.add_argument("--media-dir", default=None)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--prefix", default="sft")
    ap.add_argument("--samples-per-shard", type=int, default=2048)
    ap.add_argument("--strict", action="store_true",
                    help="fail on missing media instead of skipping")
    a = ap.parse_args()
    paths = sft_json_to_shards(
        a.json_path, a.media_dir, a.out_dir, prefix=a.prefix,
        samples_per_shard=a.samples_per_shard, strict=a.strict,
    )
    print(f"wrote {len(paths)} shards to {a.out_dir}")


if __name__ == "__main__":
    main()
