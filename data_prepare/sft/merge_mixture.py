"""Merge per-dataset jsonl files into one SFT mixture with contiguous ids
(reference: data_prepare/sft/merge_llava_onevision.py)."""

import argparse
import json
import os

from vila_tpu.data.prep import merge_jsonl_datasets


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("metadata_dir", help="dir of *_train.jsonl files")
    ap.add_argument("--include", nargs="*", default=None,
                    help="substrings selecting which datasets to merge")
    ap.add_argument("--output", required=True)
    a = ap.parse_args()
    paths = sorted(
        os.path.join(a.metadata_dir, n)
        for n in os.listdir(a.metadata_dir)
        if n.endswith(".jsonl")
    )
    merged = merge_jsonl_datasets(paths, include=a.include)
    with open(a.output, "w") as f:
        for rec in merged:
            f.write(json.dumps(rec) + "\n")
    print(f"merged {len(paths)} datasets -> {len(merged)} records")


if __name__ == "__main__":
    main()
