"""Filter MMC4 annotation shards against the images that downloaded
(reference: data_prepare/mmc4/mmc4_filter_and_counter.py). Writes
filtered jsonl + .count sidecars; `--start/--end` shard the workload
across workers exactly like the reference CLI."""

import argparse
import json
import os
import pickle

from vila_tpu.data.prep import filter_interleaved


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--jsonl-dir", required=True)
    ap.add_argument("--images-dir", required=True,
                    help="dir of .pkl dicts {record_idx: fetched images}")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    a = ap.parse_args()

    os.makedirs(a.output_dir, exist_ok=True)
    pkls = sorted(os.listdir(a.images_dir))[a.start:a.end]
    for pkl in pkls:
        with open(os.path.join(a.images_dir, pkl), "rb") as f:
            image_dict = pickle.load(f)
        jl = pkl.replace(".pkl", ".jsonl")
        with open(os.path.join(a.jsonl_dir, jl)) as f:
            annotations = [json.loads(line) for line in f if line.strip()]
        kept = filter_interleaved(annotations, image_dict)
        out = os.path.join(a.output_dir, jl)
        with open(out, "w") as f:
            for rec in kept:
                f.write(json.dumps(rec) + "\n")
        with open(out.replace(".jsonl", ".count"), "w") as f:
            f.write(str(len(kept)))
        print(f"{jl}: {len(kept)}/{len(annotations)} kept")


if __name__ == "__main__":
    main()
