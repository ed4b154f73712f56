"""FLAN → vflan 1M text-instruction subset (reference:
data_prepare/sft/preprocess_flan.py — parquet inputs/targets columns,
linspace subsample to the target size, pickle output)."""

import argparse
import os
import pickle

from vila_tpu.data.prep import flan_record, linspace_subsample


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-path", required=True,
                    help="dir of *_data folders of parquet files")
    ap.add_argument("--save-path", required=True)
    ap.add_argument("--target-size", type=int, default=1_000_000)
    a = ap.parse_args()

    import pandas

    inputs, targets = [], []
    for folder in sorted(os.listdir(a.dataset_path)):
        if not folder.endswith("_data"):
            continue
        fdir = os.path.join(a.dataset_path, folder)
        for pq in sorted(os.listdir(fdir)):
            loaded = pandas.read_parquet(os.path.join(fdir, pq))
            inputs.extend(list(loaded["inputs"]))
            targets.extend(list(loaded["targets"]))
            print(folder, pq, len(inputs))

    samples = [
        flan_record(inputs[j], targets[j], cnt)
        for cnt, j in enumerate(linspace_subsample(len(inputs), a.target_size))
    ]
    os.makedirs(a.save_path, exist_ok=True)
    out = os.path.join(a.save_path, "text_flan_1m.pkl")
    with open(out, "wb") as f:
        pickle.dump(samples, f)
    print(f"wrote {len(samples)} samples to {out}")


if __name__ == "__main__":
    main()
