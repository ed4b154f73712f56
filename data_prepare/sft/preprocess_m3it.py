"""M3IT → vflan samples (reference: data_prepare/sft/preprocess_m3it.py —
question = instruction + inputs, base64 image list carried through)."""

import argparse
import os
import pickle

from vila_tpu.data.prep import m3it_record

DATASET_NAMES = [
    "image-paragraph-captioning", "textcap", "multi30k", "visual-dialog",
    "clevr", "nlvr", "visual-mrc", "docvqa", "gqa", "ivqa", "ocr-vqa",
    "st-vqa", "viquae", "vqa-v2",
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-path", required=True)
    ap.add_argument("--save-path", required=True)
    ap.add_argument("--subsets", nargs="*", default=DATASET_NAMES)
    a = ap.parse_args()

    from datasets import load_dataset

    os.makedirs(a.save_path, exist_ok=True)
    for name in a.subsets:
        rows = list(load_dataset(a.dataset_path, name)["train"])
        samples = [m3it_record(r, i, name) for i, r in enumerate(rows)]
        out = os.path.join(a.save_path, f"{name}_train.pkl")
        with open(out, "wb") as f:
            pickle.dump(samples, f)
        print(f"{name}: {len(samples)} -> {out}")


if __name__ == "__main__":
    main()
