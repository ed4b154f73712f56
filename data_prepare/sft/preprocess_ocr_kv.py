"""Key-value OCR suites (SROIE/POIE family) → conversation json
(reference: data_prepare/sft/SROIE.py, POIE.py — image + annotated field
dict becomes an extract-as-JSON conversation)."""

import argparse
import json
import os

from vila_tpu.data.prep import ocr_kv_record


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("annotations", help="json list of {image, fields}")
    ap.add_argument("--dataset-name", default="sroie")
    ap.add_argument("--output", required=True)
    a = ap.parse_args()
    with open(a.annotations) as f:
        rows = json.load(f)
    records = [
        ocr_kv_record(r["image"], r["fields"], i, a.dataset_name)
        for i, r in enumerate(rows)
    ]
    os.makedirs(os.path.dirname(a.output) or ".", exist_ok=True)
    with open(a.output, "w") as f:
        json.dump(records, f, ensure_ascii=False)
    print(f"wrote {len(records)} records to {a.output}")


if __name__ == "__main__":
    main()
