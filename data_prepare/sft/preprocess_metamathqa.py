"""MetaMathQA → conversations json (reference:
data_prepare/sft/preprocess_metamathqa.py)."""

import argparse
import json

from vila_tpu.data.prep import metamathqa_record


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("json_file", help="MetaMathQA-395K.json")
    ap.add_argument("--output", default=None)
    a = ap.parse_args()
    out = a.output or a.json_file.replace(".json", "_processed.json")
    with open(a.json_file) as f:
        data = json.load(f)
    records = [metamathqa_record(rec, i) for i, rec in enumerate(data)]
    with open(out, "w") as f:
        json.dump(records, f)
    print(f"wrote {len(records)} records to {out}")


if __name__ == "__main__":
    main()
