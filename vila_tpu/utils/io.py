"""Uniform load/save by extension (reference: llava/utils/io.py:11-28)."""

from __future__ import annotations

import json
import os
from typing import Any


def load(path: str, **kwargs) -> Any:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        with open(path) as f:
            return json.load(f, **kwargs)
    if ext == ".jsonl":
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    if ext in (".yaml", ".yml"):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    if ext == ".npy":
        import numpy as np

        return np.load(path, allow_pickle=True)
    raise ValueError(f"unsupported extension: {ext}")


def save(path: str, obj: Any, **kwargs) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        with open(path, "w") as f:
            json.dump(obj, f, **kwargs)
        return
    if ext == ".jsonl":
        with open(path, "w") as f:
            for item in obj:
                f.write(json.dumps(item) + "\n")
        return
    if ext in (".yaml", ".yml"):
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(obj, f)
        return
    if ext == ".npy":
        import numpy as np

        np.save(path, obj)
        return
    raise ValueError(f"unsupported extension: {ext}")
