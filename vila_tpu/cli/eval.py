"""`vila-eval` CLI: registry-driven evaluation runner.

Capability parity: llava/cli/eval.py:29-239 — task filtering by name/tags,
concurrent subprocess execution (concurrency 10), metric collection via
JSON-paths from each task's metrics.json, tabulated report.
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import subprocess
from string import Template
from typing import Any, Dict, Optional

import yaml

REGISTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "eval", "registry.yaml"
)


def load_registry(path: Optional[str] = None) -> Dict[str, Any]:
    with open(path or REGISTRY_PATH) as f:
        return yaml.safe_load(f)


def json_path(obj: Any, path: str) -> Any:
    """Resolve a registry metric path against a metrics.json payload.

    Metric writers use two shapes: flat slash keys stored verbatim
    (benchmarks.py: {"mme/total": 1523.0}) and nested dicts
    (smoke.py: {"smoke": {"pass_rate": 1.0}}). Accept both — exact flat
    key wins, then nested traversal."""
    if isinstance(obj, dict) and path in obj:
        return obj[path]
    for key in path.split("/"):
        obj = obj[key]
    return obj


def run_task(name: str, spec: Dict[str, Any], model: str, out_root: str):
    out_dir = os.path.join(out_root, name)
    os.makedirs(out_dir, exist_ok=True)
    cmd = Template(spec["command"]).safe_substitute(
        MODEL=model, OUTPUT_DIR=out_dir
    )
    log = os.path.join(out_dir, "log.txt")
    with open(log, "w") as f:
        proc = subprocess.run(cmd, shell=True, stdout=f, stderr=f)
    metrics = {}
    mfile = os.path.join(out_dir, "metrics.json")
    if proc.returncode == 0 and os.path.exists(mfile):
        with open(mfile) as f:
            raw = json.load(f)
        for mname, mpath in (spec.get("metrics") or {}).items():
            try:
                metrics[mname] = json_path(raw, mpath)
            except Exception:
                metrics[mname] = None
    return name, proc.returncode, metrics


def main():
    parser = argparse.ArgumentParser("vila-eval")
    parser.add_argument("--model-path", "-m", required=True)
    parser.add_argument("--model-name", default=None)
    parser.add_argument("--tasks", "-t", nargs="*", default=None)
    parser.add_argument("--tags", nargs="*", default=None)
    parser.add_argument("--output-dir", "-o", default="runs/eval")
    parser.add_argument("--concurrency", type=int, default=10)
    parser.add_argument("--registry", default=None)
    args = parser.parse_args()

    registry = load_registry(args.registry)
    selected = {}
    for name, spec in registry.items():
        if args.tasks and name not in args.tasks:
            continue
        if args.tags and not set(args.tags) & set(spec.get("tags", [])):
            continue
        selected[name] = spec
    if not selected:
        print("no tasks selected")
        return

    model_name = args.model_name or os.path.basename(
        os.path.normpath(args.model_path)
    )
    out_root = os.path.join(args.output_dir, model_name)
    os.makedirs(out_root, exist_ok=True)

    results = {}
    with concurrent.futures.ThreadPoolExecutor(args.concurrency) as pool:
        futures = [
            pool.submit(run_task, name, spec, args.model_path, out_root)
            for name, spec in selected.items()
        ]
        for fut in concurrent.futures.as_completed(futures):
            name, code, metrics = fut.result()
            results[name] = {"exit_code": code, "metrics": metrics}
            status = "OK" if code == 0 else f"FAIL({code})"
            print(f"[{status}] {name}: {metrics}")

    with open(os.path.join(out_root, "results.json"), "w") as f:
        json.dump(results, f, indent=2)

    # tabulate summary
    print("\n== summary ==")
    width = max((len(n) for n in results), default=4)
    for name in sorted(results):
        r = results[name]
        mtxt = ", ".join(f"{k}={v}" for k, v in r["metrics"].items())
        print(f"{name.ljust(width)}  exit={r['exit_code']}  {mtxt}")


if __name__ == "__main__":
    main()
