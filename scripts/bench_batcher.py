"""Continuous-batching latency under load (VERDICT r3 #8).

Drives the ContinuousBatcher with continuous mixed arrivals (short
single-image prompts + long text prompts) on the 8B-shape W4 model and
reports TTFT and inter-token latency percentiles, comparing monolithic
admission prefill vs chunked (prefill_chunk) admission.

Run on a TPU host: python scripts/bench_batcher.py [--seconds 45]
Writes BATCHER_r{N}.json when --round is given.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def run_load(engine, *, max_batch, max_len, prefill_chunk, seconds,
             arrival_s, long_every):
    from vila_tpu.inference.generate import GenerationConfig
    from vila_tpu.serving.batcher import ContinuousBatcher
    from PIL import Image as PILImage

    batcher = ContinuousBatcher(
        engine, max_batch=max_batch, max_len=max_len,
        prefill_chunk=prefill_chunk,
    )
    img = PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (448, 448, 3), np.uint8)
    )
    # ~1800-token text prompt -> 2048 bucket (long-prompt admission); uses
    # words OUTSIDE the bench tokenizer's merge list so they tokenize
    # byte-level (~44 tokens per repeat). Kept under the 2048 bucket: the
    # 4096-bucket variant OOMs the tunnel chip (bs=8 cache + admission
    # prefill temps + imperfect donation over the remote-exec path).
    long_text = "the quick brown fox jumps over the lazy dog " * 40
    short_prompt = [img, "describe this image in detail"]

    # Warm-up OUTSIDE the measured window: one short and one long request
    # compile every prefill bucket, the decode step, and the row insert
    # (remote compiles take minutes over the dev tunnel; measuring them as
    # TTFT made the first window report 680 s p50, r5).
    for p in (short_prompt, long_text):
        q = batcher.submit(p, GenerationConfig(max_new_tokens=4))
        while q.get() is not None:
            pass

    ttfts, gaps = [], []
    lock = threading.Lock()
    stop_flag = threading.Event()

    def one_request(prompt, max_new):
        t0 = time.perf_counter()
        out = batcher.submit(prompt, GenerationConfig(max_new_tokens=max_new))
        last = None
        my_gaps = []
        ttft = None
        while True:
            item = out.get()
            now = time.perf_counter()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            if ttft is None:
                ttft = now - t0
            elif last is not None:
                my_gaps.extend([(now - last) / len(item)] * len(item))
            last = now
        with lock:
            if ttft is not None:
                ttfts.append(ttft)
            gaps.extend(my_gaps)

    threads = []
    t_end = time.time() + seconds
    i = 0
    while time.time() < t_end:
        prompt = (long_text if (i % long_every == long_every - 1)
                  else short_prompt)
        th = threading.Thread(
            target=one_request, args=(prompt, 64), daemon=True
        )
        th.start()
        threads.append(th)
        i += 1
        time.sleep(arrival_s)
    for th in threads:
        th.join(timeout=120)
    batcher.shutdown()

    g = np.asarray(gaps) * 1e3
    t = np.asarray(ttfts) * 1e3
    return {
        "requests": len(threads),
        "tokens": int(len(gaps)),
        "ttft_p50_ms": round(float(np.percentile(t, 50)), 1),
        "ttft_p99_ms": round(float(np.percentile(t, 99)), 1),
        "itl_p50_ms": round(float(np.percentile(g, 50)), 1),
        "itl_p99_ms": round(float(np.percentile(g, 99)), 1),
        "itl_mean_ms": round(float(g.mean()), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=45)
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--arrival", type=float, default=0.35)
    args = ap.parse_args()

    import jax

    assert jax.default_backend() != "cpu", "run on a TPU host"
    import bench
    from vila_tpu.data.tokenizer_utils import add_media_tokens
    from vila_tpu.inference.generate import GenerationEngine

    params, cfg = bench.build_8b_quantized()
    tok = bench._tiny_tokenizer()
    add_media_tokens(tok)
    engine = GenerationEngine(params, cfg, tok)

    out = {"model": "8B-shape W4A16 (synthetic weights, perf-only)",
           "load": f"1 req / {args.arrival}s, 1-in-4 long (~1.8k tok), "
                   f"{args.seconds}s window, 64 new tokens each"}
    # monolithic vs chunked admission at max_batch=8, plus the bs<=16
    # megakernel point under chunked admission (VERDICT r4 #6); arrivals
    # double at 16 so the larger batch actually fills. Rates are sized to
    # ~50-60% of decode capacity: every decode step is one blocking host
    # call over the dev tunnel (~30 ms RTT floor -> ~216 tok/s at bs8),
    # so saturating arrivals only measure queue growth.
    runs = (
        ("monolithic_bs8", 8, 0, args.arrival),
        ("chunked_512_bs8", 8, 512, args.arrival),
        ("chunked_512_bs16", 16, 512, args.arrival / 2),
    )
    for name, max_batch, chunk, arrival in runs:
        print(f"--- {name} (prefill_chunk={chunk}, max_batch={max_batch},"
              f" 1 req / {arrival}s) ---", flush=True)
        r = run_load(
            engine, max_batch=max_batch, max_len=2560, prefill_chunk=chunk,
            seconds=args.seconds, arrival_s=arrival, long_every=4,
        )
        r["max_batch"] = max_batch
        r["arrival_s"] = arrival
        out[name] = r
        print(name, json.dumps(r), flush=True)

    if args.round:
        fname = os.path.join(REPO, f"BATCHER_r{args.round:02d}.json")
        with open(fname, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", fname)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
