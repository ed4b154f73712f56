"""Chip bench: prompt-lookup speculative decoding on the 8B W4A16 engine.

Measures, on the attached TPU:
  1. vanilla width-1 greedy decode tok/s after a REAL quantized prefill
     (same condition as bench.py's decode section, but with genuine KV so
     the model's greedy stream is self-consistent),
  2. spec_chunk (inference/speculative.py) end-to-end tok/s at gamma in
     {4, 8} on the same prompt — including measured acceptance,
  3. the verify-forward iteration time t_iter(gamma), from which the
     effective-throughput curve vs acceptance follows analytically:
         tok/s(accept_len a) = (a + 1) / t_iter.

Greedy-exactness is asserted on-chip (spec stream == vanilla stream).

Synthetic-weight caveat (same as bench.py): the W4 weights are random, so
the greedy continuation typically enters a short cycle; prompt lookup then
drafts it correctly and acceptance is HIGH. That makes (2) an upper bound
resembling extractive/code-edit workloads; (3) is workload-independent.

Run on the TPU host:  python experiments/chip_spec_decode.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from bench import build_8b_quantized  # noqa: E402
from vila_tpu.models import qwen2  # noqa: E402
from vila_tpu.inference.speculative import (  # noqa: E402
    build_spec_decode, init_history,
)

PROMPT, N_NEW = 1024, 256


def main():
    print("device:", jax.devices()[0], flush=True)
    params, cfg = build_8b_quantized()
    llm_cfg = cfg.llm
    llm = params["llm"]
    cache_len = 2048

    rng = np.random.default_rng(0)
    prompt = rng.integers(2, 32000, PROMPT).astype(np.int32)

    @jax.jit
    def prefill(params, ids):
        cache = qwen2.init_cache(llm_cfg, batch=1, max_len=cache_len)
        logits, cache = qwen2.forward(
            params, llm_cfg, input_ids=ids, cache=cache
        )
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    ids = jnp.asarray(prompt[None])
    t0 = time.perf_counter()
    first, cache0 = prefill(llm, ids)
    jax.block_until_ready(cache0["k"])
    print(f"prefill({PROMPT}) compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    first_i = int(first[0])

    # ---- vanilla width-1 loop (megakernel path), collecting tokens ----
    @partial(jax.jit, static_argnames="n")
    def decode_run(n, params, tok, cache):
        def body(carry, _):
            tok, cache, pos = carry
            logits, cache = qwen2.forward(
                params, llm_cfg, input_ids=tok[:, None],
                positions=pos[:, None], cache=cache,
            )
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (nxt, cache, pos + 1), nxt[0]

        (tok, cache, _), toks = jax.lax.scan(
            body, (tok, cache, jnp.full((1,), PROMPT, jnp.int32)),
            None, length=n,
        )
        return toks

    toks = decode_run(N_NEW, llm, first, cache0)
    jax.block_until_ready(toks)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks = decode_run(N_NEW, llm, first, cache0)
        jax.block_until_ready(toks)
        times.append(time.perf_counter() - t0)
    t_van = float(np.median(times))
    want = [first_i] + np.asarray(toks).tolist()
    van_tps = N_NEW / t_van
    # cycle diagnostics: period of the tail, if any
    tail = want[-64:]
    period = 0
    for p in range(1, 33):
        if tail[p:] == tail[:-p]:
            period = p
            break
    print(f"vanilla: {van_tps:.2f} tok/s  (tail cycle period: "
          f"{period or '>32'})", flush=True)

    results = {"vanilla_tok_s": round(van_tps, 2), "cycle_period": period}

    # ---- speculative, gamma sweep ----
    for gamma in (4, 8):
        spec = build_spec_decode(llm_cfg)
        hist, hlen = init_history(
            prompt, first_i, cache_len + 8 * (gamma + 1))

        def fresh():
            _, c = prefill(llm, ids)
            h = jnp.array(hist)  # copy: spec donates
            jax.block_until_ready(c["k"])
            return c, h

        c, h = fresh()
        out, out_len, *_rest, iters = spec(
            llm, jnp.asarray([first_i], jnp.int32),
            jnp.asarray([int(prompt[-1])], jnp.int32),
            jnp.asarray(PROMPT, jnp.int32), c, h, hlen,
            max_out=N_NEW, gamma=gamma,
        )
        got = [first_i] + np.asarray(out)[: int(out_len)].tolist()
        n_match = next(
            (i for i, (a, b) in enumerate(zip(got, want)) if a != b),
            min(len(got), len(want)),
        )
        assert n_match >= min(len(got), N_NEW + 1) - 1, (
            f"greedy-exactness violated at {n_match}: "
            f"{got[n_match-2:n_match+2]} vs {want[n_match-2:n_match+2]}"
        )

        times = []
        for _ in range(3):
            c, h = fresh()
            t0 = time.perf_counter()
            out, out_len, *_rest, iters = spec(
                llm, jnp.asarray([first_i], jnp.int32),
                jnp.asarray([int(prompt[-1])], jnp.int32),
                jnp.asarray(PROMPT, jnp.int32), c, h, hlen,
                max_out=N_NEW, gamma=gamma,
            )
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        t_spec = float(np.median(times))
        n_out, n_it = int(out_len), int(iters)
        t_iter = t_spec / max(n_it, 1)
        eff = n_out / t_spec
        acc = n_out / max(n_it, 1) - 1
        print(
            f"gamma={gamma}: {eff:.2f} tok/s  ({n_out} toks / {n_it} iters, "
            f"mean accept {acc:.2f}/{gamma}, t_iter {t_iter*1e3:.2f} ms, "
            f"speedup x{eff/van_tps:.2f}; break-even accept "
            f"{t_iter*van_tps-1:.2f})",
            flush=True,
        )
        results[f"gamma{gamma}"] = {
            "eff_tok_s": round(eff, 2), "iters": n_it, "out": n_out,
            "mean_accept": round(acc, 2),
            "t_iter_ms": round(t_iter * 1e3, 3),
            "speedup_vs_vanilla": round(eff / van_tps, 3),
            "breakeven_accept_len": round(t_iter * van_tps - 1, 2),
        }

    import json
    print("RESULT " + json.dumps(results), flush=True)
    print("RC=0")


if __name__ == "__main__":
    main()
