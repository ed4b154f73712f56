"""On-chip parity + timing for the batched megakernel (bs<=8 decode).

Compares fused A/B decode (VILA_TPU_NO_MEGA_BATCHED=1) against the
batched megakernel (fused_decode.fused_layer_batched) on the 8B-shape W4
model at bs=8: greedy-token agreement over 32 steps, then differential
step timing (K-step chained scans, min-of-reps).

Run on the TPU host: python experiments/chip_mega_b.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu"
    import bench
    from vila_tpu.models import qwen2

    params, cfg = bench.build_8b_quantized()
    llm = cfg.llm
    qp = params["llm"]
    B = int(os.environ.get("MEGA_B_BATCH", "8"))
    MAXLEN, PLEN = 2048, 128

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(0, llm.vocab_size, (B, PLEN)), jnp.int32
    )

    @jax.jit
    def prefill(qp, prompt):
        cache = qwen2.init_cache(llm, batch=B, max_len=MAXLEN)
        logits, cache = qwen2.forward(
            qp, llm, input_ids=prompt, cache=cache
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return tok, cache

    def make_decode(n_steps):
        def run(qp, tok, cache):
            def body(carry, _):
                tok, cache = carry
                logits, cache = qwen2.forward(
                    qp, llm, input_ids=tok[:, None], cache=cache
                )
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return (nxt, cache), nxt

            (tok, cache), toks = jax.lax.scan(
                body, (tok, cache), None, length=n_steps
            )
            return toks, tok

        return jax.jit(run, donate_argnums=(2,))

    results = {}
    for name, env in (("fusedAB", "1"), ("mega_b", "")):
        if env:
            os.environ["VILA_TPU_NO_MEGA_BATCHED"] = env
        else:
            os.environ.pop("VILA_TPU_NO_MEGA_BATCHED", None)
        tok, cache = prefill(qp, prompt)
        dec32 = make_decode(32)
        toks, _ = dec32(qp, tok, cache)
        results[name] = np.asarray(toks)
        print(f"{name}: first tokens {np.asarray(toks)[:4, 0]}", flush=True)

        # differential timing: K=8 vs K=72 chained steps
        t_by_k = {}
        for k in (8, 72):
            deck = make_decode(k)
            _, cache2 = prefill(qp, prompt)
            float(deck(qp, tok, cache2)[1][0])  # compile+warm
            ts = []
            for _ in range(3):
                _, cache2 = prefill(qp, prompt)
                t0 = time.time()
                out = deck(qp, tok, cache2)[1]
                float(out[0])
                ts.append(time.time() - t0)
            t_by_k[k] = min(ts)
        step_ms = (t_by_k[72] - t_by_k[8]) / 64 * 1e3
        print(f"{name}: step {step_ms:.3f} ms -> "
              f"{B / step_ms * 1e3:.1f} tok/s total "
              f"({1 / step_ms * 1e3:.1f} steps/s)", flush=True)
        results[name + "_ms"] = step_ms

    same = np.array_equal(results["fusedAB"], results["mega_b"])
    print("greedy tokens identical:", same)
    if not same:
        diff = (results["fusedAB"] != results["mega_b"]).mean()
        print("mismatch fraction:", diff)
    print(f"speedup: {results['fusedAB_ms'] / results['mega_b_ms']:.3f}x")


if __name__ == "__main__":
    main()
