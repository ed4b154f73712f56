"""Chip probe: train-step MFU vs remat policy and batch size.

BENCH r5 recorded MFU 0.218 at bs1/seq2048 with full remat (recompute
counted as overhead per the bench's definition). This probe measures the
8B-shape per-layer train-step time by depth-4/depth-2 differencing for
remat in (True, 'dots', False) x bs in (1, 4) to pick the policy the
headline bench should run. 'dots' keeps matmul outputs resident (no
recompute of the dots) so its USEFUL-flops MFU should approach the
hardware utilization of remat=False while still bounding residency.

Run on the TPU host: python experiments/train_mfu_probe2.py
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
import optax  # noqa: E402
from functools import partial  # noqa: E402

from vila_tpu.models import qwen2  # noqa: E402
from vila_tpu.train.fp8_adamw import fp8_adamw  # noqa: E402
from vila_tpu.train.losses import chunked_causal_lm_loss  # noqa: E402

V, S = 32768, 2048
PEAK = 197e12


def diff_time(fn, n_lo, n_hi, *args, reps=2):
    fn(n_lo, *args).block_until_ready()  # compile
    fn(n_hi, *args).block_until_ready()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(n_hi, *args).block_until_ready()
        t_hi = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(n_lo, *args).block_until_ready()
        t_lo = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def step_time_for(depth, B, remat):
    cfg = qwen2.LLMConfig(
        vocab_size=V, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=depth, num_attention_heads=28,
        num_key_value_heads=4, rope_theta=1e6,
        tie_word_embeddings=False, dtype="bfloat16", remat=remat,
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    opt = fp8_adamw(learning_rate=1e-5)
    opt_state = opt.init(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, V)
    labels = jnp.roll(ids, -1, axis=1)

    def loss_fn(p, ids, labels):
        hidden, _ = qwen2.forward(p, cfg, input_ids=ids, return_hidden=True)
        loss, _ = chunked_causal_lm_loss(
            hidden, p, cfg, labels, chunk_size=1024, shift=False)
        return loss

    @partial(jax.jit, static_argnames="n")
    def run(n, params, opt_state):
        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, ids, labels)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=n)
        return losses[-1]

    return diff_time(run, 1, 4, params, opt_state)


def main():
    print("device:", jax.devices()[0], flush=True)
    D, I = 3584, 18944
    p_layer = D * (28 + 2 * 4) * 128 + 28 * 128 * D + 3 * D * I
    for B in (1, 4):
        for remat in (True, "dots", False):
            try:
                t4 = step_time_for(4, B, remat)
                t2 = step_time_for(2, B, remat)
            except Exception as e:  # noqa: BLE001 — OOM at bigger configs
                print(f"bs{B} remat={remat!r}: {type(e).__name__}", flush=True)
                continue
            t_layer = (t4 - t2) / 2
            toks = B * S
            mfu = 6 * p_layer * toks / max(t_layer, 1e-9) / PEAK
            print(
                f"bs{B} remat={remat!r}: layer {t_layer*1e3:.1f} ms, "
                f"layer-MFU {mfu:.3f} (useful flops only)", flush=True)


if __name__ == "__main__":
    main()
