"""Chip probe 3: decompose the 8B-shape train-step per-layer time.

probe2 measured (v5e, seq 2048, full remat, fp8-adamw):
  bs1: 71.0 ms/layer  (useful-flops MFU 0.205)
  bs4: 169.3 ms/layer (useful-flops MFU 0.343)
=> a ~38 ms batch-size-INDEPENDENT component per layer per step, and a
~33 ms/bs1-equivalent marginal cost (marginal MFU ~0.44). Candidates for
the fixed part: optimizer update (param-traffic bound), weight HBM
traffic (fwd read + bwd-transpose read + grad write), flash-attn bwd
inefficiency, scan-carry copies, non-fused transposes.

This probe isolates each term with the same scan-differencing method
(loop-carried dependencies so nothing hoists/DCEs), then optionally dumps
a perfetto trace of the full step for op-level attribution.

Run on the TPU host:
  python experiments/train_mfu_probe3.py [--bs 1 4] [--trace]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from vila_tpu.models import qwen2  # noqa: E402
from vila_tpu.train.fp8_adamw import fp8_adamw  # noqa: E402
from vila_tpu.train.losses import chunked_causal_lm_loss  # noqa: E402

V, S = 32768, 2048
D, I, HQ, HKV, HD = 3584, 18944, 28, 4, 128
PEAK = 197e12
P_LAYER = D * (HQ + 2 * HKV) * HD + HQ * HD * D + 3 * D * I


def diff_time(fn, n_lo, n_hi, reps=3):
    """Median of (t(n_hi) - t(n_lo)) / (n_hi - n_lo)."""
    jax.block_until_ready(fn(n_lo))  # compile both
    jax.block_until_ready(fn(n_hi))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(n_hi))
        t_hi = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fn(n_lo))
        t_lo = time.perf_counter() - t0
        deltas.append((t_hi - t_lo) / (n_hi - n_lo))
    return float(np.median(deltas))


def make_cfg(depth, remat=True):
    return qwen2.LLMConfig(
        vocab_size=V, hidden_size=D, intermediate_size=I,
        num_hidden_layers=depth, num_attention_heads=HQ,
        num_key_value_heads=HKV, rope_theta=1e6,
        tie_word_embeddings=False, dtype="bfloat16", remat=remat,
    )


def loss_of(cfg):
    def loss_fn(p, ids, labels):
        hidden, _ = qwen2.forward(p, cfg, input_ids=ids, return_hidden=True)
        loss, _ = chunked_causal_lm_loss(
            hidden, p, cfg, labels, chunk_size=1024, shift=False)
        return loss
    return loss_fn


def data(B, seed=1):
    ids = jax.random.randint(jax.random.PRNGKey(seed), (B, S), 0, V)
    return ids, jnp.roll(ids, -1, axis=1)


def per_layer(fn_at_depth, b_tag, label):
    t4 = fn_at_depth(4)
    t2 = fn_at_depth(2)
    tl = (t4 - t2) / 2
    print(f"{b_tag} {label}: layer {tl*1e3:6.2f} ms   "
          f"(depth4 {t4*1e3:7.2f}  depth2 {t2*1e3:7.2f})", flush=True)
    return tl


# ---- component: full forward (roll-carried so iterations are live) ----

def t_fwd(depth, B):
    cfg = make_cfg(depth)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    ids, labels = data(B)
    loss_fn = loss_of(cfg)

    @partial(jax.jit, static_argnames="n")
    def run(n):
        def body(carry, _):
            i, acc = carry
            ids_i = jnp.roll(ids, i, axis=1)
            return (i + 1, acc + loss_fn(params, ids_i, labels)), None
        (_, acc), _ = jax.lax.scan(body, (0, 0.0), None, length=n)
        return acc
    return diff_time(run, 1, 4)


# ---- component: forward + backward (grads fully consumed by sums) ----

def t_fwd_bwd(depth, B):
    cfg = make_cfg(depth)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    ids, labels = data(B)
    loss_fn = loss_of(cfg)

    @partial(jax.jit, static_argnames="n")
    def run(n):
        def body(carry, _):
            i, acc = carry
            ids_i = jnp.roll(ids, i, axis=1)
            loss, grads = jax.value_and_grad(loss_fn)(params, ids_i, labels)
            gsum = jax.tree.reduce(
                lambda a, g: a + jnp.sum(g.astype(jnp.float32)), grads, 0.0)
            return (i + 1, acc + loss + gsum), None
        (_, acc), _ = jax.lax.scan(body, (0, 0.0), None, length=n)
        return acc
    return diff_time(run, 1, 4)


# ---- component: full step, choice of optimizer ----

def t_step(depth, B, opt_name):
    cfg = make_cfg(depth)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    opt = (fp8_adamw(learning_rate=1e-5) if opt_name == "fp8"
           else optax.adamw(1e-5))
    opt_state = opt.init(params)
    ids, labels = data(B)
    loss_fn = loss_of(cfg)

    @partial(jax.jit, static_argnames="n")
    def run(n, params, opt_state):
        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, ids, labels)
            updates, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=n)
        return losses[-1]
    return diff_time(lambda n: run(n, params, opt_state), 1, 4)


# ---- component: optimizer only, one layer's param tree ----

def t_opt_only(opt_name, reps_hi=8):
    cfg = make_cfg(1)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    layer = jax.tree.map(lambda x: x[0] if x.ndim == 3 else x,
                         params["layers"])
    opt = (fp8_adamw(learning_rate=1e-5) if opt_name == "fp8"
           else optax.adamw(1e-5))
    opt_state = opt.init(layer)
    grads = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(2), x.shape,
                                    jnp.float32).astype(x.dtype) * 1e-3,
        layer)

    @partial(jax.jit, static_argnames="n")
    def run(n, layer, opt_state):
        def body(carry, _):
            p, s = carry
            u, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, u), s), None
        (layer, opt_state), _ = jax.lax.scan(
            body, (layer, opt_state), None, length=n)
        return jax.tree.leaves(layer)[0]
    t = diff_time(lambda n: run(n, layer, opt_state), 1, reps_hi)
    print(f"opt-only[{opt_name}] one-layer update: {t*1e3:6.2f} ms", flush=True)
    return t


# ---- component: flash attention fwd+bwd at the training shape ----

def t_attn(B):
    from vila_tpu.ops.attention import multi_head_attention
    q = jax.random.normal(jax.random.PRNGKey(3), (B, S, HQ, HD), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, S, HKV, HD), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, S, HKV, HD), jnp.bfloat16)

    def f(q, k, v):
        return jnp.sum(
            multi_head_attention(q, k, v, causal=True).astype(jnp.float32))

    @partial(jax.jit, static_argnames="n")
    def run(n):
        def body(carry, _):
            i, acc = carry
            qi = jnp.roll(q, i, axis=1)
            l, (dq, dk, dv) = jax.value_and_grad(f, argnums=(0, 1, 2))(
                qi, k, v)
            return (i + 1, acc + l + jnp.sum(dq.astype(jnp.float32))
                    + jnp.sum(dk.astype(jnp.float32))
                    + jnp.sum(dv.astype(jnp.float32))), None
        (_, acc), _ = jax.lax.scan(body, (0, 0.0), None, length=n)
        return acc
    t = diff_time(run, 1, 8)
    # causal useful flops: 2 * (qk + av) * 0.5
    flops = 2 * 2 * B * HQ * S * S * HD * 0.5 * 3.5  # fwd + ~2.5x bwd
    print(f"bs{B} attn fwd+bwd: {t*1e3:6.2f} ms  "
          f"(~{flops/max(t,1e-9)/1e12:.0f} TF/s causal-counted)", flush=True)
    return t


# ---- component: MLP fwd+bwd at the training shape ----

def t_mlp(B):
    wg = jax.random.normal(jax.random.PRNGKey(6), (D, I), jnp.bfloat16) * 0.02
    wu = jax.random.normal(jax.random.PRNGKey(7), (D, I), jnp.bfloat16) * 0.02
    wd = jax.random.normal(jax.random.PRNGKey(8), (I, D), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(9), (B * S, D), jnp.bfloat16)

    def f(x, wg, wu, wd):
        y = (jax.nn.silu(x @ wg) * (x @ wu)) @ wd
        return jnp.sum(y.astype(jnp.float32))

    @partial(jax.jit, static_argnames="n")
    def run(n):
        def body(carry, _):
            i, acc = carry
            xi = jnp.roll(x, i, axis=0)
            l, gs = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
                xi, wg, wu, wd)
            s = sum(jnp.sum(g.astype(jnp.float32)) for g in gs)
            return (i + 1, acc + l + s), None
        (_, acc), _ = jax.lax.scan(body, (0, 0.0), None, length=n)
        return acc
    t = diff_time(run, 1, 8)
    flops = 2 * B * S * 3 * D * I * 3  # fwd + 2x bwd
    print(f"bs{B} MLP fwd+bwd: {t*1e3:6.2f} ms  "
          f"({flops/max(t,1e-9)/1e12:.0f} TF/s)", flush=True)
    return t


# ---- component: chunked CE fwd+bwd ----

def t_ce(B):
    cfg = make_cfg(1)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    hidden = jax.random.normal(
        jax.random.PRNGKey(10), (B, S, D), jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(11), (B, S), 0, V)

    def f(h, p):
        loss, _ = chunked_causal_lm_loss(
            h, p, cfg, labels, chunk_size=1024, shift=False)
        return loss

    @partial(jax.jit, static_argnames="n")
    def run(n):
        def body(carry, _):
            i, acc = carry
            hi = jnp.roll(hidden, i, axis=1)
            l, dh = jax.value_and_grad(f)(hi, params)
            return (i + 1, acc + l + jnp.sum(dh.astype(jnp.float32))), None
        (_, acc), _ = jax.lax.scan(body, (0, 0.0), None, length=n)
        return acc
    t = diff_time(run, 1, 8)
    print(f"bs{B} chunked-CE fwd+bwd (lm_head grad incl.): {t*1e3:6.2f} ms",
          flush=True)
    return t


def trace_full_step(B):
    cfg = make_cfg(4)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    opt = fp8_adamw(learning_rate=1e-5)
    opt_state = opt.init(params)
    ids, labels = data(B)
    loss_fn = loss_of(cfg)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids, labels)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p, s, _ = step(params, opt_state)
    jax.block_until_ready(p)
    out_dir = "/tmp/mfu_trace"
    jax.profiler.start_trace(out_dir, create_perfetto_trace=True)
    for _ in range(3):
        p, s, l = step(p, s)
    jax.block_until_ready(l)
    jax.profiler.stop_trace()
    print("trace ->", out_dir, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--skip-components", action="store_true")
    args = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)

    for B in args.bs:
        tag = f"bs{B}"
        tf = per_layer(lambda d: t_fwd(d, B), tag, "fwd only        ")
        tb = per_layer(lambda d: t_fwd_bwd(d, B), tag, "fwd+bwd         ")
        ts = per_layer(lambda d: t_step(d, B, "fp8"), tag, "step (fp8 adamw)")
        ta = per_layer(lambda d: t_step(d, B, "bf16"), tag, "step (bf16 adamw)")
        toks = B * S
        print(f"{tag} summary: fwd {tf*1e3:.1f}  +bwd {(tb-tf)*1e3:.1f}  "
              f"+opt(fp8) {(ts-tb)*1e3:.1f}  +opt(bf16) {(ta-tb)*1e3:.1f}  "
              f"ms/layer;  step-MFU(fp8) "
              f"{6*P_LAYER*toks/max(ts,1e-9)/PEAK:.3f}", flush=True)

    if not args.skip_components:
        t_opt_only("fp8")
        t_opt_only("bf16")
        for B in args.bs:
            t_attn(B)
            t_mlp(B)
            t_ce(B)

    if args.trace:
        trace_full_step(args.bs[0])
    print("RC=0")


if __name__ == "__main__":
    main()
