"""Localize the training-MFU gap (BENCH r5: bf16 train MFU 0.216).

Measures, on the attached chip, at the 8B shape (D=3584, I=18944,
GQA 28:4, S=2048, B=1):
  1. bare MLP block (gate_up matmul + silu*mul + down matmul) fwd+bwd
     — the MXU ceiling for the dominant FLOPs;
  2. bare stacked-QKV attention block fwd+bwd (flash kernel VJP);
  3. full decoder stack per-layer marginal (L=4 vs L=2 differencing,
     same method as bench.py) under remat policies:
     off / nothing_saveable / dots_with_no_batch_dims_saveable;
  4. optimizer update alone (fp8_adamw) for one layer's params.

Timing note: over the axon tunnel `jax.block_until_ready` does NOT
reliably fence execution (a first version of this probe read 0.04 ms for
a 2.5-TFLOP matmul chain); every measured computation must end in a
scalar `float()` readback, and loops are jitted `lax.scan` chains whose
n_big/n_small time difference cancels dispatch overhead (bench.py's
diff_time).

Run: python experiments/train_mfu_probe.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

D, I, S, B = 3584, 18944, 2048, 1
H, HKV, HD = 28, 4, 128
PEAK = 197e12


def diff_time(run, n_small=1, n_big=5, reps=3):
    """(t(n_big) - t(n_small)) / (n_big - n_small), mins over reps;
    `run(n)` must END in a float() readback."""
    run(n_small)
    run(n_big)
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(n_small)
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n_big)
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (n_big - n_small)


def chain(grad_fn, args):
    """n grad steps chained through a scalar so no step can be elided:
    a tiny function of step k's grads perturbs step k+1's first input."""
    @partial(jax.jit, static_argnames="n")
    def run_n(args, n):
        def body(carry, _):
            eps, a = carry, args
            first = a[0] + eps.astype(a[0].dtype)
            grads = grad_fn(first, *a[1:])
            eps = sum(jnp.mean(g).astype(jnp.float32)
                      for g in jax.tree.leaves(grads)) * 1e-9
            return eps, None
        eps, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return eps

    return lambda n: float(run_n(args, n))


def mlp_probe():
    k = jax.random.PRNGKey(0)
    w1 = jax.random.normal(k, (D, 2 * I), jnp.bfloat16) * 0.01
    w2 = jax.random.normal(k, (I, D), jnp.bfloat16) * 0.01
    x = jax.random.normal(k, (B * S, D), jnp.bfloat16)

    def f(x, w1, w2):
        gu = x @ w1
        g, u = gu[:, :I], gu[:, I:]
        y = (jax.nn.silu(g.astype(jnp.float32)).astype(jnp.bfloat16) * u) @ w2
        return jnp.sum(y.astype(jnp.float32))

    t = diff_time(chain(jax.grad(f, argnums=(0, 1, 2)), (x, w1, w2)))
    flops = 6 * (D * 2 * I + I * D) * B * S  # fwd+bwd (no remat)
    print(f"MLP fwd+bwd: {t * 1e3:.2f} ms  MFU {flops / t / PEAK:.3f}",
          flush=True)


def attn_probe():
    from vila_tpu.ops.flash_attention import flash_attention

    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (B, S, H, HD), jnp.bfloat16)
    kk = jax.random.normal(k, (B, S, HKV, HD), jnp.bfloat16)
    v = jax.random.normal(k, (B, S, HKV, HD), jnp.bfloat16)

    def f(q, kk, v):
        return jnp.sum(
            flash_attention(q, kk, v, causal=True).astype(jnp.float32))

    t = diff_time(chain(jax.grad(f, argnums=(0, 1, 2)), (q, kk, v)))
    flops = 3.5 * 4 * S * S * H * HD / 2  # fwd 2 dots causal + bwd ~2.5x
    print(f"attn fwd+bwd: {t * 1e3:.2f} ms  (causal-flop MFU "
          f"{flops / t / PEAK:.3f})", flush=True)


def ce_probe():
    from vila_tpu.models import qwen2
    from vila_tpu.train.losses import chunked_causal_lm_loss

    V = 32768
    cfg = qwen2.LLMConfig(
        vocab_size=V, hidden_size=D, intermediate_size=I,
        num_hidden_layers=1, num_attention_heads=H,
        num_key_value_heads=HKV, tie_word_embeddings=False,
        dtype="bfloat16")
    k = jax.random.PRNGKey(0)
    hidden = jax.random.normal(k, (B, S, D), jnp.bfloat16)
    head = {"lm_head": {"kernel": jax.random.normal(
        k, (D, V), jnp.bfloat16) * 0.01}}
    labels = jax.random.randint(k, (B, S), 0, V)

    def f(hidden, head):
        loss, _ = chunked_causal_lm_loss(hidden, head, cfg, labels)
        return loss

    t = diff_time(chain(jax.grad(f, argnums=(0, 1)), (hidden, head)))
    flops = 8 * D * V * B * S  # remat'd chunked proj: fwd+bwd+recompute
    print(f"chunked CE (V={V}) fwd+bwd: {t * 1e3:.2f} ms  "
          f"({flops / t / 1e12:.0f} TF/s)", flush=True)


def layer_marginal(policy_name):
    import optax

    from vila_tpu.models import qwen2
    from vila_tpu.train.losses import chunked_causal_lm_loss

    V = 32768

    def step_time(depth):
        cfg = qwen2.LLMConfig(
            vocab_size=V, hidden_size=D, intermediate_size=I,
            num_hidden_layers=depth, num_attention_heads=H,
            num_key_value_heads=HKV, rope_theta=1e6,
            tie_word_embeddings=False, dtype="bfloat16",
            remat=policy_name,
        )
        params = qwen2.init_params(
            jax.random.PRNGKey(0), cfg, param_dtype=jnp.bfloat16)
        opt = optax.adamw(1e-5)
        opt_state = opt.init(params)
        ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, V)
        labels = jnp.roll(ids, -1, axis=1)

        def loss_fn(p):
            hidden, _ = qwen2.forward(
                p, cfg, input_ids=ids, return_hidden=True)
            loss, _ = chunked_causal_lm_loss(
                hidden, p, cfg, labels, shift=False)
            return loss

        @partial(jax.jit, static_argnames="n")
        def run_n(params, opt_state, n):
            def body(carry, _):
                p, s = carry
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = opt.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n)
            return losses[-1]

        return diff_time(lambda n: float(run_n(params, opt_state, n)),
                         1, 4, reps=2)

    t4, t2 = step_time(4), step_time(2)
    per_layer = (t4 - t2) / 2
    p_layer = D * (H + 2 * HKV) * HD + D * D + 3 * D * I
    flops = 6 * p_layer * B * S + 3.5 * 4 * S * S * H * HD / 2
    t28 = max(t2 - 2 * per_layer, 0.0) + 28 * per_layer
    print(f"remat={policy_name!r}: per-layer {per_layer * 1e3:.2f} ms  "
          f"layer-MFU {flops / per_layer / PEAK:.3f}  "
          f"(28L step ~{t28 * 1e3:.0f} ms)", flush=True)


def opt_probe():
    import optax

    from vila_tpu.train.fp8_adamw import fp8_adamw

    k = jax.random.PRNGKey(0)
    p_layer = {"w1": jax.random.normal(k, (D, 2 * I), jnp.bfloat16),
               "w2": jax.random.normal(k, (I, D), jnp.bfloat16),
               "qkv": jax.random.normal(
                   k, (D, (H + 2 * HKV) * HD), jnp.bfloat16),
               "o": jax.random.normal(k, (D, D), jnp.bfloat16)}
    opt = fp8_adamw(learning_rate=1e-5)
    st0 = opt.init(p_layer)
    g = jax.tree.map(lambda x: x * 0.01, p_layer)

    @partial(jax.jit, static_argnames="n")
    def run_n(g, st, p, n):
        def body(carry, _):
            p, st = carry
            u, st = opt.update(g, st, p)
            return (optax.apply_updates(p, u), st), None
        (p, st), _ = jax.lax.scan(body, (p, st), None, length=n)
        return jnp.mean(p["o"]).astype(jnp.float32)

    t = diff_time(lambda n: float(run_n(g, st0, p_layer, n)), 1, 5)
    nparams = sum(x.size for x in jax.tree.leaves(p_layer))
    print(f"fp8_adamw one-layer update ({nparams/1e6:.0f}M params): "
          f"{t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    mlp_probe()
    attn_probe()
    ce_probe()
    opt_probe()
    for pol in (False, True, "dots"):
        try:
            layer_marginal(pol)
        except Exception as e:  # noqa: BLE001
            print(f"remat={pol!r}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)
