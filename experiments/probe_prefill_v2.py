"""On-chip probe for the prefill kernel: correctness + differential timing.

The dev TPU sits behind a tunnel where per-call dispatch costs ~2 ms and
block_until_ready is unreliable, so timing is differential: run K matmuls
chained inside ONE jit (output feeds the next input's first column so XLA
cannot CSE or parallelize them), read back one scalar, and subtract the
K=1 time. Same method as bench.py.
"""
import time

import jax
import jax.numpy as jnp

from vila_tpu.ops.quant import quantize_w4, w4_matmul_prefill, dequantize


def chained(m, din, dout, k, reps=5):
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (m, din), jnp.bfloat16)
    w = jax.random.normal(kw, (din, dout), jnp.float32) * 0.02
    q = quantize_w4(w)

    @jax.jit
    def run(x):
        def body(carry, _):
            out = w4_matmul_prefill(carry, q["packed"], q["scales"])
            # fold one output scalar back into the input: serializes steps.
            # The 1e-24 factor rounds away in bf16 addition but XLA cannot
            # prove that, so the loop body stays loop-variant (a literal *0
            # gets constant-folded and the matmul hoisted out of the scan).
            nxt = carry + (out[0, 0].astype(jnp.float32) * 1e-24).astype(
                carry.dtype
            )
            return nxt, out[0, 0]
        _, outs = jax.lax.scan(body, x, None, length=k)
        return outs.sum()

    run(x).block_until_ready()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best, q, x


def bench_one(m, din, dout, k_lo=8, k_hi=72):
    t_lo, q, x = chained(m, din, dout, k_lo)
    t_hi, _, _ = chained(m, din, dout, k_hi)
    dt = (t_hi - t_lo) / (k_hi - k_lo)
    out = w4_matmul_prefill(x, q["packed"], q["scales"])
    ref = (x.astype(jnp.float32) @ dequantize(q).astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    flops = 2 * m * din * dout
    print(
        f"  ({m:5d},{din:5d},{dout:6d}): {dt*1e3:7.3f} ms  "
        f"{flops/dt/1e12:6.2f} TF/s  rel-err={err/scale:.2e}"
    )
    assert err / scale < 2e-2, (m, din, dout, err / scale)
    return dt


def main():
    print(f"devices: {jax.devices()}")
    D, I = 3584, 18944
    DQKV = 3584 + 2 * 512
    shapes = [
        (384, D, DQKV),   # qkv
        (384, D, D),      # o
        (384, D, 2 * I),  # gate_up
        (384, I, D),      # down
        (3584, D, 5632),  # patch-discussion probe shape
    ]
    total = 0.0
    print("per-shape (differential, K=8 vs K=72 chained):")
    for m, din, dout in shapes:
        dt = bench_one(m, din, dout)
        if m == 384:
            total += dt * 28
    print(f"8B 384-tok prefill matmul time (28 layers): {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
