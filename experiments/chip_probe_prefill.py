"""On-chip validation + timing for the v2 W4 prefill kernel.

Runs on the real TPU (no conftest override): numerics vs
dequantize-then-matmul at 8B shapes, then differential timing of the
prefill matmul across the hot shapes of the 8B decoder
(qkv 3584->4608, o 3584->3584, gate_up 3584->2*18944 split, down
18944->3584) at M=384 (single-image prompt bucket).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vila_tpu.ops import quant


def check_one(m, din, dout, seed):
    key = jax.random.PRNGKey(seed)
    kw, kx = jax.random.split(key)
    w = jax.random.normal(kw, (din, dout), jnp.float32) * 0.02
    x = jax.random.normal(kx, (m, din), jnp.bfloat16)
    q = quant.quantize_w4(w)
    ref = (x.astype(jnp.float32) @ quant.dequantize(q).astype(jnp.float32))
    out = quant.w4_matmul_prefill(x, q["packed"], q["scales"])
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    rel = err / float(jnp.max(jnp.abs(ref)) + 1e-9)
    print(f"  ({m},{din})->({dout}): max_abs={err:.4g} rel={rel:.4g}")
    return q, x, rel


def time_one(name, m, din, dout, reps=30):
    q, x, _ = check_one(m, din, dout, hash(name) % 1000)
    f = jax.jit(
        lambda x, p, s: quant.w4_matmul_prefill(x, p, s)
    )
    args = (x, q["packed"], q["scales"])
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * m * din * dout
    print(
        f"{name}: {dt*1e6:.1f} us  {flops/dt/1e12:.2f} TFLOP/s "
        f"({flops/dt/1e12/197*100:.1f}% of v5e bf16 peak)"
    )
    return dt


def main():
    print("devices:", jax.devices())
    assert jax.default_backend() != "cpu", "need the TPU chip"
    print("== numerics ==")
    for (m, din, dout) in [(384, 3584, 4608), (384, 3584, 5632),
                           (384, 18944, 3584), (128, 3584, 3584)]:
        _, _, rel = check_one(m, din, dout, m + din)
        assert rel < 2e-2, rel
    print("== timing (8B prefill shapes, M=384) ==")
    total = 0.0
    total += time_one("qkv   3584->4608 ", 384, 3584, 4608)
    total += time_one("o     3584->3584 ", 384, 3584, 3584)
    total += time_one("gateup 3584->37888", 384, 3584, 37888)
    total += time_one("down  18944->3584", 384, 18944, 3584)
    print(f"per-layer linear total: {total*1e6:.1f} us  x28 layers = "
          f"{total*28*1e3:.2f} ms")


if __name__ == "__main__":
    main()
