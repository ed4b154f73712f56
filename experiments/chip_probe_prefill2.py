"""Overhead-calibrated timing: chain N kernel invocations inside ONE jit
via lax.scan-style chaining, compare vs plain bf16 matmul of same shape.
Differential method: time K_hi-chain and K_lo-chain, slope = per-call cost.
"""
import time

import jax
import jax.numpy as jnp

from vila_tpu.ops import quant


def chain_time(fn, args, k_lo=4, k_hi=36, reps=8):
    def chained(k):
        @jax.jit
        def run(x, *rest):
            def body(c, _):
                o = fn(c, *rest)
                # serialize: scalar data dependency XLA cannot fold away
                return c + (jnp.sum(o) * 1e-30).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(c)
        return run

    f_lo, f_hi = chained(k_lo), chained(k_hi)
    float(f_lo(*args)); float(f_hi(*args))
    ts = {k: [] for k in (k_lo, k_hi)}
    for _ in range(reps):
        for k, f in ((k_lo, f_lo), (k_hi, f_hi)):
            t0 = time.perf_counter()
            float(f(*args))
            ts[k].append(time.perf_counter() - t0)
    return (min(ts[k_hi]) - min(ts[k_lo])) / (k_hi - k_lo)


def probe(name, m, din, dout):
    key = jax.random.PRNGKey(0)
    kw, kx = jax.random.split(key)
    w = jax.random.normal(kw, (din, dout), jnp.float32) * 0.02
    x = jax.random.normal(kx, (m, din), jnp.bfloat16)
    q = quant.quantize_w4(w)
    wb = w.astype(jnp.bfloat16)
    flops = 2 * m * din * dout

    t_q = chain_time(
        lambda c, p, s: quant.w4_matmul_prefill(c, p, s),
        (x, q["packed"], q["scales"]),
    )
    t_b = chain_time(
        lambda c, wb: jnp.dot(c, wb, preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16),
        (x, wb),
    )
    print(
        f"{name}: w4={t_q*1e6:7.1f}us ({flops/t_q/1e12:6.2f} TF/s, "
        f"{flops/t_q/1.97e14*100:5.1f}% peak) | "
        f"bf16={t_b*1e6:7.1f}us ({flops/t_b/1.97e14*100:5.1f}% peak) | "
        f"ratio {t_q/t_b:.2f}x"
    )
    return t_q


def main():
    assert jax.default_backend() != "cpu"
    total = 0.0
    total += probe("qkv   3584->4608 ", 384, 3584, 4608)
    total += probe("o     3584->3584 ", 384, 3584, 3584)
    total += probe("gateup 3584->37888", 384, 3584, 37888)
    total += probe("down  18944->3584", 384, 18944, 3584)
    print(f"per-layer total {total*1e6:.1f}us x28 = {total*28*1e3:.2f} ms")


if __name__ == "__main__":
    main()
