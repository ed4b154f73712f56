"""Per-shape stacked-vs-flat w4 prefill timing on chip."""
import jax
import jax.numpy as jnp

import bench
from vila_tpu.ops import quant


def chain_time(fn, args, k_lo=4, k_hi=36, reps=8):
    import time

    def chained(k):
        @jax.jit
        def run(x, *rest):
            def body(c, _):
                o = fn(c, *rest)
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


def main():
    assert jax.default_backend() != "cpu"
    params, cfg = bench.build_8b_quantized()
    lp = params["llm"]["layers"]
    M = 384
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    for name in ("qkv_proj", "o_proj", "gate_up_proj", "down_proj"):
        slot = lp[name]
        pk, sc = slot["packed"], slot["scales"]
        din = pk.shape[-2] * 2
        x = (jax.random.normal(key, (M, din)) * 0.02).astype(dt)
        li = jnp.zeros((), jnp.int32)
        t_st = chain_time(
            lambda c, pk, sc, li: quant.w4_matmul_prefill(
                c, pk, sc, layer_index=li),
            (x, pk, sc, li),
        )
        pk0, sc0 = pk[0], sc[0]
        t_fl = chain_time(
            lambda c, pk0, sc0: quant.w4_matmul_prefill(c, pk0, sc0),
            (x, pk0, sc0),
        )
        print(f"{name:14s} din={din:6d} dout={pk.shape[1]*pk.shape[-1]:6d} "
              f"stacked={t_st*1e6:7.1f}us flat={t_fl*1e6:7.1f}us "
              f"ratio={t_st/t_fl:.2f}")


if __name__ == "__main__":
    main()
