"""Test: stacked prefill with the scale slice+reshape hoisted OUT of the
per-layer call — passes kernel-ready 5D scales straight to pallas_call."""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from vila_tpu.ops import quant
from vila_tpu.ops.quant import (
    _prefill_block_body, _tiled_meta, _interpret,
)


def w4_prefill_stacked_hoisted(x, packed, s_lo5, s_hi5, layer_index,
                               group_size=128):
    m, din = x.shape
    L, nj, half, bout = packed.shape
    gpb = s_lo5.shape[3]
    nk = s_lo5.shape[2]
    block_in = gpb * group_size
    dout = nj * bout
    block_m = max(8, min(512, m))
    m_pad = (block_m - m % block_m) % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    grid = (x.shape[0] // block_m, nj, nk)
    scratch = [
        pltpu.VMEM((block_m, bout), jnp.float32),
        pltpu.VMEM((block_in, bout), jnp.bfloat16),
        pltpu.VMEM((block_in, bout), jnp.bfloat16),
    ]
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )

    def wrapped(l_ref, x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref,
                o_ref, acc_ref, w_lo_ref, w_hi_ref):
        _prefill_block_body(
            x_lo_ref, x_hi_ref, p_ref[0, 0],
            lambda g: s_lo_ref[0, 0, 0, g, :],
            lambda g: s_hi_ref[0, 0, 0, g, :],
            o_ref, acc_ref, w_lo_ref, w_hi_ref,
            group_size=group_size, groups_per_block=gpb,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_in), lambda i, j, k, l: (i, k)),
            pl.BlockSpec((block_m, block_in), lambda i, j, k, l: (i, k)),
            pl.BlockSpec((1, 1, block_in, bout),
                         lambda i, j, k, l: (l[0], j, k, 0)),
            pl.BlockSpec((1, 1, 1, gpb, bout),
                         lambda i, j, k, l: (l[0], j, k, 0, 0)),
            pl.BlockSpec((1, 1, 1, gpb, bout),
                         lambda i, j, k, l: (l[0], j, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, bout), lambda i, j, k, l: (i, j)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        wrapped, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], dout), x.dtype),
        compiler_params=cp, interpret=_interpret(),
    )(
        jnp.asarray(layer_index, jnp.int32).reshape(1),
        x[:, :half], x[:, half:], packed, s_lo5, s_hi5,
    )
    return out[:m]


def chain_time(fn, args, k_lo=4, k_hi=36, reps=8):
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
    key = jax.random.PRNGKey(0)
    for name in ("qkv_proj", "o_proj", "gate_up_proj", "down_proj"):
        slot = lp[name]
        pk, sc = slot["packed"], slot["scales"]
        L, nj, half, bout = pk.shape
        din = half * 2
        G = 128
        ngh = din // (2 * G)
        gpb = 8
        while ngh % gpb != 0:
            gpb //= 2
        nk = half // (gpb * G)
        s_lo5 = jax.jit(lambda s: s[:, :, :ngh, :].reshape(
            L, nj, nk, gpb, bout))(sc)
        s_hi5 = jax.jit(lambda s: s[:, :, ngh:2 * ngh, :].reshape(
            L, nj, nk, gpb, bout))(sc)
        x = (jax.random.normal(key, (M, din)) * 0.02).astype(jnp.bfloat16)
        li = jnp.zeros((), jnp.int32)
        # correctness vs existing stacked
        a = quant.w4_matmul_prefill(x, pk, sc, layer_index=li)
        b = w4_prefill_stacked_hoisted(x, pk, s_lo5, s_hi5, li)
        assert float(jnp.max(jnp.abs(a - b))) == 0.0, name
        t_h = chain_time(
            lambda c, pk, lo, hi, li: w4_prefill_stacked_hoisted(
                c, pk, lo, hi, li),
            (x, pk, s_lo5, s_hi5, li),
        )
        t_st = chain_time(
            lambda c, pk, sc, li: quant.w4_matmul_prefill(
                c, pk, sc, layer_index=li),
            (x, pk, sc, li),
        )
        print(f"{name:14s} stacked={t_st*1e6:7.1f}us hoisted={t_h*1e6:7.1f}us")


if __name__ == "__main__":
    main()
