"""Prefill kernel v3 candidates, flat shapes, on-chip timing.

v2 (current): dequant whole (block_in, bout) scratch, then 2 big dots.
v3a: interleave at sub-chunk granularity — dequant chunk c, dot chunk c —
     giving Mosaic freedom to overlap VPU dequant with MXU dots.
v3b: single concatenated dot (scratch K = 2*block_in, one dot per k-step).
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vila_tpu.ops import quant
from vila_tpu.ops.quant import _unpack_planes, _interpret, _prefill_gpb


def make_prefill(variant, chunks=2):
    def kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref,
               o_ref, acc_ref, w_lo_ref, w_hi_ref, *,
               group_size, gpb):
        ki = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lo, h16 = _unpack_planes(p_ref[0])
        if variant == "v3a":
            nch = max(1, min(chunks, gpb))
            gs_per_chunk = gpb // nch
            for c in range(nch):
                for g in range(c * gs_per_chunk, (c + 1) * gs_per_chunk):
                    sl = slice(g * group_size, (g + 1) * group_size)
                    s_l = s_lo_ref[0, 0, g, :].astype(jnp.bfloat16)[None, :]
                    s_h = (s_hi_ref[0, 0, g, :].astype(jnp.float32)
                           * 0.0625).astype(jnp.bfloat16)[None, :]
                    w_lo_ref[sl, :] = (
                        lo[sl, :].astype(jnp.bfloat16) - 8.0) * s_l
                    w_hi_ref[sl, :] = h16[sl, :].astype(jnp.bfloat16) * s_h
                csl = slice(c * gs_per_chunk * group_size,
                            (c + 1) * gs_per_chunk * group_size)
                acc_ref[:] += jax.lax.dot_general(
                    x_lo_ref[:, csl], w_lo_ref[csl, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[:] += jax.lax.dot_general(
                    x_hi_ref[:, csl], w_hi_ref[csl, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:  # v3b: single dot over concatenated planes
            for g in range(gpb):
                sl = slice(g * group_size, (g + 1) * group_size)
                s_l = s_lo_ref[0, 0, g, :].astype(jnp.bfloat16)[None, :]
                s_h = (s_hi_ref[0, 0, g, :].astype(jnp.float32)
                       * 0.0625).astype(jnp.bfloat16)[None, :]
                w_lo_ref[sl, :] = (lo[sl, :].astype(jnp.bfloat16) - 8.0) * s_l
                w_hi_ref[sl, :] = h16[sl, :].astype(jnp.bfloat16) * s_h
            xc = jnp.concatenate([x_lo_ref[:], x_hi_ref[:]], axis=1)
            wc = jnp.concatenate([w_lo_ref[:], w_hi_ref[:]], axis=0)
            acc_ref[:] += jax.lax.dot_general(
                xc, wc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(ki == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=())
    def matmul(x, packed, scales):
        m, din = x.shape
        half, bout, nj, ngh, group_size, din_w, dout = quant._tiled_meta(
            packed, scales)
        block_m = max(8, min(512, m))
        m_pad = (block_m - m % block_m) % block_m
        if m_pad:
            x = jnp.pad(x, ((0, m_pad), (0, 0)))
        gpb = _prefill_gpb(ngh)
        block_in = gpb * group_size
        nk = half // block_in
        grid = (x.shape[0] // block_m, nj, nk)
        s_lo4 = scales[:, :ngh, :].reshape(nj, nk, gpb, bout)
        s_hi4 = scales[:, ngh:2 * ngh, :].reshape(nj, nk, gpb, bout)
        scratch = [
            pltpu.VMEM((block_m, bout), jnp.float32),
            pltpu.VMEM((block_in, bout), jnp.bfloat16),
            pltpu.VMEM((block_in, bout), jnp.bfloat16),
        ]
        out = pl.pallas_call(
            functools.partial(kernel, group_size=group_size, gpb=gpb),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_in), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_m, block_in), lambda i, j, k: (i, k)),
                pl.BlockSpec((1, block_in, bout), lambda i, j, k: (j, k, 0)),
                pl.BlockSpec((1, 1, gpb, bout), lambda i, j, k: (j, k, 0, 0)),
                pl.BlockSpec((1, 1, gpb, bout), lambda i, j, k: (j, k, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_m, bout), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], dout), x.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=_interpret(),
        )(x[:, :half], x[:, half:], packed, s_lo4, s_hi4)
        return out[:m]

    return matmul


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
    key = jax.random.PRNGKey(0)
    M = 384
    for (name, din, dout) in [("gateup", 3584, 37888), ("down", 18944, 3584),
                              ("qkv", 3584, 4608)]:
        kw, kx = jax.random.split(jax.random.fold_in(key, din))
        w = jax.random.normal(kw, (din, dout), jnp.float32) * 0.02
        x = jax.random.normal(kx, (M, din), jnp.bfloat16)
        q = quant.quantize_w4(w)
        args = (x, q["packed"], q["scales"])
        ref = quant.w4_matmul_prefill(*args)
        row = [name]
        t0 = chain_time(lambda c, p, s: quant.w4_matmul_prefill(c, p, s), args)
        row.append(f"v2={t0*1e6:7.1f}us")
        for variant, ch in (("v3a", 2), ("v3a", 4), ("v3b", 0)):
            f = make_prefill(variant, ch)
            out = f(*args)
            err = float(jnp.max(jnp.abs(out - ref)))
            t = chain_time(lambda c, p, s, f=f: f(c, p, s), args)
            row.append(f"{variant}/{ch}={t*1e6:7.1f}us(err{err:.3g})")
        print("  ".join(row))


if __name__ == "__main__":
    main()
