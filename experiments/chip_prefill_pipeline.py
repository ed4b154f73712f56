"""Is prefill dequant serializing with the MXU dot? Measure at m=320 on the
8B shapes: (a) current kernel, (b) dots-only (stale scratch), (c) XLA bf16
matmul, (d) pipelined prototype (dequant k while dotting k-1).

PYTHONPATH=/root/.axon_site:/root/repo python experiments/chip_prefill_pipeline.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vila_tpu.ops import quant
from vila_tpu.ops.quant import (
    _prefill_gpb, _tiled_meta, _unpack_planes, pick_bout, quantize_w4,
)


def tmin(f, reps=8):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        jax.tree_util.tree_leaves(r)[0].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def marginal(f, reps=8):
    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = f()
            jax.tree_util.tree_leaves(r)[0].block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(3) - run(1)) / 2 * 1e3


def dots_only_kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref,
                     o_ref, acc_ref, w_lo_ref, w_hi_ref):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_lo_ref[:], w_lo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jax.lax.dot_general(
        x_hi_ref[:], w_hi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _dequant_into(w_lo_ref, w_hi_ref, p_block, s_lo_g, s_hi_g,
                  group_size, gpb):
    lo, h16 = _unpack_planes(p_block)
    for g in range(gpb):
        sl = slice(g * group_size, (g + 1) * group_size)
        s_l = s_lo_g(g).astype(jnp.bfloat16)[None, :]
        s_h = (s_hi_g(g).astype(jnp.float32) * 0.0625).astype(
            jnp.bfloat16)[None, :]
        w_lo_ref[sl, :] = (lo[sl, :].astype(jnp.bfloat16) - 8.0) * s_l
        w_hi_ref[sl, :] = h16[sl, :].astype(jnp.bfloat16) * s_h


def pipelined_kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref,
                     o_ref, acc_ref, w_lo_a, w_hi_a, w_lo_b, w_hi_b, *,
                     group_size, gpb):
    """Grid k runs nk+1 steps. Step k: dot block k-1 from the previous
    slot (k>0), dequant block k into this step's slot (k<nk). Slots are
    SEPARATE scratch buffers selected by static parity branches so Mosaic
    sees static VMEM addressing."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2) - 1

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def dot_from(w_lo_ref, w_hi_ref):
        acc_ref[:] += jax.lax.dot_general(
            x_lo_ref[:], w_lo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jax.lax.dot_general(
            x_hi_ref[:], w_hi_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dequant_into(w_lo_ref, w_hi_ref):
        lo, h16 = _unpack_planes(p_ref[0])
        for g in range(gpb):
            sl = slice(g * group_size, (g + 1) * group_size)
            s_l = s_lo_ref[0, 0, g, :].astype(jnp.bfloat16)[None, :]
            s_h = (s_hi_ref[0, 0, g, :].astype(jnp.float32) * 0.0625
                   ).astype(jnp.bfloat16)[None, :]
            w_lo_ref[sl, :] = (lo[sl, :].astype(jnp.bfloat16) - 8.0) * s_l
            w_hi_ref[sl, :] = h16[sl, :].astype(jnp.bfloat16) * s_h

    even = ki % 2 == 0

    @pl.when((ki > 0) & even)
    def _():
        dot_from(w_lo_b, w_hi_b)

    @pl.when((ki > 0) & ~even)
    def _():
        dot_from(w_lo_a, w_hi_a)

    @pl.when((ki < nk) & even)
    def _():
        dequant_into(w_lo_a, w_hi_a)

    @pl.when((ki < nk) & ~even)
    def _():
        dequant_into(w_lo_b, w_hi_b)

    @pl.when(ki == nk)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def run_variant(x, packed, scales, kernel_fn, pipelined, block_m=512):
    m, din = x.shape
    half, bout, nj, ngh, group_size, din_w, dout = _tiled_meta(packed, scales)
    block_m = max(8, min(block_m, m))
    m_pad = (block_m - m % block_m) % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    gpb = _prefill_gpb(ngh)
    block_in = gpb * group_size
    nk = half // block_in
    s_lo4 = scales[:, :ngh, :].reshape(nj, nk, gpb, bout)
    s_hi4 = scales[:, ngh: 2 * ngh, :].reshape(nj, nk, gpb, bout)

    if pipelined:
        grid = (x.shape[0] // block_m, nj, nk + 1)
        kmap = lambda i, j, k: (i, jnp.minimum(k, nk - 1))
        kmap_x = lambda i, j, k: (i, jnp.maximum(k - 1, 0))
        in_specs = [
            pl.BlockSpec((block_m, block_in), kmap_x),
            pl.BlockSpec((block_m, block_in), kmap_x),
            pl.BlockSpec((1, block_in, bout),
                         lambda i, j, k: (j, jnp.minimum(k, nk - 1), 0)),
            pl.BlockSpec((1, 1, gpb, bout),
                         lambda i, j, k: (j, jnp.minimum(k, nk - 1), 0, 0)),
            pl.BlockSpec((1, 1, gpb, bout),
                         lambda i, j, k: (j, jnp.minimum(k, nk - 1), 0, 0)),
        ]
        scratch = [
            pltpu.VMEM((block_m, bout), jnp.float32),
            pltpu.VMEM((block_in, bout), jnp.bfloat16),
            pltpu.VMEM((block_in, bout), jnp.bfloat16),
            pltpu.VMEM((block_in, bout), jnp.bfloat16),
            pltpu.VMEM((block_in, bout), jnp.bfloat16),
        ]
        kern = functools.partial(kernel_fn, group_size=group_size, gpb=gpb)
    else:
        grid = (x.shape[0] // block_m, nj, nk)
        in_specs = [
            pl.BlockSpec((block_m, block_in), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_m, block_in), lambda i, j, k: (i, k)),
            pl.BlockSpec((1, block_in, bout), lambda i, j, k: (j, k, 0)),
            pl.BlockSpec((1, 1, gpb, bout), lambda i, j, k: (j, k, 0, 0)),
            pl.BlockSpec((1, 1, gpb, bout), lambda i, j, k: (j, k, 0, 0)),
        ]
        scratch = [
            pltpu.VMEM((block_m, bout), jnp.float32),
            pltpu.VMEM((block_in, bout), jnp.bfloat16),
            pltpu.VMEM((block_in, bout), jnp.bfloat16),
        ]
        kern = kernel_fn

    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, bout), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], dout), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )
    out = f(x[:, :half], x[:, half:], packed, s_lo4, s_hi4)
    return out[:m]


def main():
    assert jax.default_backend() != "cpu"
    m = 320
    key = jax.random.PRNGKey(0)
    # gate_up shape: 3584 -> 37888 (the big one)
    din, dout = 3584, 2 * 18944
    w = jax.random.normal(key, (din, dout), jnp.float32) * 0.02
    qd = quantize_w4(w)
    packed, scales = qd["packed"], qd["scales"]
    x = jax.random.normal(key, (m, din), jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    cur = lambda x: quant.w4_matmul_prefill(x, packed, scales)
    dots = lambda x: run_variant(x, packed, scales, dots_only_kernel,
                                 pipelined=False)
    pipe = lambda x: run_variant(x, packed, scales, pipelined_kernel,
                                 pipelined=True)
    ref = lambda x, w: x @ w

    o_cur = jax.jit(cur)(x)
    o_pipe = jax.jit(pipe)(x)
    err = float(jnp.max(jnp.abs(o_cur.astype(jnp.float32)
                                - o_pipe.astype(jnp.float32))))
    print("pipelined max |diff| vs current:", err)

    def chained(fn, *extra):
        @functools.partial(jax.jit, static_argnames="n")
        def run(n, x, *extra):
            def body(c, _):
                o = fn(c, *extra)
                return c + (o[:, :c.shape[1]] * 1e-12).astype(c.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out.sum()
        def timed(n):
            run(n, x, *extra).block_until_ready()
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                run(n, x, *extra).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best
        return (timed(12) - timed(4)) / 8 * 1e3

    print(f"current kernel:   {chained(cur):7.3f} ms")
    print(f"dots only:        {chained(dots):7.3f} ms")
    print(f"pipelined:        {chained(pipe):7.3f} ms")
    print(f"XLA bf16 matmul:  {chained(ref, wb):7.3f} ms")


if __name__ == "__main__":
    main()
