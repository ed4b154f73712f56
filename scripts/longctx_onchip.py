"""1M-token context: REAL-TPU-compiler validation of the memory plan.

VERDICT r4 weak #6: `scripts/longctx_plan.py` compiles the 1M-token
chunked-prefill/decode steps on the 8-device *CPU* mesh, and XLA-CPU
reports a 131.7 GB temp figure for the prefill step with only a prose
argument that the TPU allocator reuses buffers. This script replaces the
prose with numbers from the actual TPU toolchain, attached to one chip:

  1. **Deviceless 8-device AOT compile** (preferred): build a v5e 2x4
     topology via `jax.experimental.topologies`, compile the SAME
     8-device GSPMD program `longctx_plan.py` compiles on CPU — FSDP
     params + seq-sharded 1M KV — with the real TPU compiler, and record
     its per-device `memory_analysis()`.
  2. **Single-chip 1/8-shard proxy** (fallback, and always recorded):
     compile a 1-device LongContextEngine whose shapes equal ONE shard of
     the 8-device plan — cache 1M/8 = 131072 rows, per-device prefill
     chunk 4096/8 = 512 — so temp memory comes from the same compiler
     that would schedule each shard. Params stay full-shape abstract
     arguments (argument bytes don't count toward temp; at runtime each
     device holds 1/8 under FSDP + one layer's all-gather buffer, sized
     analytically below).

Appends an `on_chip` section to LONGCTX_r{N}.json (written by
longctx_plan.py — run that first).

Run on the TPU host: python scripts/longctx_onchip.py --round 5
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

GIB = 1 << 30


def mem_analysis(compiled):
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return None
    if ma is None:
        return None
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    return out or None


def build_cfg():
    from vila_tpu.models import qwen2

    return qwen2.LLMConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28,
        num_key_value_heads=4, rope_theta=15.3e6, dtype="bfloat16",
    )


def compile_engine(cfg, mesh, *, cache_len, chunk, param_specs):
    """Lower+compile the prefill-chunk and decode steps from abstract
    arrays; return their memory analyses."""
    import jax
    import jax.numpy as jnp

    from vila_tpu.inference.long_context import LongContextEngine
    from vila_tpu.models import qwen2

    engine = LongContextEngine(
        None, cfg, mesh, max_cache_len=cache_len, prefill_chunk=chunk,
        param_specs=param_specs,
    )
    params_abs = jax.eval_shape(
        lambda rng: qwen2.init_params(rng, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    cache_abs = jax.eval_shape(
        lambda: qwen2.init_cache(cfg, batch=1, max_len=cache_len)
    )
    out = {}
    with mesh:
        pre = engine._prefill_chunk_fn.lower(
            params_abs,
            jax.ShapeDtypeStruct((1, chunk, cfg.hidden_size), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, chunk), jnp.bool_),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            cache_abs,
        ).compile()
        out["prefill_memory_analysis"] = mem_analysis(pre)
        dec = engine._decode_fn.lower(
            params_abs,
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            cache_abs,
            8,
        ).compile()
        out["decode_memory_analysis"] = mem_analysis(dec)
    return out


def try_deviceless_8dev(cfg):
    """AOT-compile the true 8-device program against a detached v5e 2x4
    topology. Returns a result dict or an {'error': ...} marker."""
    import jax

    from vila_tpu.parallel.mesh import llm_param_specs

    try:
        from jax.experimental import topologies

        topo = None
        errors = []
        for name in ("v5e:2x4", "v5litepod-8", "v5e-8"):
            try:
                topo = topologies.get_topology_desc(
                    platform="tpu", topology_name=name)
                break
            except Exception as e:  # noqa: BLE001
                errors.append(f"{name}: {type(e).__name__}: {e}")
        if topo is None:
            return {"error": "; ".join(errors)[:500]}
        devs = topo.devices
        if len(devs) != 8:
            return {"error": f"topology has {len(devs)} devices"}
        mesh = jax.sharding.Mesh(
            np.asarray(devs).reshape(1, 8, 1, 1),
            axis_names=("dp", "sp", "su", "tp"),
        )
        specs = llm_param_specs(cfg, mesh)
        res = compile_engine(
            cfg, mesh, cache_len=1 << 20, chunk=4096, param_specs=specs)
        res["topology"] = getattr(topo, "platform_version", None) or "v5e 2x4"
        return res
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"[:500]}


def single_chip_shard_proxy(cfg):
    """Compile the 1/8-shard shapes on the attached chip itself.

    Full 28-layer params as arguments are 20 GB — over one chip's HBM on
    their own (the TPU compiler counts argument bytes, r5 measured), so
    the proxy compiles a 7-layer depth slice: the scan body is identical
    and temp/alias scheduling scales per-layer."""
    import dataclasses

    import jax

    cfg = dataclasses.replace(cfg, num_hidden_layers=7)
    dev = jax.devices()[:1]
    mesh = jax.sharding.Mesh(
        np.asarray(dev).reshape(1, 1, 1, 1),
        axis_names=("dp", "sp", "su", "tp"),
    )
    res = compile_engine(
        cfg, mesh, cache_len=(1 << 20) // 8, chunk=4096 // 8,
        param_specs=None,
    )
    res["proxy_layers"] = cfg.num_hidden_layers
    # at runtime each device holds 1/8 of the params under FSDP plus one
    # layer's all-gather buffer; the proxy passes full params as arguments
    # instead, so size the real resident figure analytically
    d, inter = cfg.hidden_size, cfg.intermediate_size
    biggest_layer = 2 * (
        d * (cfg.num_attention_heads + 2 * cfg.num_key_value_heads)
        * cfg.head_dim_ + 3 * d * inter + d * cfg.vocab_size
    )
    res["note"] = (
        "cache/chunk are ONE shard of the 8-device plan (131072 rows, "
        "512-token chunk); params enter as full-shape arguments for "
        "compile-only analysis — true per-device residency is "
        "params/8 + one layer's FSDP all-gather buffer"
    )
    res["fsdp_allgather_upper_bound_bytes"] = biggest_layer
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=0)
    args = ap.parse_args()

    import jax

    assert jax.devices()[0].platform != "cpu", (
        "run on the TPU host (this script validates the TPU compiler)")
    cfg = build_cfg()

    print("attempting deviceless 8-device v5e topology compile ...",
          flush=True)
    dev8 = try_deviceless_8dev(cfg)
    print(json.dumps(dev8, indent=2)[:2000], flush=True)

    print("compiling single-chip 1/8-shard proxy ...", flush=True)
    try:
        proxy = single_chip_shard_proxy(cfg)
    except Exception as e:  # noqa: BLE001 — record, don't lose dev8
        proxy = {"error": f"{type(e).__name__}: {e}"[:500]}
    print(json.dumps(proxy, indent=2), flush=True)

    on_chip = {
        "tpu": str(jax.devices()[0]),
        "deviceless_8dev_compile": dev8,
        "single_chip_shard_compile": proxy,
    }
    if args.round:
        fname = os.path.join(REPO, f"LONGCTX_r{args.round:02d}.json")
        plan = {}
        if os.path.exists(fname):
            with open(fname) as f:
                plan = json.load(f)
        plan["on_chip"] = on_chip
        with open(fname, "w") as f:
            json.dump(plan, f, indent=2)
        print("updated", fname)


if __name__ == "__main__":
    main()
