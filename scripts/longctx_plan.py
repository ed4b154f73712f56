"""1M-token context: compile-only memory plan on an 8-device mesh.

VERDICT r3 #10: the 262k-token run (LONGCTX_r03.json) proved the sharded
long-context path *executes*; running the 1M config end-to-end on the
virtual CPU mesh would take ~40h. This script proves the 1M config
*compiles* instead: it lowers + compiles the full-8B-shape chunked-prefill
and decode steps of `LongContextEngine` at max_cache_len=1,048,576 over an
8-device mesh (GSPMD partitions everything exactly as it would on 8×v5e)
without materializing a single parameter or cache byte, then records the
compiler's own per-device memory analysis next to the analytic plan.

Reference anchor: longvila/README.md:17 (NIAH 99.8% @ >1M tokens,
multi-GPU ring inference).

Run: python scripts/longctx_plan.py [--round N]   (sets its own CPU env)
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys

# The ambient environment pins JAX_PLATFORMS to the TPU plugin and re-appends
# it even when the env var is overridden; the config update below (after
# import, before backend init — backends are lazy) is the only reliable
# override. Same pattern as tests/conftest.py.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

GIB = 1 << 30


def mem_analysis(compiled):
    """Pull per-device byte counts out of compiled.memory_analysis()."""
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--cache", type=int, default=1 << 20)
    ap.add_argument("--chunk", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vila_tpu.inference.long_context import LongContextEngine
    from vila_tpu.models import qwen2
    from vila_tpu.parallel.mesh import llm_param_specs, make_mesh

    n_dev = len(jax.devices())
    assert n_dev == 8, n_dev

    # NVILA-8B LLM shape (Qwen2.5-7B); LongVILA-style raised rope_theta for
    # the extended context (reference: 4_extend_llm_*.sh progression).
    cfg = qwen2.LLMConfig(
        vocab_size=152064,
        hidden_size=3584,
        intermediate_size=18944,
        num_hidden_layers=28,
        num_attention_heads=28,
        num_key_value_heads=4,
        rope_theta=15.3e6,
        dtype="bfloat16",
    )
    mesh = make_mesh(sp=8)
    specs = llm_param_specs(cfg, mesh)

    # Abstract params + cache: shapes/dtypes only, zero host/device bytes.
    params_abs = jax.eval_shape(
        lambda rng: qwen2.init_params(rng, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    engine = LongContextEngine(
        params_abs, cfg, mesh,
        max_cache_len=args.cache, prefill_chunk=args.chunk,
        param_specs=specs,
    )
    cache_abs = jax.eval_shape(
        lambda: qwen2.init_cache(cfg, batch=1, max_len=args.cache)
    )

    D = cfg.hidden_size
    kv_dim = cfg.num_key_value_heads * cfg.head_dim_
    kv_bytes = 2 * cfg.num_hidden_layers * args.cache * kv_dim * 2
    param_bytes = sum(
        int(jnp.prod(jnp.asarray(x.shape))) * x.dtype.itemsize
        for x in jax.tree.leaves(params_abs)
    )
    plan = {
        "model": "NVILA-8B LLM shape (Qwen2.5-7B), bf16",
        "mesh": f"{n_dev}-device (sp={n_dev}), KV seq-sharded + FSDP params",
        "cache_len": args.cache,
        "prefill_chunk": args.chunk,
        "analytic": {
            "kv_cache_bytes_per_device": kv_bytes // n_dev,
            "param_bytes_per_device": param_bytes // n_dev,
            "kv_cache_gib_per_device": round(kv_bytes / n_dev / GIB, 2),
            "param_gib_per_device": round(param_bytes / n_dev / GIB, 2),
            "note": "replicated params would need "
                    f"{round(param_bytes / GIB, 1)} GiB/chip — over a v5e's "
                    "16 GiB HBM on their own; FSDP sharding is mandatory "
                    "at this scale, hence param_specs.",
        },
    }

    with mesh:
        print("lowering + compiling 1M chunked-prefill step ...", flush=True)
        lowered = engine._prefill_chunk_fn.lower(
            params_abs,
            jax.ShapeDtypeStruct((1, args.chunk, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, args.chunk), jnp.bool_),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            cache_abs,
        )
        prefill_exe = lowered.compile()
        plan["prefill_compiled"] = True
        plan["prefill_memory_analysis"] = mem_analysis(prefill_exe)

        print("lowering + compiling 1M decode step (8-token scan) ...",
              flush=True)
        lowered_d = engine._decode_fn.lower(
            params_abs,
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            cache_abs,
            8,
        )
        decode_exe = lowered_d.compile()
        plan["decode_compiled"] = True
        plan["decode_memory_analysis"] = mem_analysis(decode_exe)

    n_chunks = args.cache // args.chunk
    plan["prefill_steps_to_fill_1m"] = n_chunks
    plan["ok"] = True

    print(json.dumps(plan, indent=2))
    if args.round:
        # keep the executed-262k evidence alongside the compiled-1M plan
        prev = os.path.join(REPO, "LONGCTX_r03.json")
        if os.path.exists(prev):
            with open(prev) as f:
                plan["executed_262k_r03"] = json.load(f)
        fname = os.path.join(REPO, f"LONGCTX_r{args.round:02d}.json")
        with open(fname, "w") as f:
            json.dump(plan, f, indent=2)
        print("wrote", fname)


if __name__ == "__main__":
    main()
