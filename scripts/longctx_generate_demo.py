"""256k-token *generation* demo on the 8-device virtual CPU mesh.

Drives LongContextEngine end to end: 256k-token prompt embeddings are
chunk-prefilled into a sequence-sharded KV cache, then >=32 tokens decode
against the full sharded context (r2 VERDICT next-step #6's "Done" bar).
Writes LONGCTX_r03.json with the verified numbers.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/longctx_generate_demo.py [total_tokens] [decode_tokens]
"""

import json
import os
import sys
import time

# the ambient env pins JAX_PLATFORMS to the TPU plugin; force CPU (same
# override as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vila_tpu.inference.long_context import LongContextEngine
from vila_tpu.models import qwen2


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    n_decode = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    cfg = qwen2.LLMConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=207112184.0,  # the 256k-stage theta (4_extend_llm_256k.sh)
        max_position_embeddings=total + 256,
        dtype="float32",
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))

    prompt_len = total - n_decode
    cache_len = total
    rng = np.random.default_rng(0)

    eng = LongContextEngine(
        params, cfg, mesh, max_cache_len=cache_len, prefill_chunk=1024
    )

    # build the prompt embeddings chunk-by-chunk on host (float32, ~64 MB)
    embeds = rng.normal(
        scale=0.5, size=(1, prompt_len, cfg.hidden_size)
    ).astype(np.float32)

    t0 = time.time()

    def progress(done, total):
        print(
            f"[longctx] chunk {done}/{total} t={time.time() - t0:.0f}s",
            file=sys.stderr, flush=True,
        )

    out = eng.generate(
        jnp.asarray(embeds), max_new_tokens=n_decode, progress=progress
    )
    dt = time.time() - t0

    ok = len(out) == n_decode and all(0 <= t < cfg.vocab_size for t in out)
    result = {
        "context_tokens": prompt_len,
        "decoded_tokens": len(out),
        "cache_len": cache_len,
        "mesh": "8-device virtual CPU, seq-sharded KV (axis sp)",
        "prefill_chunk": 1024,
        "elapsed_s": round(dt, 1),
        "ok": bool(ok),
        "first_tokens": out[:8],
    }
    print(json.dumps(result))
    out_name = sys.argv[3] if len(sys.argv) > 3 else "LONGCTX_r03.json"
    with open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)) or ".",
                     out_name), "w"
    ) as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
