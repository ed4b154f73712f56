"""Capture a profiler trace of the 384-token prefill on chip."""
import glob
import gzip
import json
import os
from functools import partial

import jax
import jax.numpy as jnp

import bench
from vila_tpu.models import qwen2


def main():
    assert jax.default_backend() != "cpu"
    params, cfg = bench.build_8b_quantized()
    llm_cfg = cfg.llm
    s_pad = 384
    ids = jnp.zeros((1, s_pad), jnp.int32)

    @partial(jax.jit, static_argnames="n")
    def llm_run(n, params, ids):
        def body(carry_ids, _):
            h = qwen2.embed_tokens(params, llm_cfg, carry_ids)
            logits, _ = qwen2.forward(
                params, llm_cfg, inputs_embeds=h,
                positions=jnp.arange(s_pad)[None, :],
                last_token_only=True,
            )
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (carry_ids + nxt) % llm_cfg.vocab_size, None
        out, _ = jax.lax.scan(body, ids, None, length=n)
        return out.sum()

    float(llm_run(2, params["llm"], ids))
    os.makedirs("/tmp/prefill_trace", exist_ok=True)
    with jax.profiler.trace("/tmp/prefill_trace"):
        float(llm_run(4, params["llm"], ids))
    print("trace files:")
    for f in glob.glob("/tmp/prefill_trace/**/*", recursive=True):
        print(" ", f)


if __name__ == "__main__":
    main()
