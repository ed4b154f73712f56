"""Ablate prefill: stacked-weight scan-over-layers linears vs flat kernels,
and full-model minus-linears overhead."""
import time
from functools import partial

import jax
import jax.numpy as jnp

import bench
from bench import diff_time
from vila_tpu.models import qwen2
from vila_tpu.ops import quant


def main():
    assert jax.default_backend() != "cpu"
    params, cfg = bench.build_8b_quantized()
    lp = params["llm"]["layers"]
    llm_cfg = cfg.llm
    L = llm_cfg.num_hidden_layers
    M = 384
    D = llm_cfg.hidden_size
    I = llm_cfg.intermediate_size
    dt = llm_cfg.compute_dtype
    o_din = 2 * lp["o_proj"]["packed"].shape[-2]

    x0 = (jax.random.normal(jax.random.PRNGKey(0), (M, D)) * 0.02).astype(dt)

    @partial(jax.jit, static_argnames="n")
    def linears_run(n, lp, x0):
        def outer(c, _):
            def body(h, l):
                qkv = qwen2.w4_matmul_stacked_dispatch(
                    h, lp["qkv_proj"]["packed"], lp["qkv_proj"]["scales"], l)
                o_in = qkv[:, :o_din]
                o = qwen2.w4_matmul_stacked_dispatch(
                    o_in, lp["o_proj"]["packed"], lp["o_proj"]["scales"], l)
                gu = qwen2.w4_matmul_stacked_dispatch(
                    h + o[:, :D], lp["gate_up_proj"]["packed"],
                    lp["gate_up_proj"]["scales"], l)
                dn = qwen2.w4_matmul_stacked_dispatch(
                    gu[:, :I] * gu[:, I:], lp["down_proj"]["packed"],
                    lp["down_proj"]["scales"], l)
                return h + dn, None
            h, _ = jax.lax.scan(body, c, jnp.arange(L))
            return h, None
        c, _ = jax.lax.scan(outer, x0, None, length=n)
        return jnp.sum(c)

    t = diff_time(lambda n, *a: linears_run(n, *a), 1, 5, lp, x0)
    print(f"stacked linears x28: {t*1e3:8.2f} ms")

    # full model (no cache)
    ids = jnp.zeros((1, M), jnp.int32)

    @partial(jax.jit, static_argnames="n")
    def llm_run(n, p, ids):
        def body(carry_ids, _):
            h = qwen2.embed_tokens(p, llm_cfg, carry_ids)
            logits, _ = qwen2.forward(
                p, llm_cfg, inputs_embeds=h,
                positions=jnp.arange(M)[None, :], last_token_only=True)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (carry_ids + nxt) % llm_cfg.vocab_size, None
        out, _ = jax.lax.scan(body, ids, None, length=n)
        return out.sum()

    t2 = diff_time(llm_run, 1, 5, params["llm"], ids)
    print(f"full model (no cache): {t2*1e3:8.2f} ms   non-linear overhead: "
          f"{(t2-t)*1e3:.2f} ms")

    # full model WITH cache (engine prefill condition, cache_len 576)
    cache = qwen2.init_cache(llm_cfg, batch=1, max_len=576)

    @partial(jax.jit, static_argnames="n")
    def llm_run_cache(n, p, ids, cache):
        def body(carry, _):
            carry_ids = carry
            h = qwen2.embed_tokens(p, llm_cfg, carry_ids)
            logits, _ = qwen2.forward(
                p, llm_cfg, inputs_embeds=h,
                positions=jnp.arange(M)[None, :],
                cache=cache, last_token_only=True)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (carry_ids + nxt) % llm_cfg.vocab_size, None
        out, _ = jax.lax.scan(body, ids, None, length=n)
        return out.sum()

    t3 = diff_time(llm_run_cache, 1, 5, params["llm"], ids, cache)
    print(f"full model (cache 576): {t3*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
