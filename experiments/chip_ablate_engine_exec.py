"""Ablate _prefill_first device exec: vision vs LLM-prefill vs cache-writes.

All timings are two-call marginals on AOT-compiled executables (pipelined,
no dispatch gap). PYTHONPATH=/root/.axon_site:/root/repo
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bench
from vila_tpu.models import qwen2, vlm


def marginal(compiled, *args, reps=6):
    # two-call marginal: t(2 calls) - t(1 call), mins taken separately
    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [compiled(*args) for _ in range(n)]
            jax.tree_util.tree_leaves(outs[-1])[0].block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(3) - run(1)) / 2 * 1e3


def main():
    assert jax.default_backend() != "cpu"
    params, cfg = bench.build_8b_quantized()
    s_pad = 320
    cache_len = 512
    tiles = jnp.zeros((1, 448, 448, 3), jnp.uint8)
    ids = jnp.zeros((1, s_pad), jnp.int32)
    valid = jnp.ones((1, s_pad), bool)
    media_pos = jnp.arange(14, 14 + 256, dtype=jnp.int32)
    prompt_last = jnp.asarray([304], jnp.int32)

    # A: vision encode only
    def enc(params, tiles):
        feats = vlm.encode_images(params, cfg, tiles)
        return feats.reshape(-1, feats.shape[-1])
    enc_c = jax.jit(enc).lower(params, tiles).compile()
    feats = enc_c(params, tiles)
    feats.block_until_ready()
    print(f"A vision encode:            {marginal(enc_c, params, tiles):7.2f} ms")

    # B: LLM prefill NO cache (ttft_run style), embeds spliced
    def fwd_nocache(params, ids, feats):
        embeds = qwen2.embed_tokens(params["llm"], cfg.llm, ids)
        embeds = vlm.splice_media(embeds, feats, media_pos)
        logits, _ = qwen2.forward(
            params["llm"], cfg.llm, inputs_embeds=embeds,
            gather_position=prompt_last,
        )
        return logits[:, 0]
    b_c = jax.jit(fwd_nocache).lower(params, ids, feats).compile()
    print(f"B LLM prefill (no cache):   {marginal(b_c, params, ids, feats):7.2f} ms")

    # C: LLM prefill WITH cache init+writes (+valid mask)
    def fwd_cache(params, ids, feats):
        embeds = qwen2.embed_tokens(params["llm"], cfg.llm, ids)
        embeds = vlm.splice_media(embeds, feats, media_pos)
        cache = qwen2.init_cache(cfg.llm, batch=1, max_len=cache_len)
        logits, cache = qwen2.forward(
            params["llm"], cfg.llm, inputs_embeds=embeds,
            token_valid=valid, cache=cache, gather_position=prompt_last,
        )
        return logits[:, 0], cache
    c_c = jax.jit(fwd_cache).lower(params, ids, feats).compile()
    print(f"C LLM prefill (cache+valid):{marginal(c_c, params, ids, feats):7.2f} ms")

    # D: full forward incl vision, no cache (ttft_run at 320)
    def fwd_full(params, ids, tiles):
        logits, _ = vlm.forward(
            params, cfg, input_ids=ids, pixel_values=tiles,
            media_positions=media_pos, last_token_only=True,
        )
        return logits
    d_c = jax.jit(fwd_full).lower(params, ids, tiles).compile()
    print(f"D full fwd (vision+nocache):{marginal(d_c, params, ids, tiles):7.2f} ms")


if __name__ == "__main__":
    main()
