"""Decompose device TTFT: vision encode vs LLM prefill vs full VLM forward."""
import time
from functools import partial

import jax
import jax.numpy as jnp

import bench
from vila_tpu.models import qwen2, siglip, vlm
from bench import diff_time


def main():
    assert jax.default_backend() != "cpu"
    params, cfg = bench.build_8b_quantized()
    llm_cfg = cfg.llm
    s_pad = 384
    tiles = jnp.zeros((1, 448, 448, 3), jnp.uint8)
    ids = jnp.zeros((1, s_pad), jnp.int32)
    media_pos = jnp.arange(14, 14 + 256, dtype=jnp.int32)

    # full VLM forward (= bench's TTFT body)
    @partial(jax.jit, static_argnames="n")
    def full_run(n, params, ids, tiles, media_pos):
        def body(carry_ids, _):
            logits, _ = vlm.forward(
                params, cfg, input_ids=carry_ids, pixel_values=tiles,
                media_positions=media_pos, last_token_only=True,
            )
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (carry_ids + nxt) % cfg.llm.vocab_size, None
        out, _ = jax.lax.scan(body, ids, None, length=n)
        return out.sum()

    t_full = diff_time(full_run, 1, 6, params, ids, tiles, media_pos)
    print(f"full VLM fwd : {t_full*1e3:8.2f} ms")

    # vision encode only (tower + projector)
    @partial(jax.jit, static_argnames="n")
    def vis_run(n, params, tiles):
        def body(c, _):
            feats = vlm.encode_images(params, cfg, tiles)
            return c + jnp.sum(feats).astype(c.dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    t_vis = diff_time(vis_run, 1, 6, params, tiles)
    print(f"vision encode: {t_vis*1e3:8.2f} ms")

    # LLM prefill only (384 tokens, embeddings in, last-token logits out)
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

    t_llm = diff_time(llm_run, 1, 6, params["llm"], ids)
    print(f"llm prefill  : {t_llm*1e3:8.2f} ms")
    print(f"residual (full - vis - llm): "
          f"{(t_full - t_vis - t_llm)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
