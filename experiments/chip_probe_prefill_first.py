"""Differential device time of the engine's _prefill_first (s_pad=320)."""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bench import diff_time
from vila_tpu.data.tokenizer_utils import add_media_tokens
from vila_tpu.inference.generate import GenerationConfig, GenerationEngine
from vila_tpu.models import qwen2, vlm


def main():
    assert jax.default_backend() != "cpu"
    from PIL import Image as PILImage

    params, cfg = bench.build_8b_quantized()
    tok = bench._tiny_tokenizer()
    add_media_tokens(tok)
    engine = GenerationEngine(params, cfg, tok)
    img = PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (448, 448, 3), np.uint8)
    )
    gc = GenerationConfig(max_new_tokens=1)
    prompt = [img, "describe this image in detail"]
    inputs = engine.prepare_inputs(prompt)
    prompt_len = int(inputs["input_ids"].shape[0])
    print("prompt_len:", prompt_len)

    # replicate stream_ids' fast path, then chain N invocations in one jit
    from vila_tpu.inference.generate import PROMPT_BUCKETS, TILE_BUCKETS, _bucket, _round_up
    s_pad = _bucket(prompt_len, PROMPT_BUCKETS)
    cache_len = min(engine.max_cache_len, _round_up(s_pad + 1, 256))
    print("s_pad:", s_pad, "cache_len:", cache_len)

    ids = np.zeros((1, s_pad), np.int32)
    ids[0, :prompt_len] = inputs["input_ids"]
    valid = np.zeros((1, s_pad), bool)
    valid[0, :prompt_len] = True
    entries = inputs["media"]
    tiles = np.concatenate([e["tiles"] for e in entries])
    n = tiles.shape[0]
    n_pad = _bucket(n, TILE_BUCKETS)
    mp = np.full((n_pad * cfg.tokens_per_image,), 1 << 30, np.int32)
    mp[: len(inputs["media_pos"])] = inputs["media_pos"]
    hostbuf = engine._pack_hostbuf(ids, valid, mp, prompt_len, gc)
    tile_elems = int(np.prod(tiles.shape[1:]))
    payload = np.zeros((n_pad * tile_elems + 4 * hostbuf.size,), np.uint8)
    payload[: tiles.size] = tiles.reshape(-1)
    payload[n_pad * tile_elems:] = hostbuf.view(np.uint8)
    payload_j = jnp.asarray(payload)

    S = cfg.vision.image_size
    tb = n_pad * S * S * 3
    mp_len = len(mp)

    dummy0 = jnp.zeros((8, cfg.llm.hidden_size), cfg.llm.compute_dtype)

    @partial(jax.jit, static_argnames="k")
    def chained(k, params, payload, dummy):
        def body(c, _):
            # perturb payload's hostbuf region is not possible (uint8 exact);
            # instead vary nothing — rely on c feeding a dead-cheap xor into
            # the tile bytes so iterations serialize
            p2 = payload.at[0].set((payload[0] + c).astype(jnp.uint8))
            tok, cache, rng = engine._prefill_first(
                params, p2, dummy,
                s_pad=s_pad, mp_len=mp_len, cache_len=cache_len,
                do_sample=False, use_tiles=True, n_tiles=n_pad)
            return tok[0].astype(jnp.uint8), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None, length=k)
        return c.astype(jnp.int32)

    t = diff_time(lambda k, *a: chained(k, *a), 1, 6, engine.params, payload_j, dummy0)
    print(f"_prefill_first device time: {t*1e3:.2f} ms")

    # pure python dispatch cost (async, no readback)
    args = dict(s_pad=s_pad, mp_len=mp_len, cache_len=cache_len,
                do_sample=False, use_tiles=True, n_tiles=n_pad)
    engine._prefill_first(engine.params, payload_j, dummy0, **args)
    t0 = time.time()
    N = 20
    for _ in range(N):
        out = engine._prefill_first(engine.params, payload_j, dummy0, **args)
    t_disp = (time.time() - t0) / N
    print(f"python dispatch (async): {t_disp*1e3:.2f} ms/call")
    # and numpy payload prep cost
    t0 = time.time()
    for _ in range(50):
        payload2 = np.zeros((n_pad * tile_elems + 4 * hostbuf.size,), np.uint8)
        payload2[: tiles.size] = tiles.reshape(-1)
        payload2[n_pad * tile_elems:] = hostbuf.view(np.uint8)
        pj = jnp.asarray(payload2)
    print(f"payload prep+put: {(time.time()-t0)/50*1e3:.2f} ms")


if __name__ == "__main__":
    main()
