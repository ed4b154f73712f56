"""Split the engine first-token path into upload / compute+readback legs."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench
from vila_tpu.data.tokenizer_utils import add_media_tokens
from vila_tpu.inference.generate import (
    GenerationConfig, GenerationEngine, PROMPT_BUCKETS, TILE_BUCKETS,
    _bucket, _round_up,
)


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
    s_pad = _bucket(prompt_len, PROMPT_BUCKETS)
    cache_len = min(engine.max_cache_len, _round_up(s_pad + 1, 256))
    ids = np.zeros((1, s_pad), np.int32)
    ids[0, :prompt_len] = inputs["input_ids"]
    valid = np.zeros((1, s_pad), bool)
    valid[0, :prompt_len] = True
    entries = inputs["media"]
    tiles = np.concatenate([e["tiles"] for e in entries])
    n_pad = _bucket(tiles.shape[0], TILE_BUCKETS)
    mp = np.full((n_pad * cfg.tokens_per_image,), 1 << 30, np.int32)
    mp[: len(inputs["media_pos"])] = inputs["media_pos"]
    hostbuf = engine._pack_hostbuf(ids, valid, mp, prompt_len, gc)
    tile_elems = int(np.prod(tiles.shape[1:]))
    payload = np.zeros((n_pad * tile_elems + 4 * hostbuf.size,), np.uint8)
    payload[: tiles.size] = tiles.reshape(-1)
    payload[n_pad * tile_elems:] = hostbuf.view(np.uint8)
    dummy = jnp.zeros((8, cfg.llm.hidden_size), cfg.llm.compute_dtype)
    kw = dict(s_pad=s_pad, mp_len=len(mp), cache_len=cache_len,
              do_sample=False, use_tiles=True, n_tiles=n_pad)

    @jax.jit
    def touch(p):
        return p[:1].astype(jnp.int32).sum()

    # warm
    pj = jnp.asarray(payload)
    int(touch(pj))
    t_all = int(np.asarray(
        engine._prefill_first(engine.params, pj, dummy, **kw)[0])[0])

    res = {"upload": [], "compute_rb": [], "full": [], "resident": []}
    for _ in range(10):
        # full path: fresh host buffer -> first token
        t0 = time.time()
        pj = jnp.asarray(payload)
        tok1, _, _ = engine._prefill_first(engine.params, pj, dummy, **kw)
        _ = int(np.asarray(tok1)[0])
        res["full"].append(time.time() - t0)

        # upload leg alone: fresh buffer, trivial kernel, scalar readback
        t0 = time.time()
        pj2 = jnp.asarray(payload)
        int(touch(pj2))
        res["upload"].append(time.time() - t0)

        # compute+readback with RESIDENT payload
        t0 = time.time()
        tok2, _, _ = engine._prefill_first(engine.params, pj2, dummy, **kw)
        _ = int(np.asarray(tok2)[0])
        res["compute_rb"].append(time.time() - t0)

        # resident + known-device-time reference: tiny scalar rtt
        t0 = time.time()
        int(touch(pj2))
        res["resident"].append(time.time() - t0)

    for k, v in res.items():
        print(f"{k:12s} min={min(v)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
