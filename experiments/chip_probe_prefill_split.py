"""Decompose _prefill_first: host pack / transfer / dispatch / device exec /
readback — on the real chip. Run with PYTHONPATH=/root/.axon_site:/root/repo.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from vila_tpu.data.tokenizer_utils import add_media_tokens
from vila_tpu.inference.generate import GenerationConfig, GenerationEngine


def tmin(f, reps=10):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


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
    for _ in range(2):
        next(iter(engine.stream_ids(engine.prepare_inputs(prompt), gc)))

    # Rebuild the exact fast-path call args (mirrors stream_ids)
    from vila_tpu.inference.generate import (
        PROMPT_BUCKETS, TILE_BUCKETS, _bucket, _round_up,
    )
    inputs = engine.prepare_inputs(prompt)
    expanded_ids = inputs["input_ids"]
    media_pos = inputs["media_pos"]
    prompt_len = int(expanded_ids.shape[0])
    s_pad = _bucket(prompt_len, PROMPT_BUCKETS)
    cache_len = min(engine.max_cache_len, _round_up(s_pad + gc.max_new_tokens, 256))
    entries = inputs["media"]
    tiles = np.concatenate([e["tiles"] for e in entries])
    n_pad = _bucket(tiles.shape[0], TILE_BUCKETS)
    ids = np.zeros((1, s_pad), np.int32)
    ids[0, :prompt_len] = expanded_ids
    valid = np.zeros((1, s_pad), bool)
    valid[0, :prompt_len] = True
    mp = np.full((n_pad * cfg.tokens_per_image,), 1 << 30, np.int32)
    mp[: len(media_pos)] = media_pos
    hostbuf = engine._pack_hostbuf(ids, valid, mp, prompt_len, gc)
    tile_elems = int(np.prod(tiles.shape[1:]))
    payload = np.zeros((n_pad * tile_elems + 4 * hostbuf.size,), np.uint8)
    payload[: tiles.size] = tiles.reshape(-1)
    payload[n_pad * tile_elems:] = hostbuf.view(np.uint8)

    kw = dict(s_pad=s_pad, mp_len=len(mp), cache_len=cache_len,
              do_sample=False, use_tiles=True, n_tiles=n_pad)

    # 1. full: np payload in, scalar out
    def full():
        tok_, cache_, rng_ = engine._prefill_first(
            engine.params, payload, engine._dummy_embeds, **kw)
        return int(np.asarray(tok_)[0])
    print(f"full (np in, int out):      {tmin(full):7.2f} ms")

    # 2. dispatch+exec only: np payload in, block_until_ready, no readback
    def no_read():
        tok_, cache_, rng_ = engine._prefill_first(
            engine.params, payload, engine._dummy_embeds, **kw)
        tok_.block_until_ready()
    print(f"no-readback (np in, block): {tmin(no_read):7.2f} ms")

    # 3. device-resident payload: removes the host->device transfer
    dev_payload = jnp.asarray(payload)
    dev_payload.block_until_ready()
    def dev_in():
        tok_, cache_, rng_ = engine._prefill_first(
            engine.params, dev_payload, engine._dummy_embeds, **kw)
        tok_.block_until_ready()
    print(f"device-resident payload:    {tmin(dev_in):7.2f} ms")

    # 4. AOT-compiled: no python jit-cache lookup / arg processing
    lowered = engine._prefill_first.lower(
        engine.params, dev_payload, engine._dummy_embeds, **kw)
    compiled = lowered.compile()
    def aot():
        tok_, cache_, rng_ = compiled(engine.params, dev_payload,
                                      engine._dummy_embeds)
        tok_.block_until_ready()
    aot()
    print(f"AOT compiled (dev payload): {tmin(aot):7.2f} ms")

    # 5. dispatch-only cost: submit but don't block (queue depth 1)
    def dispatch_only():
        tok_, cache_, rng_ = compiled(engine.params, dev_payload,
                                      engine._dummy_embeds)
        return tok_
    r = None
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        r = dispatch_only()
        best = min(best, time.perf_counter() - t0)
        r.block_until_ready()
    print(f"dispatch only (no block):   {best*1e3:7.2f} ms")

    # 6. pure-compute estimate: two back-to-back executions minus one
    def two():
        a = compiled(engine.params, dev_payload, engine._dummy_embeds)
        b = compiled(engine.params, dev_payload, engine._dummy_embeds)
        b[0].block_until_ready()
    t2 = tmin(two)
    t1 = tmin(aot)
    print(f"two-call: {t2:7.2f} ms -> marginal exec {t2 - t1:7.2f} ms")

    # 7. cost stats
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print("flops:", ca.get("flops"), "bytes:", ca.get("bytes accessed"))
    except Exception as e:
        print("cost_analysis failed:", e)


if __name__ == "__main__":
    main()
