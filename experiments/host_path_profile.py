"""Profile the HOST side of the engine TTFT path (prepare_inputs + payload
pack), independent of the chip.

Run: JAX_PLATFORMS=cpu python experiments/host_path_profile.py
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from PIL import Image as PILImage

import bench as benchmod
from vila_tpu.data.tokenizer_utils import add_media_tokens
from vila_tpu.inference.generate import GenerationConfig, GenerationEngine
from vila_tpu.models import projector, qwen2, siglip, vlm


def build_cfg():
    llm = qwen2.LLMConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        rope_theta=1e6, tie_word_embeddings=False, dtype="bfloat16",
    )
    vis = siglip.SigLIPConfig(dtype="bfloat16")
    proj = projector.ProjectorConfig(
        projector_type="mlp_downsample", mm_hidden_size=1152,
        hidden_size=3584, dtype="bfloat16",
    )
    return vlm.VLMConfig(llm=llm, vision=vis, projector=proj)


def main():
    cfg = build_cfg()
    tok = benchmod._tiny_tokenizer()
    add_media_tokens(tok)

    # Params aren't needed for prepare_inputs; fake the engine enough.
    eng = GenerationEngine.__new__(GenerationEngine)
    eng.cfg = cfg
    eng.tokenizer = tok
    eng._newline_ids = tuple(tok("\n", add_special_tokens=False).input_ids)
    eng.image_token_id = tok.media_token_ids["image"]

    img = PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (448, 448, 3), np.uint8)
    )
    prompt = [img, "describe this image in detail"]
    gc = GenerationConfig(max_new_tokens=1)

    for _ in range(3):
        eng.prepare_inputs(prompt)

    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        inputs = eng.prepare_inputs(prompt)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"prepare_inputs: {dt:.3f} ms")

    # payload pack portion (mirror stream_ids fast path)
    from vila_tpu.inference.generate import (
        PROMPT_BUCKETS, TILE_BUCKETS, _bucket,
    )
    expanded_ids = inputs["input_ids"]
    media_pos = inputs["media_pos"]
    prompt_len = int(expanded_ids.shape[0])
    s_pad = _bucket(prompt_len, PROMPT_BUCKETS)
    entries = inputs["media"]
    tiles = np.concatenate([e["tiles"] for e in entries])
    n = tiles.shape[0]
    n_pad = _bucket(n, TILE_BUCKETS)

    def pack():
        ids = np.zeros((1, s_pad), np.int32)
        ids[0, :prompt_len] = expanded_ids
        valid = np.zeros((1, s_pad), bool)
        valid[0, :prompt_len] = True
        mp = np.full((n_pad * cfg.tokens_per_image,), 1 << 30, np.int32)
        mp[: len(media_pos)] = media_pos
        hostbuf = eng._pack_hostbuf(ids, valid, mp, prompt_len, gc)
        tile_elems = int(np.prod(tiles.shape[1:]))
        payload = np.zeros((n_pad * tile_elems + 4 * hostbuf.size,), np.uint8)
        payload[: tiles.size] = tiles.reshape(-1)
        payload[n_pad * tile_elems:] = hostbuf.view(np.uint8)
        return payload

    for _ in range(3):
        pack()
    t0 = time.perf_counter()
    for _ in range(reps):
        pack()
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"payload pack: {dt:.3f} ms")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(reps):
        eng.prepare_inputs(prompt)
        pack()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
