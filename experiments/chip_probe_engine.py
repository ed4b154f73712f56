"""Profile the engine host path: prepare_inputs vs dispatch vs readback."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench
from vila_tpu.data.tokenizer_utils import add_media_tokens
from vila_tpu.inference.generate import GenerationConfig, GenerationEngine


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

    t_prep = float("inf")
    for _ in range(10):
        t0 = time.time()
        prep = engine.prepare_inputs(prompt)
        t_prep = min(t_prep, time.time() - t0)
    print(f"prepare_inputs: {t_prep*1e3:.2f} ms")

    # first token with pre-prepared inputs
    t_first = float("inf")
    for _ in range(10):
        prep = engine.prepare_inputs(prompt)
        t0 = time.time()
        next(iter(engine.stream_ids(prep, gc)))
        t_first = min(t_first, time.time() - t0)
    print(f"stream first token (prep done): {t_first*1e3:.2f} ms")

    t_both = float("inf")
    for _ in range(10):
        t0 = time.time()
        next(iter(engine.stream_ids(engine.prepare_inputs(prompt), gc)))
        t_both = min(t_both, time.time() - t0)
    print(f"full engine ttft: {t_both*1e3:.2f} ms")


if __name__ == "__main__":
    main()
