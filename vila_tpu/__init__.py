"""vila_tpu — a TPU-native (JAX/XLA/Pallas) multimodal VLM framework.

Feature-parity target: NVlabs/VILA (NVILA / LongVILA). Public API mirrors the
reference's `llava.load()` (`llava/entry.py:29`) and
`model.generate_content()` (`llava/model/llava_arch.py:836`), rebuilt
TPU-first: functional JAX models, Pallas kernels on the hot paths, and
`jax.sharding.Mesh`/GSPMD for all parallelism.
"""

__version__ = "0.1.0"

from vila_tpu.media import File, Image, Video  # noqa: F401


def save(params, cfg, tokenizer, out_dir):
    """Save params in the component checkpoint layout (llm/, vision_tower/,
    mm_projector/) — mirrors `LlavaMetaModel.save_pretrained`
    (llava/model/llava_arch.py:158-204)."""
    from vila_tpu.entry import save as _save

    return _save(params, cfg, tokenizer, out_dir)


def load(model_path, devices=None, **kwargs):
    """Load a VILA-style checkpoint (component-wise llm/ vision_tower/
    mm_projector/ layout) into a TPU-native model.

    Mirrors `llava.load` (reference: llava/entry.py:29-54).
    """
    from vila_tpu.entry import load as _load

    return _load(model_path, devices=devices, **kwargs)
