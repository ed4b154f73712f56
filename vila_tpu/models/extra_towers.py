"""Placeholder towers: RADIO and PS3.

Capability parity status vs the reference's tower registry
(llava/model/multimodal_encoder/builder.py:30-68):
  * SigLIP / CLIP / InternViT — implemented (siglip.py, vit.py).
  * RADIO (radio_encoder.py, torchhub-wrapped NVIDIA model) and PS3
    (ps3_encoder.py, wraps the external `ps3` package powering VILA-HD's
    top-down token selection, llava_arch.py:966-1685) depend on external
    model packages that ship pretrained torch code; they are registered
    here with explicit errors so configs referencing them fail loudly
    with guidance, and the dispatch surface stays complete.
"""

from __future__ import annotations

from typing import Any


class UnsupportedTowerError(NotImplementedError):
    pass


def radio_unavailable(*_a: Any, **_k: Any):
    raise UnsupportedTowerError(
        "The RADIO tower wraps NVIDIA's torchhub RADIO models "
        "(reference: llava/model/multimodal_encoder/radio_encoder.py). "
        "Convert the RADIO ViT weights with "
        "vila_tpu.utils.hf_import.convert_vit_state_dict and use the "
        "generic ViT tower (vision_tower_type='clip'), or use the SigLIP "
        "tower."
    )


def ps3_unavailable(*_a: Any, **_k: Any):
    raise UnsupportedTowerError(
        "The PS3 tower (VILA-HD top-down token selection, reference: "
        "llava/model/multimodal_encoder/ps3_encoder.py + "
        "llava_arch.py:966-1685) requires the external `ps3` package's "
        "pretrained models and is not yet reimplemented TPU-side."
    )


TOWER_STUBS = {
    "radio": radio_unavailable,
    "ps3": ps3_unavailable,
}
