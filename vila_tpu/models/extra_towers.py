"""Tower registry completion notes: RADIO and PS3.

Capability parity vs the reference's tower registry
(llava/model/multimodal_encoder/builder.py:30-68):
  * SigLIP / CLIP / InternViT — siglip.py, vit.py.
  * PS3 (VILA-HD top-down token selection, llava_arch.py:966-1685) —
    implemented natively in models/ps3.py (vision_tower_type="ps3").
  * RADIO (radio_encoder.py wraps NVIDIA's torchhub RADIO models, whose
    backbone is a plain ViT) — served by the generic ViT tower
    (vision_tower_type="radio" dispatches to models/vit.py); convert the
    RADIO backbone weights with utils.hf_import.convert_vit_state_dict.
    The reference's torchhub adaptor/mixed-resolution plumbing is specific
    to loading NVIDIA's torch checkpoints and has no TPU-side role.
"""

from __future__ import annotations


class UnsupportedTowerError(NotImplementedError):
    pass
