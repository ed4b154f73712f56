#!/bin/bash
# NVILA (9-tile) stage 1 — projector alignment with dynamic-S2 tiling:
# scales 448/896/1344 (9 tiles max), mlp_downsample projector, SigLIP-448
# cls_patch layer -2, LLM+ViT frozen, lr 1e-3.
# Parity: scripts/NVILA/stage1_9tile.sh:15-45 (the checkpoint's VLMConfig
# carries image_aspect_ratio=dynamic_s2 + s2_scales=(448,896,1344)).
MODEL=${1:-configs/nvila-8b-9tile}   # config with dynamic_s2 vision setup
MIX=${2:-align_mixture}
vila-train --model-path "$MODEL" --stage align \
  --data-mixture "$MIX" --output-dir runs/nvila-stage1 \
  --learning-rate 1e-3 --warmup-ratio 0.03 --lr-schedule cosine \
  --seq-len 4096 "$@"
