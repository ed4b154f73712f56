#!/bin/bash
# Stage 1 (align): projector only, frozen LLM + ViT.
# Parity: scripts/NVILA-Lite/align.sh (lr 1e-3, tune_mm_projector only).
MODEL=${1:-checkpoints/base}
MIX=${2:-align_mixture}
vila-train --model-path "$MODEL" --stage align \
  --data-mixture "$MIX" --output-dir runs/stage1-align \
  --max-steps 5000 --per-device-batch-size 16 --seq-len 4096 \
  --ce-chunk-size 2048 "$@"
