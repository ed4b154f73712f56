#!/bin/bash
# NVILA stage 3 — SFT, all three parts tuned; global bs 2048, lr 2e-5.
# Parity: scripts/NVILA/stage3_9tile.sh.
MODEL=${1:-runs/nvila-stage2/export}
MIX=${2:-sft_mixture}
vila-train --model-path "$MODEL" --stage sft \
  --data-mixture "$MIX" --output-dir runs/nvila-stage3 \
  --seq-len 4096 --warmup-ratio 0.03 --lr-schedule cosine \
  --ce-chunk-size 2048 "$@"
