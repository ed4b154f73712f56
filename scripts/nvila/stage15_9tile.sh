#!/bin/bash
# NVILA stage 1.5 — adds vision-tower tuning (grad-clip 5.0).
# Parity: scripts/NVILA/stage15_9tile.sh.
MODEL=${1:-runs/nvila-stage1/export}
MIX=${2:-stage15_mixture}
vila-train --model-path "$MODEL" --stage stage15 \
  --data-mixture "$MIX" --output-dir runs/nvila-stage15 \
  --max-grad-norm 5.0 --warmup-ratio 0.03 --lr-schedule cosine \
  --seq-len 4096 "$@"
