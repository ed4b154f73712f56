#!/bin/bash
# Stage 3 (SFT): tunes all three parts; global bs 2048, lr 2e-5, cosine,
# warmup 0.03, seq 4096, dynamic tiling.
# Parity: scripts/NVILA-Lite/sft.sh:1-50.
MODEL=${1:-runs/stage2-pretrain/export}
MIX=${2:-sft_mixture}
vila-train --model-path "$MODEL" --stage sft \
  --data-mixture "$MIX" --output-dir runs/stage3-sft \
  --max-steps 30000 --seq-len 4096 --warmup-ratio 0.03 \
  --lr-schedule cosine --ce-chunk-size 2048 "$@"
