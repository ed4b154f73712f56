#!/bin/bash
# NVILA stage 2 — pretraining on interleaved MMC4 + COYO mixtures, LLM
# unfrozen. Parity: scripts/NVILA/stage2_9tile.sh.
MODEL=${1:-runs/nvila-stage15/export}
MIX=${2:-mmc4_mixture+coyo_mixture}
vila-train --model-path "$MODEL" --stage pretrain \
  --data-mixture "$MIX" --output-dir runs/nvila-stage2 \
  --seq-len 4096 --pack-rows 4 --ce-chunk-size 2048 "$@"
