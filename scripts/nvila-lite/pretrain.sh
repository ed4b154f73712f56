#!/bin/bash
# Stage 2 (pretrain): tunes LLM + projector on interleaved MMC4 + COYO.
# Parity: scripts/NVILA-Lite/pretrain.sh.
MODEL=${1:-runs/stage15/export}
MIX=${2:-mmc4core+coyo25m}
vila-train --model-path "$MODEL" --stage pretrain \
  --data-mixture "$MIX" --output-dir runs/stage2-pretrain \
  --max-steps 20000 --pack-rows 4 --ce-chunk-size 2048 "$@"
