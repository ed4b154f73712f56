#!/bin/bash
# Stage 1.5: adds ViT tuning (grad-clip 5.0 in the reference).
MODEL=${1:-runs/stage1-align/export}
MIX=${2:-align_mixture}
vila-train --model-path "$MODEL" --stage stage15 \
  --data-mixture "$MIX" --output-dir runs/stage15 \
  --max-steps 5000 --max-grad-norm 5.0 --ce-chunk-size 2048 "$@"
