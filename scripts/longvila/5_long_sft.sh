#!/bin/bash
# LongVILA stage 5: long-video SFT with MM-SP (sequence parallel mesh).
# Parity: longvila/train/5_long_sft_256frames.sh (sp 14 -> here --sp over
# the ICI mesh, 256 frames, ctx 131072).
MODEL=${1:-runs/extended-64k}
MIX=${2:-longvideo_sft}
vila-train --model-path "$MODEL" --stage sft \
  --data-mixture "$MIX" --output-dir runs/stage5-long-sft \
  --seq-len 131072 --sp 8 --dp 1 --pack-rows 1 \
  --ce-chunk-size 4096 "$@"
