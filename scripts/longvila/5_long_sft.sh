#!/bin/bash
# LongVILA stage 5: long-video SFT with MM-SP (sequence parallel mesh).
# Parity: longvila/train/5_long_sft_256frames.sh (sp 14 -> here --sp over
# the ICI mesh, 256 frames, ctx 131072).
MODEL=${1:-runs/extended-64k}
MIX=${2:-longvideo_sft}
# sp = ring degree, su = Ulysses degree (MM-SP 2D grid, ring outer);
# sp-attention routes every decoder attention through the explicit
# zigzag-ring/hybrid kernels (vila_tpu/parallel/sp.py).
vila-train --model-path "$MODEL" --stage sft \
  --data-mixture "$MIX" --output-dir runs/stage5-long-sft \
  --seq-len 131072 --sp 4 --su 2 --dp 1 --pack-rows 1 \
  --sp-attention true --ring-layout zigzag \
  --ce-chunk-size 4096 "$@"
