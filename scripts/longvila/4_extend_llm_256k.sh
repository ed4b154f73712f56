#!/bin/bash
# LongVILA stage 4 (progressive): LLM-only context extension to 256k.
# Parity: longvila/train/4_extend_llm_256k.sh — rope_theta 207112184,
# model_max_length 262144; starts from the 64k stage's merged output.
# Usage: 4_extend_llm_256k.sh <64k-model-dir> <tokens.npy> <out-dir>
python - "$@" <<'PY'
import sys
import numpy as np
from vila_tpu import entry
from vila_tpu.train.context_extend import (
    ContextExtendArgs, chunk_text_dataset, extend_llm)

model_path, tokens_npy, out_dir = sys.argv[1:4]
cfg = entry.build_config(model_path)
params = entry.load_params(model_path, cfg)
stream = np.load(tokens_npy)
args = ContextExtendArgs(target_context=262144, rope_theta=207112184.0,
                         steps=30, seq_len=262144, sp=8, su=2,
                         ring_layout="zigzag", remat=True,
                         ce_chunk_size=4096)
merged, ext_cfg, losses = extend_llm(
    params["llm"], cfg.llm, chunk_text_dataset(stream, args.seq_len), args)
params["llm"] = merged
import dataclasses
cfg = dataclasses.replace(cfg, llm=ext_cfg)
tok = entry.load_tokenizer(model_path)
entry.save(params, cfg, tok, out_dir)
print("extended ->", out_dir, "losses:", losses[:3], "...", losses[-3:])
PY
