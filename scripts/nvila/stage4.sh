#!/bin/bash
# NVILA stage 4 — LLM-only context extension (hands off to the LongVILA
# recipe). Parity: scripts/NVILA/stage4.sh -> longvila stage 4.
exec "$(dirname "$0")/../longvila/4_extend_llm_64k.sh" "$@"
