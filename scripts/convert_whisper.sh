#!/usr/bin/env bash
# Convert an HF Whisper checkpoint for serving (analogue of the reference's
# scripts/build_whisper_tensorrt.sh — but a weight-format conversion, not an
# engine build; XLA compiles at server start and caches persistently).
#
# Usage: scripts/convert_whisper.sh <hf_checkpoint_dir> [output_dir]
set -euo pipefail

SRC="${1:?usage: convert_whisper.sh <hf_checkpoint_dir> [output_dir]}"
OUT="${2:-$HOME/.cache/whisper-live-tpu/$(basename "$SRC")}"

python -m whisperlive_tpu.cli.convert "$SRC" --output "$OUT" --verify
echo "serve with: python run_server.py -tpu $OUT"
