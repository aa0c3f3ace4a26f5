#!/bin/bash
# Quantize + evaluate a llama checkpoint (parity: scripts/run_llama.sh)
set -e
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to the HF checkpoint dir}
ALGO=${ALGO:-gptq}
cd "$(dirname "$0")/.."
python examples/quantize_eval.py \
  --model-path "$MODEL_PATH" \
  --quant-config "configs/${ALGO}_quant_config.yaml" \
  --save "ckpt_${ALGO}" --eval-ppl "$@"
