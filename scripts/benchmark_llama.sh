#!/bin/bash
# All benchmark families against a saved quantized checkpoint
# (parity: scripts/benchmark_llama.sh)
set -e
CKPT=${CKPT:?set CKPT to a saved quantized checkpoint dir}
cd "$(dirname "$0")/../benchmark"
python benchmark_ppl.py --quantized-model "$CKPT" "$@"
python benchmark_ceval.py --quantized-model "$CKPT" "$@"
python benchmark_cmmlu.py --quantized-model "$CKPT" "$@"
python benchmark_latency.py --quantized-model "$CKPT" "$@"
