#!/bin/bash
# OOD sweep: rtn/gptq x ceval/cmmlu x subject categories
# (parity: scripts/run_llama_rtn_all.sh)
set -e
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH}
cd "$(dirname "$0")/.."
for algo in rtn gptq; do
  for ds in ceval cmmlu; do
    for sub in all hm ss st; do
      python examples/quantize_eval.py \
        --model-path "$MODEL_PATH" \
        --quant-config "configs/${algo}_${ds}_${sub}.yaml" \
        --save "ckpt_${algo}_${ds}_${sub}" \
        --eval-ceval --eval-cmmlu --subject "$sub" \
        --output-json "result_${algo}_${ds}_${sub}.json"
    done
  done
done
