#!/usr/bin/env python
"""One-command north-star repro (VERDICT r2 missing #2).

North star (BASELINE.md, reference README.md:326): Llama-2-7B, GPTQ INT4
g128, wikitext2 — quantized PPL within Δ≤0.1 of this pipeline's own fp
baseline (reference fp16 anchor: 5.47). No checkpoint is mountable in the
build environment; the day one exists:

    python scripts/repro_northstar.py --model-path /path/to/Llama-2-7b-hf

does fp PPL -> GPTQ int4 g128 calibration (configs/gptq_quant_config.yaml,
the exact north-star config) -> quantized PPL through the fused serving
path -> prints the delta and pass/fail. Offline proxies already recorded:
driver-level PPL parity vs the torch reference (tests/test_driver_parity.py)
and the on-chip synthetic end-to-end (BENCH_DETAILS.md).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import mi_optimize_tpu as mt
from mi_optimize_tpu.eval.benchmark import Benchmark


def get_tokenizer(path):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path, use_fast=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True,
                    help="HF Llama-2-7B checkpoint dir (config.json + safetensors)")
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--quant-config",
                    default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                         "..", "configs", "gptq_quant_config.yaml"))
    ap.add_argument("--datasets", default="wikitext2",
                    help="comma-separated PPL sets (wikitext2/ptb/c4)")
    ap.add_argument("--delta", type=float, default=0.1,
                    help="pass threshold vs the fp baseline")
    ap.add_argument("--output-json", default="northstar_result.json")
    args = ap.parse_args()

    from mi_optimize_tpu.models.loader import load_llama_from_hf

    tok = get_tokenizer(args.tokenizer_path or args.model_path)
    bench = Benchmark()
    sets = args.datasets.split(",")

    model = load_llama_from_hf(args.model_path)
    t0 = time.time()
    fp_ppl = bench.eval_ppl(model, tok, sets)
    t_fp = time.time() - t0

    t0 = time.time()
    qmodel = mt.quantize(model, args.quant_config, tokenizer=tok)
    t_q = time.time() - t0

    t0 = time.time()
    q_ppl = bench.eval_ppl(qmodel, tok, sets)
    t_qp = time.time() - t0

    result = {
        "config": os.path.basename(args.quant_config),
        "fp_ppl": fp_ppl,
        "quant_ppl": q_ppl,
        "delta": {s: round(q_ppl[s] - fp_ppl[s], 4) for s in fp_ppl},
        "pass": all(q_ppl[s] - fp_ppl[s] <= args.delta for s in fp_ppl),
        "threshold": args.delta,
        "wall_s": {"fp_ppl": round(t_fp, 1), "quantize": round(t_q, 1),
                   "quant_ppl": round(t_qp, 1)},
        "reference_anchor": {"fp16_wikitext2": 5.47,
                             "source": "reference README.md:326"},
    }
    print(json.dumps(result, indent=2))
    with open(args.output_json, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
