"""Full pipeline: quantize -> save -> flag-gated evaluation -> result JSON.

Parity: /root/reference/examples/quantize_eval.py:11-80.
"""
import argparse
import json
import logging

import mi_optimize_tpu as mt
from mi_optimize_tpu.eval.benchmark import Benchmark
from mi_optimize_tpu.export import save_model
from mi_optimize_tpu.models.loader import load_llama_from_hf

from quantize import get_tokenizer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--quant-config", required=True)
    ap.add_argument("--save", default="quantized_ckpt")
    ap.add_argument("--eval-ppl", action="store_true")
    ap.add_argument("--ppl-datasets", default="wikitext2")
    ap.add_argument("--eval-ceval", action="store_true")
    ap.add_argument("--eval-cmmlu", action="store_true")
    ap.add_argument("--eval-boss", action="store_true")
    ap.add_argument("--boss-dataset", default="QuestionAnswering_advqa")
    ap.add_argument("--eval-lmeval", default=None, help="comma-separated tasks")
    ap.add_argument("--eval-latency", action="store_true")
    ap.add_argument("--num-shot", type=int, default=0)
    ap.add_argument("--subject", default="all")
    ap.add_argument("--output-json", default="result.json")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    model = load_llama_from_hf(args.model_path)
    tokenizer = get_tokenizer(args.tokenizer_path or args.model_path)
    qmodel = mt.quantize(model, args.quant_config, tokenizer=tokenizer)
    save_model(qmodel, args.save)

    bench = Benchmark()
    results = {"quant_config": args.quant_config}
    if args.eval_ppl:
        results["ppl"] = bench.eval_ppl(qmodel, tokenizer, args.ppl_datasets)
    if args.eval_ceval:
        results["ceval"] = bench.eval_ceval(qmodel, tokenizer, subject=args.subject,
                                            num_shot=args.num_shot)
    if args.eval_cmmlu:
        results["cmmlu"] = bench.eval_cmmlu(qmodel, tokenizer, subject=args.subject,
                                            num_shot=args.num_shot)
    if args.eval_boss:
        results["boss"] = bench.eval_boss(qmodel, tokenizer, args.boss_dataset,
                                          num_shot=args.num_shot)
    if args.eval_lmeval:
        results["lmeval"] = bench.eval_lmeval(qmodel, tokenizer,
                                              args.eval_lmeval.split(","),
                                              num_shot=args.num_shot)
    if args.eval_latency:
        results["latency"] = bench.eval_latency(qmodel)

    with open(args.output_json, "w") as f:
        json.dump(results, f, indent=2, default=float)
    logging.info("results: %s", json.dumps(results, default=float)[:2000])


if __name__ == "__main__":
    main()
