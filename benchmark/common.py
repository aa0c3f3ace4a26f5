"""Shared CLI plumbing for the standalone benchmark drivers.

Parity: /root/reference/benchmark/benchmark_{ppl,ceval,cmmlu,lm_eval,latency}.py
(argparse + --quantized-model loading + --output-json)."""
import argparse
import json


def base_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", help="HF fp checkpoint dir")
    ap.add_argument("--quantized-model", help="saved quantized checkpoint dir")
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--output-json", default=None)
    return ap


def load(args):
    if args.quantized_model:
        from mi_optimize_tpu.export import load_model

        model = load_model(args.quantized_model)
    else:
        from mi_optimize_tpu.models.loader import load_llama_from_hf

        model = load_llama_from_hf(args.model_path)
    tok_path = args.tokenizer_path or args.model_path
    if tok_path:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tok_path)
        except Exception:
            from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer

            tok = ByteTokenizer()
    else:
        from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
    return model, tok


def emit(args, results):
    print(json.dumps(results, default=float))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(results, f, indent=2, default=float)
