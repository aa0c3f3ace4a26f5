"""Quantize a HF llama-family checkpoint via a YAML config and save it.

Parity: /root/reference/examples/quantize.py:8-35 (load model -> quantize ->
export -> save -> smoke generate), TPU-native pipeline.

Usage:
  python examples/quantize.py --model-path /path/to/hf-llama \
      --quant-config configs/rtn_quant_config.yaml --save ckpt_out \
      [--tokenizer-path ...] [--journal journal_dir]
"""
import argparse
import logging
import time

import mi_optimize_tpu as mt
from mi_optimize_tpu.export import save_model
from mi_optimize_tpu.models.loader import load_llama_from_hf
from mi_optimize_tpu.serving import generate


def get_tokenizer(path):
    if path:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(path)
    from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer

    return ByteTokenizer()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--quant-config", required=True)
    ap.add_argument("--save", default="quantized_ckpt")
    ap.add_argument("--journal", default=None, help="resumable calibration dir")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    model = load_llama_from_hf(args.model_path)
    tokenizer = get_tokenizer(args.tokenizer_path or args.model_path)

    t0 = time.time()
    qmodel = mt.quantize(model, args.quant_config, tokenizer=tokenizer)
    logging.info("quantization took %.1fs", time.time() - t0)

    save_model(qmodel, args.save)
    logging.info("saved to %s", args.save)

    out = generate(qmodel, tokenizer("Llama is a")["input_ids"], max_new_tokens=16)
    logging.info("smoke generate: %s", tokenizer.decode(out[0]))


if __name__ == "__main__":
    main()
