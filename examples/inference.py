"""Interactive / one-shot generation from a saved quantized checkpoint.

Parity: /root/reference/examples/inference.py (its stubbed vllm/tensorrt
backends are replaced by our own serving engine — SURVEY.md §7.4).
"""
import argparse
import time

from mi_optimize_tpu.export import load_model
from mi_optimize_tpu.serving import generate

from quantize import get_tokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized-model", required=True)
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--prompt", default="Hello")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args()

    model = load_model(args.quantized_model)
    tokenizer = get_tokenizer(args.tokenizer_path)
    ids = tokenizer(args.prompt)["input_ids"]
    t0 = time.time()
    out = generate(model, ids, max_new_tokens=args.max_new_tokens,
                   temperature=args.temperature)
    dt = time.time() - t0
    n_new = out.shape[1] - len(ids[0])
    print(tokenizer.decode(out[0]))
    print(f"[{n_new} tokens in {dt:.2f}s = {n_new/dt:.1f} tok/s]")


if __name__ == "__main__":
    main()
