"""Perplexity benchmark CLI (parity: benchmark/benchmark_ppl.py:39)."""
from common import base_parser, emit, load


def main():
    ap = base_parser()
    ap.add_argument("--datasets", default="wikitext2")
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--nsamples", type=int, default=40)
    args = ap.parse_args()
    model, tok = load(args)
    from mi_optimize_tpu.eval.benchmark import Benchmark

    emit(args, Benchmark().eval_ppl(model, tok, args.datasets,
                                    seqlen=args.seqlen, nsamples=args.nsamples))


if __name__ == "__main__":
    main()
