"""CMMLU MCQA benchmark CLI (parity: benchmark/benchmark_cmmlu.py:44)."""
from common import base_parser, emit, load


def main():
    ap = base_parser()
    ap.add_argument("--subject", default="all")
    ap.add_argument("--num-shot", type=int, default=0)
    args = ap.parse_args()
    model, tok = load(args)
    from mi_optimize_tpu.eval.benchmark import Benchmark

    emit(args, Benchmark().eval_cmmlu(model, tok, subject=args.subject,
                                        num_shot=args.num_shot))


if __name__ == "__main__":
    main()
