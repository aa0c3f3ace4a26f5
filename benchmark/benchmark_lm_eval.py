"""lm-eval benchmark CLI (parity: benchmark/benchmark_lm_eval.py:42)."""
from common import base_parser, emit, load


def main():
    ap = base_parser()
    ap.add_argument("--tasks", default="ceval_mc")
    ap.add_argument("--num-shot", type=int, default=0)
    args = ap.parse_args()
    model, tok = load(args)
    from mi_optimize_tpu.eval.benchmark import Benchmark

    emit(args, Benchmark().eval_lmeval(model, tok, args.tasks.split(","),
                                       num_shot=args.num_shot))


if __name__ == "__main__":
    main()
