"""Latency/throughput benchmark CLI (parity: benchmark/benchmark_latency.py:74,
extended with decode tokens/s and roofline fraction)."""
from common import base_parser, emit, load


def main():
    ap = base_parser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seqlen", type=int, default=128)
    args = ap.parse_args()
    model, tok = load(args)
    from mi_optimize_tpu.eval.benchmark import Benchmark

    emit(args, Benchmark().eval_latency(model, batch=args.batch, seqlen=args.seqlen))


if __name__ == "__main__":
    main()
