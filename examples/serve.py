"""Throughput serving from a saved quantized checkpoint: continuous batching
over an int8 KV cache, decoding through the batched whole-model megakernel.

New scope beyond the reference (its inference is single-request
model.generate; /root/reference/examples/inference.py): B requests of
different lengths decode together, new requests join mid-flight as slots
free up, and on TPU every weight block streams from HBM once per step for
the whole batch (ops/model_fused.py::model_decode_mega_batch — see
BENCH_DETAILS.md for measured aggregate tokens/s).

    python examples/serve.py --quantized-model ckpt/ --prompts prompts.txt \
        --slots 8 --max-new-tokens 64

Optionally `--speculative --draft-model draft_ckpt/` serves single requests
through the on-device speculative-decoding loop instead (the draft can be the
same checkpoint quantized at a lower bit width); with `--slots > 1` it runs
SpeculativeBatcher (spec-dec composed with continuous batching, chunk-
megakernel verify). `--paged --page-size 128 --pages N` serves over the
shared KV page pool (memory scales with tokens in flight, not
slots x max_len); `--paged --speculative` composes both
(PagedSpeculativeBatcher). `--beam W` serves each prompt by beam search on
the paged megakernel path; `--paged --n 4 --temperature 0.8` draws parallel
samples per prompt (forks share prompt pages copy-on-write).
`--paged --prefix-cache` deduplicates common prompt prefixes across requests
(vLLM-style automatic prefix caching: hit pages are shared refcounted, only
the uncached suffix prefills — through the paged chunk megakernel).
"""
import argparse
import time

import jax.numpy as jnp

from mi_optimize_tpu.export import load_model
from mi_optimize_tpu.serving.batching import ContinuousBatcher

from quantize import get_tokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized-model", required=True)
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--prompts", required=True,
                    help="text file, one prompt per line")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--speculative", action="store_true")
    ap.add_argument("--draft-model", default=None,
                    help="checkpoint for the spec-dec draft (e.g. int2 RTN of "
                         "the same model)")
    ap.add_argument("--k", type=int, default=4, help="spec-dec proposal length")
    ap.add_argument("--paged", action="store_true",
                    help="serve over the shared KV page pool "
                         "(PagedMegaBatcher)")
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--prefix-cache", action="store_true",
                    help="automatic prefix caching on the paged path: full "
                         "prompt pages are deduplicated across requests "
                         "(shared refcounted pages, suffix-only prefill)")
    ap.add_argument("--pages", type=int, default=0,
                    help="pool size (0 = full capacity)")
    ap.add_argument("--beam", type=int, default=0,
                    help="beam width: >1 serves each prompt by beam search "
                         "on the paged megakernel path")
    ap.add_argument("--n", type=int, default=1,
                    help="parallel samples per prompt (paged path; forks "
                         "share prompt pages)")
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    model = load_model(args.quantized_model)
    tokenizer = get_tokenizer(args.tokenizer_path)
    prompts = [p.strip() for p in open(args.prompts) if p.strip()]

    if args.beam and args.beam > 1:
        from mi_optimize_tpu.serving.beam import beam_search
        from mi_optimize_tpu.serving.optimize import fuse_for_serving

        model = fuse_for_serving(model)
        for p in prompts:
            ids = tokenizer(p)["input_ids"]
            t0 = time.time()
            hyps = beam_search(model, ids, beam_width=args.beam,
                               max_new_tokens=args.max_new_tokens,
                               eos_token_id=tokenizer.eos_token_id,
                               page_size=args.page_size,
                               max_len=args.max_len)
            dt = time.time() - t0
            print(f"--- {p!r} ({dt:.2f}s)")
            for toks, score in hyps:
                print(f"  [{score:8.3f}] {tokenizer.decode(toks)}")
        return

    if args.prefix_cache and not args.paged:
        ap.error("--prefix-cache requires --paged (the cache lives in the "
                 "page pool)")

    if args.speculative and args.paged:
        # spec-dec under page-pool memory management: megakernel drafting +
        # one paged chunk-verify launch for all slots per round
        from mi_optimize_tpu.serving.optimize import fuse_for_serving
        from mi_optimize_tpu.serving.paged import PagedSpeculativeBatcher

        model = fuse_for_serving(model)
        draft = (fuse_for_serving(load_model(args.draft_model))
                 if args.draft_model else model)
        sb = PagedSpeculativeBatcher(model, draft, k=args.k,
                                     n_slots=args.slots,
                                     max_len=args.max_len,
                                     page_size=args.page_size,
                                     n_pages=args.pages or None)
        t0 = time.time()
        results = sb.run_all([tokenizer(p)["input_ids"] for p in prompts],
                             max_new_tokens=args.max_new_tokens)
        dt = time.time() - t0
        n_tokens = sum(len(t) for t in results.values())
        for rid in sorted(results):
            print(f"--- [{rid}]")
            print(tokenizer.decode(results[rid]))
        print(f"[{n_tokens} tokens in {dt:.2f}s = {n_tokens/dt:.1f} tok/s "
              f"aggregate, accept={sb.accepted/max(sb.proposed,1):.2f}, "
              f"paged pool]")
        return

    if args.speculative and args.slots > 1:
        # spec-dec composed with continuous batching: batched draft + one
        # whole-model chunk-verify launch for all slots per round
        from mi_optimize_tpu.serving.batching import SpeculativeBatcher
        from mi_optimize_tpu.serving.optimize import fuse_for_serving

        model = fuse_for_serving(model)
        draft = (fuse_for_serving(load_model(args.draft_model))
                 if args.draft_model else model)
        sb = SpeculativeBatcher(model, draft, k=args.k, n_slots=args.slots,
                                max_len=args.max_len, cache_dtype=jnp.int8)
        t0 = time.time()
        results = sb.run_all([tokenizer(p)["input_ids"] for p in prompts],
                             max_new_tokens=args.max_new_tokens)
        dt = time.time() - t0
        n_tokens = sum(len(t) for t in results.values())
        for rid in sorted(results):
            print(f"--- [{rid}]")
            print(tokenizer.decode(results[rid]))
        print(f"[{n_tokens} tokens in {dt:.2f}s = {n_tokens/dt:.1f} tok/s "
              f"aggregate, accept={sb.accepted/max(sb.proposed,1):.2f}]")
        return

    if args.speculative:
        from mi_optimize_tpu.serving.speculative import speculative_generate

        draft = load_model(args.draft_model) if args.draft_model else model
        for p in prompts:
            ids = tokenizer(p)["input_ids"]
            t0 = time.time()
            out, stats = speculative_generate(
                model, draft, ids, max_new_tokens=args.max_new_tokens,
                k=args.k, cache_dtype=jnp.int8)
            dt = time.time() - t0
            n_new = out.shape[1] - len(ids)
            print(tokenizer.decode(out[0]))
            print(f"[{n_new} tok in {dt:.2f}s = {n_new/dt:.1f} tok/s, "
                  f"accept={stats['accept_rate']:.2f}]")
        return

    from mi_optimize_tpu.serving.optimize import fuse_for_serving

    model = fuse_for_serving(model)
    if args.paged:
        from mi_optimize_tpu.serving.paged import PagedMegaBatcher

        batcher = PagedMegaBatcher(model, n_slots=args.slots,
                                   max_len=args.max_len,
                                   page_size=args.page_size,
                                   n_pages=args.pages or None,
                                   prefix_cache=args.prefix_cache)
    else:
        batcher = ContinuousBatcher(model, n_slots=args.slots,
                                    max_len=args.max_len,
                                    cache_dtype=jnp.int8)
    pending = list(enumerate(prompts))
    reqs = {}  # prompt index -> Request (retains its tokens after completion)
    t0 = time.time()
    n_tokens = 0
    sample_kw = {}
    if args.paged and (args.n > 1 or args.temperature > 0):
        sample_kw = dict(n=args.n, temperature=args.temperature,
                         top_p=args.top_p, top_k=args.top_k, seed=args.seed)
    while pending or any(r is not None for r in batcher.slot_req):
        while pending:
            i, p = pending[0]
            rid = batcher.add_request(tokenizer(p)["input_ids"],
                                      max_new_tokens=args.max_new_tokens,
                                      eos_token_id=tokenizer.eos_token_id,
                                      **sample_kw)
            if rid is None:
                break
            rids = rid if isinstance(rid, list) else [rid]
            for j, r_ in enumerate(rids):
                reqs[(i, j)] = next(
                    r for r in batcher.slot_req if r and r.rid == r_)
            pending.pop(0)
        n_tokens += len(batcher.step())
    dt = time.time() - t0
    for i, j in sorted(reqs):
        tag = f"{i}.{j}" if args.n > 1 else str(i)
        print(f"--- [{tag}] {prompts[i]!r}")
        print(tokenizer.decode(reqs[(i, j)].tokens))
    print(f"[{len(prompts)} requests, {n_tokens} tokens in {dt:.2f}s "
          f"= {n_tokens/max(dt, 1e-9):.1f} tok/s aggregate over "
          f"{args.slots} slots]")
    if args.prefix_cache:
        print(f"[prefix cache: {batcher.prefix_cache_stats()}]")


if __name__ == "__main__":
    main()
