#!/usr/bin/env python
"""Spec-dec ROUND decomposition on the real chip (round 4).

exp_planted_spec measured spec-dec losing 3x even at accept rate 1.0 with a
16x-cheaper draft (58.3 vs 161.4 tok/s; 157 ms per k=8 round where the
component model predicts ~15). This isolates where the round goes:

  a. draft-only: 9 draft megakernel steps (2-layer model) as a lax.scan
  b. verify-only: one C=10 chunk megakernel call in a 4-iteration scan
  c. one full propose->verify->accept round inside lax.while_loop (the
     production structure), iterated

Each timed best-of-3 with scalar pulls. The gap between (a)+(b) and (c) is
the while-loop serialization / dispatch overhead this runtime charges.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill
from mi_optimize_tpu.serving.megadecode import (
    decode_loop_model, model_step_chunk, stack_cache, stack_cache_batched,
    stack_serving)
from mi_optimize_tpu.utils.planted import build_planted_llama, planted_map

cfg = LlamaConfig.llama2_7b()
K = 8
T = 256

print("# building planted target + draft...", flush=True)
m_t = planted_map(cfg.vocab_size)
dcfg = dataclasses.replace(cfg, num_layers=2)
draft = fuse_for_serving(Model(config=dcfg,
                               params=build_planted_llama(dcfg, m_t),
                               family="llama"))
target = fuse_for_serving(Model(config=cfg,
                                params=build_planted_llama(cfg, m_t),
                                family="llama"))

rng = np.random.default_rng(0)
prompt = rng.integers(0, cfg.vocab_size, (1, 64))
dst, dmeta = stack_serving(draft)
tst, tmeta = stack_serving(target)

dcache = init_cache(dcfg, 1, T, jnp.int8)
_, dcache = prefill(draft.params, dcfg, jnp.asarray(prompt), dcache, True)
sdc = stack_cache(dcache)
tcache = init_cache(cfg, 1, T, jnp.int8)
logits, tcache = prefill(target.params, cfg, jnp.asarray(prompt), tcache, True)
stc = stack_cache_batched(tcache)
first = jnp.argmax(logits, -1)[:, None]
pos0 = jnp.asarray(prompt.shape[1])


def timeit(name, fn, per):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"what": name, "ms_total": round(best * 1e3, 2),
                      "ms_per_unit": round(best / per * 1e3, 3)}), flush=True)
    return best


# (a) draft-only: K+1 draft megakernel steps
def draft_only():
    toks, _ = decode_loop_model(draft.params, dst, dmeta, dcfg, first, sdc,
                                pos0, K + 1)
    _ = int(np.asarray(toks).reshape(-1)[-1])


timeit(f"draft_2L_megakernel_{K+1}_steps", draft_only, K + 1)


# (b) verify-only: C=K+2 chunk calls in a scan (fresh positions each iter)
chunk_toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, K + 2)))


@jax.jit
def verify_scan(params, tst_, stc_, toks, pos):
    def body(c, i):
        lg, c2 = model_step_chunk(params, tst_, tmeta, cfg, toks, c,
                                  pos + i * (K + 2))
        return c2, lg[0, 0]

    _, ys = jax.lax.scan(body, stc_, jnp.arange(4))
    return ys


timeit(f"verify_chunk_C{K+2}_x4",
       lambda: float(np.asarray(
           verify_scan(target.params, tst, stc, chunk_toks, pos0))[-1]), 4)


# (c) full production round via speculative_generate (on-device while loop)
from mi_optimize_tpu.serving.speculative import speculative_generate


def full():
    toks, stats = speculative_generate(target, draft, prompt,
                                       max_new_tokens=45, k=K, fused=True,
                                       cache_dtype=jnp.int8,
                                       draft_megakernel=True)
    return stats


st = full()
t0 = time.perf_counter()
st = full()
dt = time.perf_counter() - t0
print(json.dumps({"what": "full_spec_loop", "rounds": st["target_calls"],
                  "ms_per_round": round(dt / st["target_calls"] * 1e3, 2),
                  "accept_rate": round(st["accept_rate"], 3)}), flush=True)


# (d) draft-only on the FLAT kernel (lm_head+argmax in-kernel)
from mi_optimize_tpu.serving.flatdecode import (
    decode_loop_flat, stack_cache_flat, stack_flat)

dfl = stack_flat(draft, (dst, dmeta))
if dfl is not None:
    fdc = stack_cache_flat(dcache)

    def draft_flat():
        toks, _ = decode_loop_flat(draft.params, dfl[0], dfl[1], dcfg, first,
                                   fdc, pos0, K + 1)
        _ = int(np.asarray(toks).reshape(-1)[-1])

    timeit(f"draft_2L_FLAT_{K+1}_steps", draft_flat, K + 1)

    # (e) one scan-flat segment (m rounds) — the r4 production structure
    from mi_optimize_tpu.serving.speculative import _spec_scan_flat

    M = 5

    def seg():
        emits, naccs, last, pos, tcc2, dcc2 = _spec_scan_flat(
            target.params, draft.params, tst, dfl[0], tmeta, dfl[1],
            cfg, dcfg, stc, fdc, jnp.asarray(first[0, 0], jnp.int32),
            pos0, K, M)
        _ = int(np.asarray(naccs)[-1])

    timeit(f"scan_flat_segment_m{M}_k{K}", seg, M)
