#!/usr/bin/env python
"""Multi-token FLAT segment decode on the real chip (round 5, VERDICT item
2): a 2-layer 7B-shaped draft pays ~3.6 ms/token on the per-launch flat
path (dispatch floors; its weight stream is ~0.4 ms). One launch decoding
kseg tokens amortizes every per-launch cost — target: <=1 ms/token.

Measures (best-of-3, scalar pulls):
  a. per-token flat loop, 9 tokens      (r4 path: decode_loop_flat)
  b. seg kernel, one launch kseg=9      (decode_loop_flat_seg)
  c. seg kernel, one launch kseg=5
  d. _spec_scan_flat steady-state round cost at k=8 and k=4 with the seg
     draft (vs r4's recorded rounds: ~20 ms/round scan-segment)

Usage: python scripts/exp_flat_seg.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill
from mi_optimize_tpu.serving.flatdecode import (
    decode_loop_flat, decode_loop_flat_seg, stack_cache_flat, stack_flat)
from mi_optimize_tpu.utils.planted import build_planted_llama, planted_map

cfg7 = LlamaConfig.llama2_7b()
T = 256

print("# building planted 2-layer 7B-shaped draft...", flush=True)
m_t = planted_map(cfg7.vocab_size)
dcfg = dataclasses.replace(cfg7, num_layers=2)
draft = fuse_for_serving(Model(config=dcfg,
                               params=build_planted_llama(dcfg, m_t),
                               family="llama"))
dfl = stack_flat(draft)
assert dfl is not None
dstack, dmeta = dfl

rng = np.random.default_rng(0)
prompt = rng.integers(0, cfg7.vocab_size, (1, 64))
dcache = init_cache(dcfg, 1, T, jnp.int8)
logits, dcache = prefill(draft.params, dcfg, jnp.asarray(prompt), dcache,
                         True)
fdc = stack_cache_flat(dcache)
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


def per_token():
    toks, _ = decode_loop_flat(draft.params, dstack, dmeta, dcfg, first,
                               fdc, pos0, 9)
    _ = int(np.asarray(toks).reshape(-1)[-1])


timeit("draft_2L_flat_per_token_x9", per_token, 9)

for kseg in (9, 5):
    def seg(kseg=kseg):
        toks, _ = decode_loop_flat_seg(draft.params, dstack, dmeta, dcfg,
                                       first, fdc, pos0, kseg, kseg=kseg)
        _ = int(np.asarray(toks).reshape(-1)[-1])

    timeit(f"draft_2L_flat_seg_kseg{kseg}", seg, kseg)

# ---- steady-state spec rounds with the seg draft ---------------------------
print("# building planted 7B target...", flush=True)
target = fuse_for_serving(Model(config=cfg7,
                                params=build_planted_llama(cfg7, m_t),
                                family="llama"))
from mi_optimize_tpu.serving.megadecode import (
    stack_cache_batched, stack_serving)
from mi_optimize_tpu.serving.speculative import _spec_scan_flat

tst, tmeta = stack_serving(target)
tcache = init_cache(cfg7, 1, T, jnp.int8)
tlogits, tcache = prefill(target.params, cfg7, jnp.asarray(prompt), tcache,
                          True)
tcc = stack_cache_batched(tcache)
tfirst = jnp.argmax(tlogits, -1)[0]

for k in (8, 4):
    M = 4

    def rounds(k=k):
        emits, naccs, last, pos, _, _ = _spec_scan_flat(
            target.params, draft.params, tst, dstack, tmeta, dmeta,
            cfg7, dcfg, tcc, fdc, tfirst, pos0, k, M)
        _ = int(np.asarray(last))

    timeit(f"spec_scan_flat_k{k}_x{M}_rounds_segdraft", rounds, M)
