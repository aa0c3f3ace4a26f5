#!/usr/bin/env python
"""Prefix-cache TTFT on the real chip (round 3): admission cost of a request
whose prompt shares a long cached prefix vs a full prefill, at 7B scale.

The paged batcher's admission path does (a) full dense prefill of S tokens
when nothing is cached, or (b) a suffix-only paged CHUNK megakernel pass over
the s = S - hit tokens when the prefix pages are cached (serving/paged.py
prefix_cache=True). This measures both jitted programs directly — the
time-to-first-token saving is the whole point of prefix caching (system
prompts, few-shot prefixes, multi-turn chat).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_quantized_llama_on_device
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill
from mi_optimize_tpu.serving.megadecode import (
    init_pool_batched, model_step_chunk_batch_paged, stack_serving)

S = int(os.environ.get("MI_PC_S", "1024"))        # prompt length
# uncached tail when the first S-SUFFIX tokens are cached; the paged chunk
# kernel's compile cost grows with C (B*C virtual flash slots) — 16 is the
# chat-turn case and compiles fast, 128 is a full page
SUFFIX = int(os.environ.get("MI_PC_SUFFIX", "16"))
P = 128
MAXLEN = 2048

cfg = LlamaConfig.llama2_7b()
model = fuse_for_serving(Model(
    config=cfg, params=build_quantized_llama_on_device(cfg, groupsize=128),
    family="llama"))
params = model.params
stack, meta = stack_serving(model)

rng = np.random.default_rng(0)
prompt = rng.integers(0, cfg.vocab_size, (S,))


def pull(x):
    return float(np.asarray(x).reshape(-1)[0])


def timeit(name, fn):
    fn()                      # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"what": name, "ms": round(best * 1e3, 2)}))
    return best


# (a) full dense prefill at logical capacity (the nhit=0 admission path)
def full_prefill():
    one = init_cache(cfg, 1, MAXLEN, jnp.int8)
    logits, one = prefill(params, cfg, jnp.asarray(prompt[None, :]), one, True)
    pull(logits)


# (b) suffix chunk through the page table (the cache-hit admission path):
# pool with the hit pages pre-populated; table row covers MAXLEN/P pages
pps = MAXLEN // P
pool = init_pool_batched(cfg, 1 + pps, P)
table = np.zeros((1, pps), np.int32)
table[0, : S // P + 1] = np.arange(1, S // P + 2)
table_j = jnp.asarray(table)
suffix = jnp.asarray(prompt[None, S - SUFFIX:])
prefix_pos = jnp.asarray([S - SUFFIX])


def suffix_chunk():
    logits, _pool = model_step_chunk_batch_paged(
        params, stack, meta, cfg, suffix, pool, table_j, prefix_pos)
    pull(logits)


def suffix_chain(n):
    """n suffix-chunk dispatches feeding the pool forward, ONE pull: every
    single dispatch on this tunnel carries a ~24 ms round trip (BENCH_DETAILS
    r5 dispatch-RTT decomposition), so total(n) = rtt + n*device and the
    slope is the DEVICE-TRUE admission cost."""
    pl = pool
    logits = None
    t0 = time.perf_counter()
    for _ in range(n):
        logits, pl = model_step_chunk_batch_paged(
            params, stack, meta, cfg, suffix, pl, table_j, prefix_pos)
    pull(logits)
    return time.perf_counter() - t0


t_full = timeit(f"full_prefill_S{S}", full_prefill)
t_suf = timeit(f"suffix_chunk_C{SUFFIX}_hit{S - SUFFIX}", suffix_chunk)
suffix_chain(1)
b1 = min(suffix_chain(1) for _ in range(3))
b4 = min(suffix_chain(4) for _ in range(3))
dev_ms = (b4 - b1) / 3 * 1e3
print(json.dumps({
    "what": "suffix_chunk_device_true",
    "device_ms": round(dev_ms, 2),
    "fitted_rtt_ms": round(b1 * 1e3 - dev_ms, 1),
}))
print(json.dumps({
    "what": "prefix_cache_ttft_speedup",
    "S": S, "cached": S - SUFFIX, "suffix": SUFFIX,
    "ttft_full_ms": round(t_full * 1e3, 2),
    "ttft_hit_ms": round(t_suf * 1e3, 2),
    "ttft_hit_device_ms": round(dev_ms, 2),
    "speedup": round(t_full / t_suf, 2),
}))
