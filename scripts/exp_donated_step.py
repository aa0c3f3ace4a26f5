#!/usr/bin/env python
"""Host-loop donated vs non-donated B=8 step cost on the real chip (r5,
ROADMAP item 3 re-measure).

The production batchers (ContinuousBatcher, PagedMegaBatcher, beam) drive
the B-slot megakernel from a HOST loop — one jit dispatch per step. Without
buffer donation the step's output cache cannot alias its input: every step
materializes a fresh multi-GB cache (measured ~4 ms at B=8 T=512 dense on
top of the row scatter's ~0.25 ms). `model_step_batch{,_paged}_donated`
(megadecode.py) donate the cache/pool so the scatter lands in place.

Two instruments:
  (a) per-step blocking pull (the batchers' actual behavior), N=8 steps,
      plain vs donated — the ~24 ms tunnel RTT is identical in both, so
      the DELTA is the copy removed;
  (b) async pipelined loop (one final pull), N1=8/N2=32 two-point fit —
      DONATED ONLY (a non-donated async loop would queue a fresh 2.75 GB
      cache per in-flight step and OOM HBM); this is the device-true
      host-loop step cost, comparable to the in-scan 16.25 ms breakdown.

7B int4 g128, random-init on-device weights, int8 KV, B=8 T=512.
Usage: timeout 1800 python scripts/exp_donated_step.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_quantized_llama_on_device
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving
from mi_optimize_tpu.serving.megadecode import (
    init_pool_batched, model_step_batch, model_step_batch_donated,
    model_step_batch_paged, model_step_batch_paged_donated, stack_serving)

B, T = 8, 512
cfg = LlamaConfig.llama2_7b()
print("# building 7B int4 on device...", flush=True)
model = fuse_for_serving(Model(
    config=cfg, params=build_quantized_llama_on_device(cfg, groupsize=128),
    family="llama"))
params = model.params
stack, meta = stack_serving(model)
# decode-only: per-layer packed copies are dead weight after stacking
# (~3.5GB HBM); the step reads only embed/final_norm/lm_head from params
params = dict(params)
params["layers"] = [{"input_norm": b["input_norm"],
                     "post_norm": b["post_norm"]} for b in params["layers"]]
del model

L = cfg.num_layers


def fresh_cache():
    return {
        "k": jnp.zeros((L, B, cfg.num_kv_heads, T, cfg.head_dim), jnp.int8),
        "v": jnp.zeros((L, B, cfg.num_kv_heads, T, cfg.head_dim), jnp.int8),
        "k_scale": jnp.ones((L, B, cfg.num_kv_heads, T), jnp.float32),
        "v_scale": jnp.ones((L, B, cfg.num_kv_heads, T), jnp.float32),
    }


PG = 128
pps = T // PG


def fresh_pool():
    pool = init_pool_batched(cfg, 1 + B * pps, PG)
    table = np.zeros((B, pps), np.int32)
    table[:] = 1 + np.arange(B * pps).reshape(B, pps)
    return pool, jnp.asarray(table)


@jax.jit
def next_tok(logits):
    return jnp.argmax(logits, -1).astype(jnp.int32)[:, None]


def run_loop(step_fn, state0, n, blocking):
    toks = jnp.ones((B, 1), jnp.int32)
    pos = jnp.full((B,), 64, jnp.int32) + jnp.arange(B, dtype=jnp.int32)
    state = state0
    t0 = time.perf_counter()
    for _ in range(n):
        logits, state = step_fn(toks, state, pos)
        toks = next_tok(logits)
        pos = pos + 1
        if blocking:
            int(np.asarray(toks)[0, 0])
    if not blocking:
        int(np.asarray(toks)[0, 0])       # the one blocking pull
    return time.perf_counter() - t0, state


def measure_blocking(name, step_fn, mk_state, n=8):
    run_loop(step_fn, mk_state(), 2, True)          # compile + warm
    best = float("inf")
    for _ in range(3):
        t, st = run_loop(step_fn, mk_state(), n, True)
        best = min(best, t)
        del st
    ms = best / n * 1e3
    print(json.dumps({"what": name, "ms_per_step_incl_rtt": round(ms, 2)}),
          flush=True)
    return ms


def measure_async_fit(name, step_fn, mk_state, n1=8, n2=32):
    run_loop(step_fn, mk_state(), 2, False)
    best1 = best2 = float("inf")
    for _ in range(3):
        t, st = run_loop(step_fn, mk_state(), n1, False)
        best1 = min(best1, t)
        del st
        t, st = run_loop(step_fn, mk_state(), n2, False)
        best2 = min(best2, t)
        del st
    step_ms = (best2 - best1) / (n2 - n1) * 1e3
    print(json.dumps({
        "what": name, "ms_per_step": round(step_ms, 3),
        "agg_tok_per_s": round(B * 1e3 / step_ms, 1),
        "fitted_rtt_ms": round(best1 * 1e3 - n1 * step_ms, 1),
    }), flush=True)
    return step_ms


def dense_plain(toks, cache, pos):
    return model_step_batch(params, stack, meta, cfg, toks, cache, pos)


def dense_don(toks, cache, pos):
    return model_step_batch_donated(params, stack, meta, cfg, toks, cache,
                                    pos)


pool0, table = fresh_pool()
del pool0


def paged_plain(toks, pool, pos):
    return model_step_batch_paged(params, stack, meta, cfg, toks, pool,
                                  table, pos)


def paged_don(toks, pool, pos):
    return model_step_batch_paged_donated(params, stack, meta, cfg, toks,
                                          pool, table, pos)


dp = measure_blocking("dense_plain_B8_blocking", dense_plain, fresh_cache)
dd = measure_blocking("dense_donated_B8_blocking", dense_don, fresh_cache)
pp = measure_blocking("paged_plain_B8_blocking", paged_plain,
                      lambda: fresh_pool()[0])
pd = measure_blocking("paged_donated_B8_blocking", paged_don,
                      lambda: fresh_pool()[0])
print(json.dumps({
    "what": "donated_copy_removed",
    "dense_ms": round(dp - dd, 2), "paged_ms": round(pp - pd, 2),
}), flush=True)

# device-true pipelined host-loop step (donated only — see module docstring)
measure_async_fit("dense_donated_B8_async_fit", dense_don, fresh_cache)
measure_async_fit("paged_donated_B8_async_fit", paged_don,
                  lambda: fresh_pool()[0])
