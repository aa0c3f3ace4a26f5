#!/usr/bin/env python
"""Batched multi-slot decode throughput on the real chip (VERDICT r2 item 6).

Aggregate tokens/s for B slots decoding together through decode_step_multi
(int8 KV cache, packed int4 weights, per-slot positions) as a lax.scan —
the continuous-batching fast path. Single-stream (B=1) via the whole-model
megakernel is the bench.py headline; this measures the batching scale-up.
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
from mi_optimize_tpu.serving import fuse_for_serving, init_cache
from mi_optimize_tpu.serving.batching import decode_step_multi

N = 16
cfg = LlamaConfig.llama2_7b()
params = build_quantized_llama_on_device(cfg, groupsize=128)
model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
params = model.params


# params must be ARGUMENTS: closure capture embeds 4GB of constants in the
# program, which breaks the remote compile relay
@jax.jit
def loop_xla(params, toks, cache, pos):
    def step(carry, _):
        t, c, p = carry
        logits, c = decode_step_multi(params, cfg, t, c, p, True)
        nt = jnp.argmax(logits, -1).astype(t.dtype)[:, None]
        return (nt, c, p + 1), nt[0, 0]

    (_, _, _), xs = jax.lax.scan(step, (toks, cache, pos), None, length=N)
    return xs


def run_batch(B, T=256):
    cache = init_cache(cfg, B, T, jnp.int8)
    toks = jnp.ones((B, 1), jnp.int32)
    pos0 = jnp.full((B,), 64, jnp.int32) + jnp.arange(B, dtype=jnp.int32)
    loop = lambda t, c, p: loop_xla(params, t, c, p)

    out = loop(toks, cache, pos0)
    _ = int(out[-1])
    t0 = time.perf_counter()
    out = loop(toks, cache, pos0)
    _ = int(out[-1])
    dt = time.perf_counter() - t0
    agg = B * N / dt
    print(json.dumps({"what": f"batched_decode_xla B={B} T={T} int8kv",
                      "tokens_per_s_aggregate": round(agg, 2),
                      "per_stream": round(agg / B, 2)}), flush=True)


from mi_optimize_tpu.serving.megadecode import (
    model_step_batch, stack_cache_batched, stack_serving)

stack, meta = stack_serving(model)


@jax.jit
def loop_mega(params, stack, toks, cache, pos):
    def step(carry, _):
        t, c, p = carry
        logits, c = model_step_batch(params, stack, meta, cfg, t, c, p)
        nt = jnp.argmax(logits, -1).astype(t.dtype)[:, None]
        return (nt, c, p + 1), nt[0, 0]

    (_, _, _), xs = jax.lax.scan(step, (toks, cache, pos), None, length=N)
    return xs


def run_batch_mega(B, T=256):
    cache_l = init_cache(cfg, B, T, jnp.int8)
    sc = stack_cache_batched(cache_l)
    toks = jnp.ones((B, 1), jnp.int32)
    pos0 = jnp.full((B,), 64, jnp.int32) + jnp.arange(B, dtype=jnp.int32)
    out = loop_mega(params, stack, toks, sc, pos0)
    _ = int(out[-1])
    t0 = time.perf_counter()
    out = loop_mega(params, stack, toks, sc, pos0)
    _ = int(out[-1])
    dt = time.perf_counter() - t0
    agg = B * N / dt
    print(json.dumps({"what": f"batched_decode_MEGA B={B} T={T} int8kv",
                      "tokens_per_s_aggregate": round(agg, 2),
                      "per_stream": round(agg / B, 2)}), flush=True)


import os

which = os.environ.get("MI_BD_WHICH", "both")
if which in ("both", "mega"):
    for B in (8, 4):
        run_batch_mega(B)
if which in ("both", "xla"):
    for B in (8,):
        run_batch(B)
