#!/usr/bin/env python
"""Paged vs dense batched megakernel decode on the real chip (round 3,
VERDICT item 8 done-clause: paged aggregate tok/s within ~10% of dense).

Both paths run the SAME whole-model batched kernel; paged adds only the
page-table indirection in the KV BlockSpec index maps and the (page, offset)
row scatter. B slots, N scan steps, positions mid-sequence. T=2048 is where
paging matters (dense reserves B*T rows; the pool holds only live pages).
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
from mi_optimize_tpu.serving.megadecode import (
    init_pool_batched, model_step_batch, model_step_batch_paged,
    stack_cache_batched, stack_serving)

N = 16
cfg = LlamaConfig.llama2_7b()
model = fuse_for_serving(Model(
    config=cfg, params=build_quantized_llama_on_device(cfg, groupsize=128),
    family="llama"))
params = model.params
stack, meta = stack_serving(model)


@jax.jit
def loop_dense(params, stack, toks, cache, pos):
    def step(carry, _):
        t, c, p = carry
        logits, c = model_step_batch(params, stack, meta, cfg, t, c, p)
        nt = jnp.argmax(logits, -1).astype(t.dtype)[:, None]
        return (nt, c, p + 1), nt[0, 0]

    (_, _, _), xs = jax.lax.scan(step, (toks, cache, pos), None, length=N)
    return xs


@jax.jit
def loop_paged(params, stack, toks, pool, table, pos):
    def step(carry, _):
        t, pl_, p = carry
        logits, pl_ = model_step_batch_paged(params, stack, meta, cfg, t,
                                             pl_, table, p)
        nt = jnp.argmax(logits, -1).astype(t.dtype)[:, None]
        return (nt, pl_, p + 1), nt[0, 0]

    (_, _, _), xs = jax.lax.scan(step, (toks, pool, pos), None, length=N)
    return xs


def run(B, T):
    P = 256 if (T % 256 == 0 and T >= 1024) else 128
    nt = T // P
    toks = jnp.ones((B, 1), jnp.int32)
    # mid-sequence positions: ~T/3 of the cache is live per slot
    pos_np = (T // 3 + 37 * np.arange(B)).astype(np.int32)
    pos0 = jnp.asarray(pos_np)

    cache = stack_cache_batched(init_cache(cfg, B, T, jnp.int8))
    out = loop_dense(params, stack, toks, cache, pos0); _ = int(out[-1])
    t0 = time.perf_counter()
    out = loop_dense(params, stack, toks, cache, pos0); _ = int(out[-1])
    dt_d = time.perf_counter() - t0
    del cache

    # pool sized to live pages only (+N-step growth headroom +scratch)
    live = [int(p) // P + 1 for p in pos_np]
    n_pages = 1 + sum(l + 1 for l in live)
    pool = init_pool_batched(cfg, n_pages, P)
    table = np.zeros((B, nt), np.int32)
    pg = 1
    for b in range(B):
        for t in range(live[b] + 1):
            table[b, t] = pg
            pg += 1
    table = jnp.asarray(table)
    out = loop_paged(params, stack, toks, pool, table, pos0); _ = int(out[-1])
    t0 = time.perf_counter()
    out = loop_paged(params, stack, toks, pool, table, pos0); _ = int(out[-1])
    dt_p = time.perf_counter() - t0

    dense_rows = B * T
    pool_rows = n_pages * P
    print(json.dumps({
        "what": f"paged_vs_dense_batched_mega B={B} T={T} P={P}",
        "dense_tokens_per_s_aggregate": round(B * N / dt_d, 2),
        "paged_tokens_per_s_aggregate": round(B * N / dt_p, 2),
        "paged_over_dense": round(dt_d / dt_p, 4),
        "kv_rows_reserved_dense": dense_rows,
        "kv_rows_reserved_paged": pool_rows,
        "kv_memory_ratio": round(pool_rows / dense_rows, 3),
    }), flush=True)


for B, T in ((8, 2048), (8, 256)):
    run(B, T)
