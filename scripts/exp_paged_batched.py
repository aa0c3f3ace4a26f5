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
# decode-only experiment: after stacking, the per-layer packed copies are
# dead weight (~3.5GB HBM) — at B=8 T=2048 keeping them OOMs even the paged
# run. The step functions read only embed/final_norm/lm_head from params.
params = dict(params)
params["layers"] = [{"input_norm": b["input_norm"],
                     "post_norm": b["post_norm"]} for b in params["layers"]]
del model


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


def run_dense(B, T, pos_np):
    toks = jnp.ones((B, 1), jnp.int32)
    pos0 = jnp.asarray(pos_np)
    cache = stack_cache_batched(init_cache(cfg, B, T, jnp.int8))
    out = loop_dense(params, stack, toks, cache, pos0); _ = int(out[-1])
    t0 = time.perf_counter()
    out = loop_dense(params, stack, toks, cache, pos0); _ = int(out[-1])
    return time.perf_counter() - t0


def run_paged(B, T, pos_np):
    P = 256 if (T % 256 == 0 and T >= 1024) else 128
    nt = T // P
    toks = jnp.ones((B, 1), jnp.int32)
    pos0 = jnp.asarray(pos_np)
    # pool sized to live pages only (+N-step growth headroom, capped at the
    # slot's logical capacity, +scratch)
    live = [min(int(p) // P + 2, nt) for p in pos_np]
    n_pages = 1 + sum(live)
    pool = init_pool_batched(cfg, n_pages, P)
    table = np.zeros((B, nt), np.int32)
    pg = 1
    for b in range(B):
        for t in range(live[b]):
            table[b, t] = pg
            pg += 1
    table = jnp.asarray(table)
    out = loop_paged(params, stack, toks, pool, table, pos0); _ = int(out[-1])
    t0 = time.perf_counter()
    out = loop_paged(params, stack, toks, pool, table, pos0); _ = int(out[-1])
    return time.perf_counter() - t0, n_pages * P


def run(B, T):
    # mid-sequence positions: ~T/3..2T/3 of the cache live per slot
    pos_np = (T // 3 + (T // (3 * B)) * np.arange(B)).astype(np.int32)
    rec = {"what": f"paged_vs_dense_batched_mega B={B} T={T}"}
    # paged FIRST: a dense-OOM attempt leaves HBM fragmented enough to sink
    # the paged run too (measured r4: even a jnp.ones failed after it)
    dt_p, pool_rows = run_paged(B, T, pos_np)
    rec["paged_tokens_per_s_aggregate"] = round(B * N / dt_p, 2)
    try:
        dt_d = run_dense(B, T, pos_np)
        rec["dense_tokens_per_s_aggregate"] = round(B * N / dt_d, 2)
    except Exception as e:  # measured r3: B=8 T=2048 dense OOMs (the dense
        dt_d = None         # cache + the scan's double buffer exceed HBM)
        rec["dense_tokens_per_s_aggregate"] = f"OOM ({type(e).__name__})"
    if dt_d is not None:
        rec["paged_over_dense"] = round(dt_d / dt_p, 4)
    rec["kv_rows_reserved_dense"] = B * T
    rec["kv_rows_reserved_paged"] = pool_rows
    rec["kv_memory_ratio"] = round(pool_rows / (B * T), 3)
    print(json.dumps(rec), flush=True)


cfgs = os.environ.get("MI_PB_CONFIGS", "8x512,8x2048")
for spec in cfgs.split(","):
    B, T = (int(v) for v in spec.split("x"))
    run(B, T)
