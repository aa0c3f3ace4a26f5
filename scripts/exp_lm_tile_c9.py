#!/usr/bin/env python
"""Diagnose the C=9 / B=8 fused-lm VMEM pipeline cliff (r5, ROADMAP item 4).

The terminal lm_head rows of the batched/chunk megakernel stream the packed
unembed in (h/vpw, tv) tiles — tv=3200 by default (6.5 MB/operand, 13 MB
double-buffered). At C=9 (k=8 spec-dec verify) and B=8 the fused variant
measured SLOWER than the XLA lm_head it replaces (43.7 ms/round, 19.7 vs
16.2 ms/step) while C<=5 wins — hypothesis: the lm tile double-buffer
crosses the scoped-VMEM pipeline cliff once the B/C-row phases' scratch
grows. This sweeps MI_TV (read at TRACE time by _pick_tv, so it can vary
in-process across stack_lm calls):

  C=9 chunk verify  lm in {none, 3200, 1280, 640}, scan of 4 calls
  B=8 dense step    lm in {1280, 640}, scan of 16 (3200 known: 19.7 ms)

7B int4 g128 random-init weights, int8 KV, T=256 (chunk) / 512 (B=8).
Usage: timeout 2400 python scripts/exp_lm_tile_c9.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_quantized_llama_on_device
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving
from mi_optimize_tpu.serving.megadecode import (
    model_step_batch, model_step_chunk, stack_lm, stack_serving)

C, T, TB, N = 9, 256, 512, 16
cfg = LlamaConfig.llama2_7b()
print("# building 7B int4 on device...", flush=True)
model = fuse_for_serving(Model(
    config=cfg, params=build_quantized_llama_on_device(cfg, groupsize=128),
    family="llama"))
stack, meta = stack_serving(model)
params = model.params
L = cfg.num_layers


def cache_b(B, T_):
    return {
        "k": jnp.zeros((L, B, cfg.num_kv_heads, T_, cfg.head_dim), jnp.int8),
        "v": jnp.zeros((L, B, cfg.num_kv_heads, T_, cfg.head_dim), jnp.int8),
        "k_scale": jnp.ones((L, B, cfg.num_kv_heads, T_), jnp.float32),
        "v_scale": jnp.ones((L, B, cfg.num_kv_heads, T_), jnp.float32),
    }


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


chunk_toks = jnp.ones((1, C), jnp.int32)


@partial(jax.jit, static_argnames=("lm_meta",))
def verify_scan(params, stack, cache, toks, lm, lm_meta):
    def body(c, i):
        lg, c2 = model_step_chunk(params, stack, meta, cfg, toks, c,
                                  jnp.asarray(64) + i * (C + 1),
                                  lm=lm, lm_meta=lm_meta)
        return c2, lg[0, 0] if lm is None else lg[0, 0]

    _, ys = jax.lax.scan(body, cache, jnp.arange(4))
    return ys


@partial(jax.jit, static_argnames=("lm_meta",))
def b8_scan(params, stack, toks, cache, pos, lm, lm_meta):
    def step(carry, _):
        t, c, p = carry
        logits, c = model_step_batch(params, stack, meta, cfg, t, c, p,
                                     lm=lm, lm_meta=lm_meta)
        nt = jnp.argmax(logits, -1).astype(t.dtype)[:, None]
        return (nt, c, p + 1), nt[0, 0]

    (_, c, _), xs = jax.lax.scan(step, (toks, cache, pos), None, length=N)
    return xs


def lm_for(tv):
    if tv is None:
        return None, None
    os.environ["MI_TV"] = str(tv)
    res = stack_lm(model, meta)
    os.environ.pop("MI_TV", None)
    assert res is not None, f"stack_lm declined at tv={tv}"
    if tv:
        assert res[1][3] == tv, res[1]
    return res


cc = cache_b(1, T)
for tv in (None, 0, 1280, 640):
    lm, lm_meta = lm_for(tv)
    tag = "none" if tv is None else (str(lm_meta[3]) if lm_meta else "?")
    timeit(f"chunk_verify_C{C}_lm_{tag}",
           lambda lm=lm, lm_meta=lm_meta: float(np.asarray(verify_scan(
               params, stack, cc, chunk_toks, lm, lm_meta))[-1]), 4)
del cc

cb = cache_b(8, TB)
toks8 = jnp.ones((8, 1), jnp.int32)
pos8 = jnp.full((8,), 64, jnp.int32) + jnp.arange(8, dtype=jnp.int32)
for tv in (1280, 640):
    lm, lm_meta = lm_for(tv)
    timeit(f"b8_step_lm_{lm_meta[3]}",
           lambda lm=lm, lm_meta=lm_meta: int(np.asarray(b8_scan(
               params, stack, toks8, cb, pos8, lm, lm_meta))[-1]), N)
