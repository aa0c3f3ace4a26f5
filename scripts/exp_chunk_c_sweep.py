#!/usr/bin/env python
"""Chunk-kernel cost vs C on the real chip (r5 follow-up).

k=12/16 spec rounds measured 46/65 ms — superlinear in C even with the
XLA-lm verify (k=8/C=9 verify is ~9.7 ms device-true). This sweeps the
chunk verify C in {5, 9, 13, 17} at shallow prefix, plus C=16 at a
1008-token prefix (the suffix-admission case that measured 70.7 ms
device-true), to locate the cliff: intra-chunk O(C^2) pass, per-flash-row
updates, or a VMEM/layout step.

Each point: scan of 4 chunk calls in ONE dispatch (carries ~24 ms RTT
total -> ~6 ms/unit amortized; device-true = (total - 24)/4).
7B int4 g128 random-init, int8 KV, T=1152.
Usage: timeout 2400 python scripts/exp_chunk_c_sweep.py
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
from mi_optimize_tpu.serving.megadecode import model_step_chunk, stack_serving

T = 1152
cfg = LlamaConfig.llama2_7b()
print("# building 7B int4 on device...", flush=True)
model = fuse_for_serving(Model(
    config=cfg, params=build_quantized_llama_on_device(cfg, groupsize=128),
    family="llama"))
stack, meta = stack_serving(model)
params = model.params
L = cfg.num_layers

cache = {
    "k": jnp.zeros((L, 1, cfg.num_kv_heads, T, cfg.head_dim), jnp.int8),
    "v": jnp.zeros((L, 1, cfg.num_kv_heads, T, cfg.head_dim), jnp.int8),
    "k_scale": jnp.ones((L, 1, cfg.num_kv_heads, T), jnp.float32),
    "v_scale": jnp.ones((L, 1, cfg.num_kv_heads, T), jnp.float32),
}


@partial(jax.jit, static_argnames=("C", "prefix"))
def verify_scan(params, stack, cache, C, prefix):
    toks = jnp.ones((1, C), jnp.int32)

    def body(c, i):
        lg, c2 = model_step_chunk(params, stack, meta, cfg, toks, c,
                                  jnp.asarray(prefix) + i * (C + 1))
        return c2, lg[0, 0]

    _, ys = jax.lax.scan(body, cache, jnp.arange(4))
    return ys


def run(C, prefix):
    f = lambda: float(np.asarray(verify_scan(params, stack, cache, C,
                                             prefix))[-1])
    f()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "what": f"chunk_C{C}_prefix{prefix}",
        "ms_total": round(best * 1e3, 2),
        "ms_per_call": round(best / 4 * 1e3, 3),
        "ms_device_true": round((best * 1e3 - 24) / 4, 2),
    }), flush=True)


CS = tuple(int(x) for x in
           os.environ.get("MI_CSWEEP", "5,9,13,17").split(","))
for C in CS:
    run(C, 64)
if not os.environ.get("MI_CSWEEP") or os.environ.get("MI_CSWEEP_DEEP"):
    run(16, 1008)
