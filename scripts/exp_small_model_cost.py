#!/usr/bin/env python
"""Where does a SMALL (few-layer) model's flat-kernel decode time go? (r5)

A 2-layer 7B-shaped draft costs ~3.4 ms/token on the per-token flat kernel
AND ~3.6-4.0 ms/token on the multi-token segment kernel — so the cost is
per-token IN-KERNEL, not launch glue (the 32-layer kernel runs 0.2 ms/layer;
the 2-layer one ~1.3 ms/layer). This bisects by sweeping the knobs that
don't change per-layer work:

  L in {2, 8}        -> per-layer vs per-token split
  vocab {32000, 6400} -> lm_head phase share
  T {256, 1024}       -> flash-phase step-count share

Each config: decode_loop_flat of 8 tokens, best-of-3 (fresh params per
config; random-quant weights — content-independent costs).
Usage: python scripts/exp_small_model_cost.py
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

from bench import build_quantized_llama_on_device
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill
from mi_optimize_tpu.serving.flatdecode import (
    decode_loop_flat, stack_cache_flat, stack_flat)

base = LlamaConfig.llama2_7b()
N = 8

for L, V, T in ((2, 32000, 256), (2, 6400, 256), (2, 32000, 1024),
                (8, 32000, 256)):
    cfg = dataclasses.replace(base, num_layers=L, vocab_size=V)
    model = fuse_for_serving(Model(
        config=cfg,
        params=build_quantized_llama_on_device(cfg, groupsize=128),
        family="llama"))
    fl = stack_flat(model)
    if fl is None:
        print(json.dumps({"cfg": [L, V, T], "skip": "no flat contract"}),
              flush=True)
        continue
    fstack, fmeta = fl
    cache = init_cache(cfg, 1, T, jnp.int8)
    prompt = np.random.default_rng(0).integers(0, V, (1, 48))
    logits, cache = prefill(model.params, cfg, jnp.asarray(prompt), cache,
                            True)
    tok = jnp.argmax(logits, -1)[:, None]
    fc = stack_cache_flat(cache)
    pos0 = jnp.asarray(prompt.shape[1])

    def run():
        toks, _ = decode_loop_flat(model.params, fstack, fmeta, cfg, tok,
                                   fc, pos0, N)
        _ = int(np.asarray(toks).reshape(-1)[-1])

    run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"L": L, "vocab": V, "T": T,
                      "ms_per_token": round(best / N * 1e3, 3)}), flush=True)

    # kernel-only: same flat kernel in a scan with NO embed/scatter glue —
    # a constant x chained through a tiny data dependence
    from mi_optimize_tpu.ops.model_flat import model_decode_flat

    @jax.jit
    def kernel_only(params, fstack, fc, pos):
        x0 = jnp.ones((1, 1, cfg.hidden_size), jnp.float32) * 0.02
        cs = jnp.ones((2 * cfg.head_dim,), jnp.float32) * 0.7

        def step(carry, _):
            x, p = carry
            tk, lg, kr, ks = model_decode_flat(fstack, x, cs, fc, p, cfg,
                                               fmeta)
            x = x + tk[0, 0].astype(x.dtype) * 1e-12
            return (x, p + 1), tk[0, 0]

        (_, _), xs = jax.lax.scan(step, (x0, pos), None, length=N)
        return xs

    def run_k():
        _ = int(np.asarray(kernel_only(model.params, fstack, fc, pos0))[-1])

    run_k()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_k()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"L": L, "vocab": V, "T": T, "kernel_only": True,
                      "ms_per_token": round(best / N * 1e3, 3)}), flush=True)
    del model, fstack, fc, cache
    import gc
    gc.collect()
