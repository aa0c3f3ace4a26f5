#!/usr/bin/env python
"""Batched (B=8) megakernel STEP decomposition on the real chip (round 5,
VERDICT item 4): a B=8 step costs ~14.2 ms vs 6.6 ms single-stream while
sharing the weight stream — this locates the extra ~7.6 ms.

Components (each a lax.scan of N=16 steps, best-of-3, scalar pulls):
  full_step         model_step_batch + argmax (the production loop body)
  megakernel_only   model_decode_mega_batch alone (no scatter, no lm_head)
  mega_plus_scatter + the 4 batched cache scatters
  lm_head_B_argmax  rms_norm + packed unembed + argmax for B rows alone
  embed_B           embedding gather alone
  full_step_deep    full_step with positions near T (flash-phase marginal)

7B int4 g128, random-init on-device weights, int8 KV, T=512.
Usage: python scripts/exp_batched_breakdown.py
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
from mi_optimize_tpu.models import llama
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache
from mi_optimize_tpu.serving.megadecode import (
    model_step_batch, stack_cache_batched, stack_lm, stack_serving)

B, T, N = 8, 512, 16
cfg = LlamaConfig.llama2_7b()
print("# building 7B int4 on device...", flush=True)
model = fuse_for_serving(Model(
    config=cfg, params=build_quantized_llama_on_device(cfg, groupsize=128),
    family="llama"))
params = model.params
stack, meta = stack_serving(model)
lmres = stack_lm(model, meta)
LM, LM_META = lmres if lmres is not None else (None, None)

# batched stacked cache built directly on device (host link is ~MB/s);
# HEAD-TRANSPOSED layout [L, B, Hkv, T, D] per stack_cache_batched
L = cfg.num_layers
cache = {
    "k": jnp.zeros((L, B, cfg.num_kv_heads, T, cfg.head_dim), jnp.int8),
    "v": jnp.zeros((L, B, cfg.num_kv_heads, T, cfg.head_dim), jnp.int8),
    "k_scale": jnp.ones((L, B, cfg.num_kv_heads, T), jnp.float32),
    "v_scale": jnp.ones((L, B, cfg.num_kv_heads, T), jnp.float32),
}
toks = jnp.ones((B, 1), jnp.int32)
pos_shallow = jnp.full((B,), 64, jnp.int32) + jnp.arange(B, dtype=jnp.int32)
pos_deep = jnp.full((B,), T - N - B - 2, jnp.int32) + jnp.arange(
    B, dtype=jnp.int32)


def timeit(name, fn):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    ms = best / N * 1e3
    print(json.dumps({"what": name, "ms_per_step": round(ms, 3),
                      "agg_tok_per_s": round(B * N / best, 1)}), flush=True)
    return ms


@partial(jax.jit, static_argnames=("use_lm",))
def full_loop(params, stack, toks, cache, pos, use_lm=False):
    lm = LM if use_lm else None
    lm_meta = LM_META if use_lm else None

    def step(carry, _):
        t, c, p = carry
        logits, c = model_step_batch(params, stack, meta, cfg, t, c, p,
                                     lm=lm, lm_meta=lm_meta)
        nt = jnp.argmax(logits, -1).astype(t.dtype)[:, None]
        return (nt, c, p + 1), nt[0, 0]

    (_, c, _), xs = jax.lax.scan(step, (toks, cache, pos), None, length=N)
    return xs


@jax.jit
def mega_only(params, stack, toks, cache, pos):
    from mi_optimize_tpu.ops.model_fused import model_decode_mega_batch

    x0 = llama.embed(params, toks)

    def step(carry, _):
        x, p = carry
        cos, sin = llama.rope_tables(cfg, p[:, None])
        xo, kr, vr, ks, vs = model_decode_mega_batch(
            stack, x, cos.reshape(B, -1)[:, -cfg.head_dim:],
            sin.reshape(B, -1)[:, -cfg.head_dim:], cache, p, cfg, meta)
        # feed the residual back (keeps the chain data-dependent, no scatter)
        return (xo, p + 1), xo[0, 0, 0]

    (_, _), xs = jax.lax.scan(step, (x0, pos), None, length=N)
    return xs


@jax.jit
def mega_scatter(params, stack, toks, cache, pos):
    from mi_optimize_tpu.ops.model_fused import model_decode_mega_batch
    from mi_optimize_tpu.serving.megadecode import _scatter_rows_batched

    x0 = llama.embed(params, toks)

    def step(carry, _):
        x, c, p = carry
        cos, sin = llama.rope_tables(cfg, p[:, None])
        xo, kr, vr, ks, vs = model_decode_mega_batch(
            stack, x, cos.reshape(B, -1)[:, -cfg.head_dim:],
            sin.reshape(B, -1)[:, -cfg.head_dim:], c, p, cfg, meta)
        kr, vr, ks, vs = jax.lax.optimization_barrier((kr, vr, ks, vs))
        c = _scatter_rows_batched(c, kr, vr, ks, vs, p)
        return (xo, c, p + 1), xo[0, 0, 0]

    (_, _, _), xs = jax.lax.scan(step, (x0, cache, pos), None, length=N)
    return xs


@jax.jit
def scatter_loop(params, cache, pos):
    from mi_optimize_tpu.serving.megadecode import _scatter_rows_batched

    kr = jnp.ones((L, B, cfg.num_kv_heads, cfg.head_dim), jnp.int8)
    ks = jnp.ones((L, B, cfg.num_kv_heads), jnp.float32)

    def step(carry, _):
        c, p = carry
        c = _scatter_rows_batched(c, kr, kr, ks, ks, p)
        return (c, p + 1), c["k"][0, 0, 0, 0, 0]

    (_, _), xs = jax.lax.scan(step, (cache, pos), None, length=N)
    return xs


@jax.jit
def lm_head_loop(params, toks):
    x0 = llama.embed(params, toks).astype(jnp.float32)

    def step(x, _):
        h = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = llama.unembed(params, cfg, h, fused=True)[:, 0]
        nt = jnp.argmax(logits, -1)
        return x + nt[:, None, None].astype(x.dtype) * 1e-9, nt[0]

    _, xs = jax.lax.scan(step, x0, None, length=N)
    return xs


@jax.jit
def embed_loop(params, toks):
    def step(t, _):
        x = llama.embed(params, t)
        nt = (t + jnp.asarray(x.sum() * 1e-9, t.dtype)) % 1000
        return nt, x[0, 0, 0]

    _, xs = jax.lax.scan(step, toks, None, length=N)
    return xs


timeit("full_step_B8", lambda: int(np.asarray(
    full_loop(params, stack, toks, cache, pos_shallow))[-1]))
timeit("megakernel_only_B8", lambda: float(np.asarray(
    mega_only(params, stack, toks, cache, pos_shallow))[-1]))
timeit("mega_plus_scatter_B8", lambda: float(np.asarray(
    mega_scatter(params, stack, toks, cache, pos_shallow))[-1]))
timeit("lm_head_B8_argmax", lambda: int(np.asarray(
    lm_head_loop(params, toks))[-1]))
timeit("embed_B8", lambda: float(np.asarray(embed_loop(params, toks))[-1]))
timeit("scatter_only_B8", lambda: int(np.asarray(
    scatter_loop(params, cache, pos_shallow))[-1]))
timeit("full_step_B8_deep", lambda: int(np.asarray(
    full_loop(params, stack, toks, cache, pos_deep))[-1]))
if LM is not None:
    timeit("full_step_B8_fused_lm", lambda: int(np.asarray(
        full_loop(params, stack, toks, cache, pos_shallow, use_lm=True))[-1]))
    timeit("full_step_B8_deep_fused_lm", lambda: int(np.asarray(
        full_loop(params, stack, toks, cache, pos_deep, use_lm=True))[-1]))
