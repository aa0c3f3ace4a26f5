#!/usr/bin/env python
"""Decode-step time breakdown on the real chip (round 2, VERDICT item 4).

Times, per token: (a) full decode_loop_model step, (b) megakernel only,
(c) megakernel + cache scatter (no lm_head), (d) lm_head matmul only.
Each as an n-iteration lax.scan with a scalar pull (block_until_ready can
return early on this runtime — CLAUDE.md).
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
from mi_optimize_tpu.models import llama
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill
from mi_optimize_tpu.serving.megadecode import (
    _model_step, decode_loop_model, stack_cache, stack_serving)
from mi_optimize_tpu.ops.model_fused import model_decode_mega

N = 32
cfg = LlamaConfig.llama2_7b()
params = build_quantized_llama_on_device(cfg, groupsize=128)
model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
params = model.params
stack, meta = stack_serving(model)

prompt_len = 128
total = 256
cache_l = init_cache(cfg, 1, total, jnp.int8)
ids = jax.random.randint(jax.random.PRNGKey(1), (1, prompt_len), 0, cfg.vocab_size)
logits, cache_l = prefill(params, cfg, ids, cache_l, True)
cache = stack_cache(cache_l)
tok = jnp.argmax(logits, -1)[:, None]
pos0 = jnp.asarray(prompt_len)


def timeit(name, fn, *args):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / N * 1e3
    print(json.dumps({"what": name, "ms_per_token": round(dt, 3)}))
    return dt


# (a) full loop
timeit("full_step", lambda: decode_loop_model(params, stack, meta, cfg, tok,
                                              cache, pos0, N)[0])


# (b) megakernel only (no cache update, no lm_head; x feeds back)
# NOTE: stack/cache must be ARGUMENTS — closure capture embeds them as 4GB
# program constants, which breaks the remote compile relay
@jax.jit
def mega_only(params, stack, cache, tok, pos0):
    x0 = llama.embed(params, tok)

    def step(carry, _):
        x, pos = carry
        cos, sin = llama.rope_tables(cfg, pos[None])
        x2, *_ = model_decode_mega(stack, x, cos.reshape(-1)[-cfg.head_dim:],
                                   sin.reshape(-1)[-cfg.head_dim:],
                                   cache, pos, cfg, meta)
        return (x2, pos + 1), x2[0, 0, 0]

    (_, _), xs = jax.lax.scan(step, (x0, pos0), None, length=N)
    return xs


timeit("megakernel_only", mega_only, params, stack, cache, tok, pos0)


# (c) megakernel + cache scatter (no lm_head/argmax)
@jax.jit
def mega_scatter(params, stack, cache, tok, pos0):
    x0 = llama.embed(params, tok)

    def step(carry, _):
        x, c, pos = carry
        cos, sin = llama.rope_tables(cfg, pos[None])
        x2, krows, vrows, ksr, vsr = model_decode_mega(
            stack, x, cos.reshape(-1)[-cfg.head_dim:],
            sin.reshape(-1)[-cfg.head_dim:], c, pos, cfg, meta)
        upd = lambda buf, new: jax.lax.dynamic_update_slice(
            buf, new[:, None].astype(buf.dtype), (0, pos) + (0,) * (buf.ndim - 2))
        c = {"k": upd(c["k"], krows), "v": upd(c["v"], vrows),
             "k_scale": upd(c["k_scale"], ksr), "v_scale": upd(c["v_scale"], vsr)}
        return (x2, c, pos + 1), x2[0, 0, 0]

    (_, _, _), xs = jax.lax.scan(step, (x0, cache, pos0), None, length=N)
    return xs


timeit("mega_plus_scatter", mega_scatter, params, stack, cache, tok, pos0)


# (d) lm_head only
@jax.jit
def lm_head_only(params, tok):
    x0 = llama.embed(params, tok)

    def step(x, _):
        h = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = llama.unembed(params, cfg, h, fused=True)[:, 0]
        nt = jnp.argmax(logits, -1)
        x2 = x + nt.astype(x.dtype)[None, None] * 1e-9
        return x2, nt[0]

    _, xs = jax.lax.scan(step, x0, None, length=N)
    return xs


timeit("lm_head_argmax_only", lm_head_only, params, tok)
