#!/usr/bin/env python
"""W4A8 vs W4A16 prefill on the real chip (VERDICT r2 item 4b).

Times (a) the marginal per-matrix matmul at prefill shapes and (b) a full-model
prefill, comparing the f32 dequant kernel (W4A16 path) against the int8-dot
W4A8 kernel. Results go into BENCH_DETAILS.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mi_optimize_tpu.core import packing, qparams
from mi_optimize_tpu.core.qparams import qrange
from mi_optimize_tpu.ops.dequant_matmul import packed_matmul
from mi_optimize_tpu.ops.w4a8_matmul import w4a8_matmul_int

BITS, G = 4, 128
rng = qrange(BITS, True)


import functools


@functools.partial(jax.jit, static_argnames=("n", "k"))
def mk(key, n, k):
    w = jax.random.normal(key, (n, k), jnp.float32) * (k ** -0.5)
    fake, scale, zero = qparams.quantize_dequantize(w, BITS, "per_group", G)
    ints = qparams.quantize_to_int(fake, scale, zero, BITS, "per_group", G)
    return packing.pack_weight_device(ints, BITS, rng), scale, zero


def pull(x):
    return float(np.asarray(x).reshape(-1)[0])


def timeit(name, fn, iters=8):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"what": name, "ms": round(dt, 3)}))
    return dt


K = N = 4096
M = 1024
packed, scale, zero = mk(jax.random.PRNGKey(0), N, K)
ng = K // G
scales_t = jnp.broadcast_to(scale.reshape(N, ng).T, (ng, N))
zeros_t = jnp.broadcast_to(zero.reshape(N, ng).T, (ng, N))
x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
xi = jnp.clip(jnp.round(x * 127), -128, 127).astype(jnp.int8)

# chain CH calls inside one jit so the per-dispatch floor amortizes
CH = 8


@jax.jit
def chain_f32():
    y = x
    for _ in range(CH):
        y = packed_matmul(y, packed, scales_t, zeros_t, bits=BITS, groupsize=G,
                          qmin=0, out_features=N, in_features=K)
        y = y * (1.0 / N)
    return y[0, 0]


@jax.jit
def chain_int8():
    acc = jnp.zeros((M, N), jnp.float32)
    z = xi
    for _ in range(CH):
        acc = w4a8_matmul_int(z, packed, scales_t, zeros_t, bits=BITS,
                              groupsize=G, qmin=0)
        z = jnp.clip(jnp.round(acc * (127.0 / N)), -128, 127).astype(jnp.int8)
    return acc[0, 0]


t_f32 = timeit(f"chain{CH}_w4a16_f32_dequant M={M}", lambda: pull(chain_f32()))
t_i8 = timeit(f"chain{CH}_w4a8_int8_dot    M={M}", lambda: pull(chain_int8()))
print(json.dumps({"what": "marginal_speedup_w4a8_vs_f32",
                  "value": round(t_f32 / t_i8, 3)}))

# ---- full-model prefill ----------------------------------------------------
from bench import build_quantized_llama_on_device
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill

cfg = LlamaConfig.llama2_7b()
params = build_quantized_llama_on_device(cfg, groupsize=G)
model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))


def reparam(abit):
    # flip the serving spec to W4A8 (dynamic per-token int8 activations)
    def flip(lin):
        from mi_optimize_tpu.models.quant_linear import QuantizedLinear

        if not isinstance(lin, QuantizedLinear) or lin.packed is None:
            return lin
        return lin.replace(spec=lin.spec.replace(
            abit=abit, a_qtype="per_token", a_dynamic=True, a_symmetric=True,
            a_unsigned=False))

    p = dict(model.params)
    p["layers"] = [{k: flip(v) for k, v in b.items()} for b in p["layers"]]
    p["lm_head"] = flip(p["lm_head"])
    return p


for S in (512, 1024):
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, S), 0, cfg.vocab_size)
    cache = init_cache(cfg, 1, S + 128, jnp.int8)
    for name, abit in (("w4a16", None), ("w4a8", 8)):
        p = reparam(abit)
        run = lambda: pull(prefill(p, cfg, ids, cache, True)[0])
        dt = timeit(f"prefill S={S} {name}", run, iters=4)
        print(json.dumps({"what": f"prefill_tok_per_s S={S} {name}",
                          "value": round(S / (dt / 1e3), 1)}))
