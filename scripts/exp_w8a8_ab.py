#!/usr/bin/env python
"""W8A8 int8-dot vs f32-dequant A/B on the real chip (round 4, VERDICT
item 5): settle README's "faster" claim for ops/int8_matmul.py with
measured numbers at 7B shapes.

Two regimes, per linear shape (qkv 4096->12288, o 4096->4096,
gate/up 4096->11008, down 11008->4096):
  decode   M=1   (bandwidth-bound: both paths stream the same int8 words;
                  int8-dot saves only the dequant VPU work)
  prefill  M=512 (compute-bound: int8xint8->int32 MXU runs 2x bf16 rate)

Paths:
  f32_dequant  unpack int8 -> (q-z)*s f32 -> f32/bf16 dot (the W4A16-style
               kernel's math at 8 bit, via quant_linear_apply fused=False
               reference formulation)
  int8_dot     ops/int8_matmul.w8a8_matmul (per-token dynamic act quant,
               exact int32 accumulation)

Prints one JSON line per (shape, M): ms per call + speedup.
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
from mi_optimize_tpu.models.quant_linear import QuantSpec, QuantizedLinear
from mi_optimize_tpu.ops.int8_matmul import supports_native_int8, w8a8_matmul

if os.environ.get("MI_SMOKE"):          # CPU correctness/syntax smoke
    SHAPES = [("tiny", 256, 256)]
    MS = (1, 8)
    ITERS = 2
else:
    SHAPES = [("qkv", 12288, 4096), ("o", 4096, 4096),
              ("gateup", 22016, 4096), ("down", 4096, 11008)]
    MS = (1, 512)
    ITERS = 16


def mk_lin(key, out_f, in_f):
    spec = QuantSpec(wbit=8, abit=8, w_qtype="per_channel",
                     a_qtype="per_token", w_symmetric=True, a_symmetric=True,
                     a_unsigned=False, a_dynamic=True, w_packed=True)
    rng = qrange(8, spec.w_unsigned)
    w = jax.random.normal(key, (out_f, in_f), jnp.float32) * (in_f ** -0.5)
    fake, scale, zero = qparams.quantize_dequantize(
        w, 8, "per_channel", symmetric=True)
    ints = qparams.quantize_to_int(fake, scale, zero, 8, "per_channel")
    packed = packing.pack_weight_device(ints, 8, rng)
    return QuantizedLinear(spec=spec, out_features=out_f, in_features=in_f,
                           packed=packed, w_scale=scale, w_zero=zero)


@jax.jit
def f32_dequant_chain(x, packed, scale, zero, n_iters=ITERS):
    """Dequantize-then-dot, iterated (fresh activation each pass so nothing
    folds); mirrors the fake-quant serving path's math."""
    rng = qrange(8, True)

    def body(c, _):
        wi = packing.unpack_weight(packed, 8, rng, c.shape[-1])
        wd = ((wi.astype(jnp.float32) - zero.reshape(-1, 1))
              * scale.reshape(-1, 1)).astype(jnp.bfloat16)
        y = jax.lax.dot_general(c.astype(jnp.bfloat16), wd,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        w = min(c.shape[-1], y.shape[-1])
        return c.at[:, :w].add(y[:, :w].astype(c.dtype) * 1e-6), y[0, 0]

    _, ys = jax.lax.scan(body, x, None, length=n_iters)
    return ys


def int8_chain(lin):
    @jax.jit
    def run(x, packed, scale, zero):
        l2 = lin.replace(packed=packed, w_scale=scale, w_zero=zero)

        def body(c, _):
            y = w8a8_matmul(c, l2)
            w = min(c.shape[-1], y.shape[-1])
            return c.at[:, :w].add(y[:, :w].astype(c.dtype) * 1e-6), y[0, 0]

        _, ys = jax.lax.scan(body, x, None, length=ITERS)
        return ys

    return run


def pull(y):
    return float(np.asarray(y).reshape(-1)[-1])


key = jax.random.PRNGKey(0)
for name, out_f, in_f in SHAPES:
    key, k1, k2 = jax.random.split(key, 3)
    lin = mk_lin(k1, out_f, in_f)
    assert supports_native_int8(lin.spec)
    run_i8 = int8_chain(lin)
    for M in MS:
        x = jax.random.normal(k2, (M, in_f), jnp.float32)
        args = (x, lin.packed, lin.w_scale, lin.w_zero)
        pull(f32_dequant_chain(*args))
        t0 = time.perf_counter()
        pull(f32_dequant_chain(*args))
        t_f32 = (time.perf_counter() - t0) / ITERS * 1e3
        pull(run_i8(*args))
        t0 = time.perf_counter()
        pull(run_i8(*args))
        t_i8 = (time.perf_counter() - t0) / ITERS * 1e3
        print(json.dumps({
            "shape": f"{name} {in_f}->{out_f}", "M": M,
            "f32_dequant_ms": round(t_f32, 3),
            "int8_dot_ms": round(t_i8, 3),
            "int8_speedup": round(t_f32 / t_i8, 3),
        }), flush=True)
