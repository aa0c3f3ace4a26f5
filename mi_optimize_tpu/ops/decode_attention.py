"""Fused decode attention: rope + KV-cache append + attention in one kernel.

Decode on TPU is launch-count-bound (BENCH_DETAILS.md: ~50µs/op floor on the
round-1 runtime): the stock path spends ~8 small XLA ops per layer on rope,
cache scatter, cache dequant, scores, softmax and the PV product. This Pallas
kernel performs all of them in one invocation over VMEM-resident state:

    q,k,v rows -> rope -> per-head int8-quantize k,v -> in-place cache append
    (input_output_aliases) -> dequant full cache -> masked scores -> softmax
    -> attention output

Scope (decode fast path; everything else falls back to the XLA path):
single-token step (S=1), batch=1, int8 quantized cache, full rotary
(split-half convention). The cache layout is [T, H, D] with D=128 lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rope_rows(x, cos, sin):
    """x [H, D]; cos/sin [1, D] split-half tables."""
    D = x.shape[-1]
    half = D // 2
    x1 = x[:, :half]
    x2 = x[:, half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def _kernel(pos_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref,
            ck_ref, cv_ref, ks_ref, vs_ref,
            out_ref, ck_out, cv_out, ks_out, vs_out,
            *, n_heads, n_kv_heads, head_dim, max_len, scale):
    pos = pos_ref[0]
    cos = cos_ref[:].astype(jnp.float32)
    sin = sin_ref[:].astype(jnp.float32)

    q = _rope_rows(q_ref[:].astype(jnp.float32).reshape(n_heads, head_dim), cos, sin)
    k = _rope_rows(k_ref[:].astype(jnp.float32).reshape(n_kv_heads, head_dim), cos, sin)
    v = v_ref[:].astype(jnp.float32).reshape(n_kv_heads, head_dim)

    # per-head int8 quantization of the new k/v row
    k_amax = jnp.clip(jnp.abs(k).max(axis=-1, keepdims=True), 1e-8, None)
    v_amax = jnp.clip(jnp.abs(v).max(axis=-1, keepdims=True), 1e-8, None)
    k_s = k_amax / 127.0
    v_s = v_amax / 127.0
    k_q = jnp.clip(jnp.round(k / k_s), -127, 127).astype(jnp.int8)
    v_q = jnp.clip(jnp.round(v / v_s), -127, 127).astype(jnp.int8)

    # in-place cache append (refs are aliased inputs)
    ck_out[pl.ds(pos, 1)] = k_q[None]
    cv_out[pl.ds(pos, 1)] = v_q[None]
    ks_out[pl.ds(pos, 1)] = k_s.reshape(1, -1)
    vs_out[pl.ds(pos, 1)] = v_s.reshape(1, -1)

    # dequantized history
    k_all = ck_out[:].astype(jnp.float32) * ks_out[:][..., None]  # [T,Hkv,D]
    v_all = cv_out[:].astype(jnp.float32) * vs_out[:][..., None]

    reps = n_heads // n_kv_heads
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    mask = t_ids <= pos  # [1, T]

    # per-kv-head dot pairs (statically unrolled) measured faster on-chip than
    # the broadcast-mul-reduce VPU formulation (270 vs 379 µs/step)
    qg = q.reshape(n_kv_heads, reps, head_dim)
    outs = []
    for hk in range(n_kv_heads):
        kh = k_all[:, hk, :]  # [T, D]
        vh = v_all[:, hk, :]
        s = jax.lax.dot_general(qg[hk], kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)  # [reps, T]
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / e.sum(axis=-1, keepdims=True)
        o = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [reps, D]
        outs.append(o)
    out = jnp.concatenate(outs, axis=0)

    out_ref[:] = out.reshape(1, n_heads * head_dim)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "head_dim", "max_len", "interpret"),
)
def fused_decode_attention(q, k, v, cos, sin, cache_k, cache_v, k_scale, v_scale,
                           pos, *, n_heads, n_kv_heads, head_dim, max_len,
                           interpret=False):
    """q [1, Hq*D], k/v [1, Hkv*D], cache_k/v int8 [T,Hkv,D], scales [T,Hkv].

    Returns (attn_out [1, Hq*D], cache_k, cache_v, k_scale, v_scale) with the
    caches updated in place (aliased).
    """
    scale = 1.0 / float(np.sqrt(head_dim))
    kern = functools.partial(
        _kernel, n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        max_len=max_len, scale=scale,
    )
    pos_arr = jnp.reshape(pos, (1,)).astype(jnp.int32)
    out, ck, cv, ks, vs = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_heads * head_dim), jnp.float32),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        input_output_aliases={6: 1, 7: 2, 8: 3, 9: 4},
        interpret=interpret,
    )(pos_arr, q, k, v, cos, sin, cache_k, cache_v, k_scale, v_scale)
    return out, ck, cv, ks, vs
