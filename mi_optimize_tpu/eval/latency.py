"""Latency / throughput benchmark harness.

Parity target: /root/reference/benchmark/benchmark_latency.py (warmup 10 +
30 timed iters, avg + p10/25/50/75/90 percentiles, JSON out) — extended with
the TPU-native metrics the north star demands (BASELINE.md): decode tokens/s
per chip and roofline comparison derived from HBM traffic of the packed
weights (decode is bandwidth-bound; speed-of-light = weight-bytes / HBM BW).
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import Model
from ..serving import decode_loop, init_cache, prefill

# v5e HBM bandwidth (bytes/s), public spec: ~819 GB/s
HBM_BYTES_PER_S = {"TPU v5 lite": 819e9, "cpu": 50e9}


def _percentiles(times):
    t = np.asarray(times) * 1000.0
    return {
        "avg_ms": float(t.mean()),
        **{f"p{p}_ms": float(np.percentile(t, p)) for p in (10, 25, 50, 75, 90)},
    }


def forward_latency(model: Model, batch=1, seqlen=128, warmup=10, iters=30,
                    fused=True) -> Dict:
    """Reference-style full-forward latency (benchmark_latency.py:38-51)."""
    from ..models import llama

    ids = jnp.asarray(np.random.default_rng(0).integers(0, model.config.vocab_size,
                                                        (batch, seqlen)))
    fwd = jax.jit(lambda p, i: llama.forward(p, model.config, i, fused=fused))
    fwd(model.params, ids).block_until_ready()
    for _ in range(warmup - 1):
        fwd(model.params, ids)
    out = fwd(model.params, ids)
    out.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fwd(model.params, ids).block_until_ready()
        times.append(time.perf_counter() - t0)
    return {"batch": batch, "seqlen": seqlen, **_percentiles(times)}


def model_weight_bytes(model: Model) -> int:
    """Bytes of weight data the decode step must stream from HBM."""
    total = 0
    for leaf in jax.tree.leaves(model.params):
        total += leaf.size * leaf.dtype.itemsize
    return total


def decode_throughput(model: Model, batch=1, prompt_len=128, decode_tokens=64,
                      warmup=8, fused=True, cache_dtype=jnp.bfloat16) -> Dict:
    """Decode tokens/s/chip + roofline fraction."""
    cfg = model.config
    total = prompt_len + decode_tokens + warmup + 1
    cache = init_cache(cfg, batch, total, cache_dtype)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size,
                                                        (batch, prompt_len)))
    logits, cache = prefill(model.params, cfg, ids, cache, fused)
    tok = jnp.argmax(logits, -1)[:, None]
    pos0 = jnp.asarray(prompt_len)
    # warm/compile, then time one on-device decode loop (scalar pull forces
    # completion — block_until_ready is unreliable on tunneled runtimes)
    toks, _ = decode_loop(model.params, cfg, tok, cache, pos0, decode_tokens, fused)
    _ = int(toks[0, -1])
    t0 = time.perf_counter()
    toks, _ = decode_loop(model.params, cfg, tok, cache, pos0, decode_tokens, fused)
    _ = int(toks[0, -1])
    dt = time.perf_counter() - t0
    toks_per_s = decode_tokens * batch / dt
    step_s = dt / decode_tokens

    wbytes = model_weight_bytes(model)
    dev = jax.devices()[0]
    bw = next((v for k, v in HBM_BYTES_PER_S.items() if k in str(dev)), 819e9)
    sol_step_s = wbytes / bw  # speed of light: one full weight read per token
    out = {
        "tokens_per_s_per_chip": toks_per_s,
        "step_ms": step_s * 1e3,
        "weight_bytes": wbytes,
        "sol_step_ms": sol_step_s * 1e3,
        "roofline_frac": sol_step_s / step_s,
    }
    if fused and jax.devices()[0].platform != "cpu" and batch == 1 \
            and cache_dtype == jnp.int8:
        # the loop above timed the PER-LAYER path; the breakdown's glue/
        # pct_of_step must be computed against the megakernel serving path's
        # own step time (r3 code review: passing step_s here misattributed
        # the per-layer-vs-megakernel gap as lm_head glue)
        from ..serving.megadecode import (
            decode_loop_model, stack_cache, stack_serving)

        st = stack_serving(model)
        if st is not None:
            stack, meta = st
            scache = stack_cache(cache)

            def mega_loop():
                toks, _c = decode_loop_model(model.params, stack, meta, cfg,
                                             tok, scache, pos0, decode_tokens)
                _ = int(np.asarray(toks).reshape(-1)[-1])

            mega_loop()
            t0 = time.perf_counter()
            mega_loop()
            mega_step_s = (time.perf_counter() - t0) / decode_tokens
            out["megakernel_path"] = {
                "tokens_per_s_per_chip": 1.0 / mega_step_s,
                "step_ms": mega_step_s * 1e3,
                "roofline_frac": sol_step_s / mega_step_s,
            }
            kb = kernel_breakdown(model, tok, pos0, scache, mega_step_s,
                                  n=decode_tokens, stack_meta=st)
            if kb is not None:
                out["kernels"] = kb
    return out


# measured single-kernel streaming ceiling of this environment's relay-attached
# v5e (scripts/exp_stream_ceiling.py, round 1); the megakernel's effective
# rate is reported against BOTH this and the nominal spec
STREAM_MICROBENCH_BYTES_PER_S = 361e9


def kernel_breakdown(model: Model, tok, pos0, cache_list, full_step_s,
                     n=32, stack_meta=None, flat_meta=None,
                     flat_cache=None) -> Optional[Dict]:
    """Per-kernel roofline accounting for the decode step (machine-recorded;
    VERDICT r2 item 9). Times the whole-model megakernel ALONE (an n-step
    scan; no cache scatter) and derives each kernel's bytes/token, GB/s, and
    %-of-ceiling. Returns None when the megakernel contract does not hold
    for this model.

    stack_meta: optional pre-built (stack, meta) from stack_serving — pass it
    when the caller already stacked the weights (the [L, ...] stack is ~the
    whole model's bytes; building it twice risks HBM exhaustion at 7B).

    flat_meta/flat_cache (round 4): pre-built stack_flat result + merged
    cache — times the FLAT kernel instead (lm_head + argmax in-kernel, so
    its bytes include the packed unembed and the residual glue is just the
    cache scatter + embed-row gather)."""
    from ..models import llama
    from ..serving.megadecode import stack_cache, stack_serving

    cfg = model.config
    params = model.params
    lm = model.params.get("lm_head")
    lm_bytes = (sum(l.size * l.dtype.itemsize
                    for l in jax.tree.leaves((lm.packed, lm.w_scale, lm.w_zero)))
                if lm is not None and hasattr(lm, "packed") else 0)

    if flat_meta is not None:
        from ..ops.model_flat import model_decode_flat

        stack, meta = flat_meta
        fcache = flat_cache
        max_len = fcache["kv"].shape[1]

        @jax.jit
        def mega_only(params, stack, cache, tok, pos0):
            x0 = llama.embed(params, tok)

            def step(pos, _):
                cos, sin = llama.rope_tables(cfg, pos[None])
                cossin = jnp.concatenate(
                    [cos.reshape(-1)[-cfg.head_dim:],
                     sin.reshape(-1)[-cfg.head_dim:]])
                t2, _, _, _ = model_decode_flat(stack, x0, cossin, cache,
                                                pos, cfg, meta)
                return pos + 1, t2[0, 0]

            _, xs = jax.lax.scan(step, pos0, None, length=n)
            return xs

        tb = 256 if max_len % 256 == 0 else 128
    else:
        from ..ops.model_fused import model_decode_mega

        st = stack_meta if stack_meta is not None else stack_serving(model)
        if st is None:
            return None
        stack, meta = st
        scache = (stack_cache(cache_list) if isinstance(cache_list, list)
                  else cache_list)
        max_len = scache["k"].shape[1]

        @jax.jit
        def mega_only(params, stack, cache, tok, pos0):
            x0 = llama.embed(params, tok)

            def step(carry, _):
                x, pos = carry
                cos, sin = llama.rope_tables(cfg, pos[None])
                x2, *_ = model_decode_mega(
                    stack, x, cos.reshape(-1)[-cfg.head_dim:],
                    sin.reshape(-1)[-cfg.head_dim:], cache, pos, cfg, meta)
                return (x2, pos + 1), x2[0, 0, 0]

            (_, _), xs = jax.lax.scan(step, (x0, pos0), None, length=n)
            return xs

        tb = 256 if (max_len % 256 == 0 and max_len >= 1024) else 128

    cache_arg = fcache if flat_meta is not None else scache
    xs = mega_only(params, stack, cache_arg, tok, pos0)
    _ = float(np.asarray(xs[-1]))
    t0 = time.perf_counter()
    xs = mega_only(params, stack, cache_arg, tok, pos0)
    _ = float(np.asarray(xs[-1]))
    mega_s = (time.perf_counter() - t0) / n

    stack_bytes = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(stack))
    # live KV blocks actually fetched at mid-decode position (the kernel's
    # prefix clamp skips dead blocks)
    pos_mid = int(pos0) + n // 2
    blocks = -(-pos_mid // tb)
    kv_row = cfg.num_kv_heads * (cfg.head_dim * 2 + 8)  # k+v int8, 2 f32 scales
    kv_bytes = cfg.num_layers * blocks * tb * kv_row
    mega_bytes = stack_bytes + kv_bytes

    dev = jax.devices()[0]
    bw = next((v for k, v in HBM_BYTES_PER_S.items() if k in str(dev)), 819e9)
    glue_s = max(full_step_s - mega_s, 0.0)
    gbps = mega_bytes / mega_s / 1e9
    out = {
        "nominal_hbm_gbps": bw / 1e9,
        "stream_microbench_gbps": STREAM_MICROBENCH_BYTES_PER_S / 1e9,
        "megakernel": {
            "kind": "flat(+lm_head+argmax)" if flat_meta is not None
                    else "model_fused",
            "ms_per_token": round(mega_s * 1e3, 3),
            "bytes_per_token": mega_bytes,
            "gbps": round(gbps, 1),
            "pct_of_nominal_hbm": round(100 * gbps * 1e9 / bw, 1),
            "pct_of_stream_microbench": round(
                100 * gbps * 1e9 / STREAM_MICROBENCH_BYTES_PER_S, 1),
            "pct_of_step": round(100 * mega_s / full_step_s, 1),
        },
    }
    if flat_meta is not None:
        # lm_head already inside the kernel (its bytes are in the stack);
        # remaining glue = cache-row scatter + embed gather + scan plumbing
        out["scatter_embed_glue"] = {"ms_per_token": round(glue_s * 1e3, 3)}
    else:
        out["lm_head_scatter_glue"] = {
            "ms_per_token": round(glue_s * 1e3, 3),
            "bytes_per_token": lm_bytes,
            "gbps_if_io_bound": round(lm_bytes / glue_s / 1e9, 1)
            if glue_s > 0 else None,
        }
    return out
