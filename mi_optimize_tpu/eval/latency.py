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
    return {
        "tokens_per_s_per_chip": toks_per_s,
        "step_ms": step_s * 1e3,
        "weight_bytes": wbytes,
        "sol_step_ms": sol_step_s * 1e3,
        "roofline_frac": sol_step_s / step_s,
    }
