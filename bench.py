#!/usr/bin/env python
"""Headline benchmark: int4 (GPTQ-layout W4A16) Llama-2-7B decode tokens/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = fraction of the HBM-bandwidth roofline ("speed of light": one
full read of the packed weights per decoded token at ~819 GB/s on v5e).

Weights are generated and quantized layer-by-layer *on device* (host<->device
transfers over this environment's TPU tunnel are slow and would dominate), and
the decode loop runs as a single on-device lax.scan.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # honor the documented CPU-smoke fallback: the env var alone is too late
    # here (sitecustomize imports jax with the axon TPU backend at interpreter
    # start), so force the platform through jax.config like tests/conftest.py
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def build_quantized_llama_on_device(cfg, bits=4, groupsize=128, dtype=jnp.bfloat16):
    from functools import partial

    from mi_optimize_tpu.core import packing, qparams
    from mi_optimize_tpu.core.qparams import qrange
    from mi_optimize_tpu.models.quant_linear import QuantSpec, QuantizedLinear

    rng = qrange(bits, True)
    spec = QuantSpec(wbit=bits, w_qtype="per_group", w_groupsize=groupsize, w_packed=True)

    @partial(jax.jit, static_argnames=("out_f", "in_f"))
    def make_packed(key, out_f, in_f):
        w = jax.random.normal(key, (out_f, in_f), jnp.float32) * (in_f ** -0.5)
        fake, scale, zero = qparams.quantize_dequantize(w, bits, "per_group", groupsize)
        ints = qparams.quantize_to_int(fake, scale, zero, bits, "per_group", groupsize)
        return packing.pack_weight_device(ints, bits, rng), scale, zero

    key = jax.random.PRNGKey(0)
    h, q_dim = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim

    def lin(key, out_f, in_f):
        packed, scale, zero = make_packed(key, out_f, in_f)
        return QuantizedLinear(spec=spec, out_features=out_f, in_features=in_f,
                               packed=packed, w_scale=scale, w_zero=zero)

    layers = []
    for i in range(cfg.num_layers):
        key, *ks = jax.random.split(key, 8)
        layers.append({
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
            "q_proj": lin(ks[0], q_dim, h),
            "k_proj": lin(ks[1], kv_dim, h),
            "v_proj": lin(ks[2], kv_dim, h),
            "o_proj": lin(ks[3], h, q_dim),
            "gate_proj": lin(ks[4], cfg.intermediate_size, h),
            "up_proj": lin(ks[5], cfg.intermediate_size, h),
            "down_proj": lin(ks[6], h, cfg.intermediate_size),
        })
    key, k1, k2 = jax.random.split(key, 3)
    params = {
        "embed": (jax.random.normal(k1, (cfg.vocab_size, h), dtype) * 0.02),
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": lin(k2, cfg.vocab_size, h),
    }
    return params


def main():
    from mi_optimize_tpu.models.llama import LlamaConfig
    from mi_optimize_tpu.models.model import Model
    from mi_optimize_tpu.serving import decode_loop, init_cache, prefill

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        cfg = LlamaConfig.llama2_7b()
        # n_decode=128 (r5; was 32): each timed pass is ONE dispatch, and
        # this tunnel's dispatch+pull round trip measured ~23-24 ms (scale-N
        # fit, BENCH_DETAILS r5) — at 32 tokens that inflated the recorded
        # step by 0.75 ms/token (6.45 vs the 5.60 ms device-true). A 128-
        # token window amortizes the artifact to <0.2 ms/token and is the
        # realistic serving regime (requests decode hundreds of tokens
        # without host sync). Device-true rate is ALSO reported (two-point
        # fit vs a short window) in the kernels record.
        prompt_len, n_decode = 128, 128
        groupsize = 128
    else:  # CPU smoke fallback keeps the harness runnable anywhere
        cfg = LlamaConfig.tiny(hidden_size=128, intermediate_size=256, head_dim=32)
        prompt_len, n_decode = 16, 8
        groupsize = 32

    from mi_optimize_tpu.serving import fuse_for_serving

    params = build_quantized_llama_on_device(cfg, groupsize=groupsize)
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    params = model.params

    batch = 1
    # cache length: multiple of 128 engages the megakernel's time-blocked
    # flash-attention phase (ops/block_fused.py)
    total = -(-(prompt_len + n_decode + 4) // 128) * 128
    cache = init_cache(cfg, batch, total, jnp.int8)  # quantized KV cache
    key = jax.random.PRNGKey(1)
    ids = jax.random.randint(key, (batch, prompt_len), 0, cfg.vocab_size)

    logits, cache = prefill(params, cfg, ids, cache, True)
    tok = jnp.argmax(logits, -1)[:, None]
    pos0 = jnp.asarray(prompt_len)

    # whole-model decode kernel (ONE pallas launch per token) when the model
    # satisfies its contract; per-layer megakernel loop otherwise
    from mi_optimize_tpu.serving.megadecode import (
        decode_loop_model, stack_cache, stack_serving)

    from mi_optimize_tpu.serving.flatdecode import (
        decode_loop_flat, stack_cache_flat, stack_flat)

    st = stack_serving(model) if on_tpu else None
    fl = stack_flat(model, st) if st is not None else None
    if fl is not None:
        # round 4: FLAT megakernel — lm_head + argmax fused in-kernel
        fstack, fmeta = fl
        fcache = stack_cache_flat(cache)
        run = lambda: decode_loop_flat(params, fstack, fmeta, cfg, tok,
                                       fcache, pos0, n_decode)[0]
    elif st is not None:
        stack, meta = st
        scache = stack_cache(cache)
        run = lambda: decode_loop_model(params, stack, meta, cfg, tok, scache,
                                        pos0, n_decode)[0]
    else:
        run = lambda: decode_loop(params, cfg, tok, cache, pos0, n_decode, True)[0]

    # compile + warm (scalar pull: on the remote-tunnel runtime block_until_ready
    # has been observed to return before completion for large programs)
    toks = run()
    _ = int(toks[0, -1])
    # best-of-3: the remote relay's dispatch gaps are bursty (a congested
    # window can inflate one timed pass 25%+); the min is the real step cost
    dt = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        toks = run()
        _ = int(toks[0, -1])
        dt = min(dt, time.perf_counter() - t0)
    toks_per_s = n_decode * batch / dt

    # device-true decomposition (r5): a second, SHORT decode window gives a
    # two-point fit total(N) = rtt + N * device_ms — separating the
    # tunnel's per-dispatch round trip from the per-token device cost.
    # One extra compile; MI_BENCH_RTT=0 skips.
    rtt_ms = dev_ms = None
    if on_tpu and fl is not None and os.environ.get("MI_BENCH_RTT", "1") != "0":
        try:
            n_short = 16
            run_s = lambda: decode_loop_flat(params, fstack, fmeta, cfg, tok,
                                             fcache, pos0, n_short)[0]
            ts = run_s()
            _ = int(ts[0, -1])
            dts = float("inf")
            for _rep in range(3):
                t0 = time.perf_counter()
                ts = run_s()
                _ = int(ts[0, -1])
                dts = min(dts, time.perf_counter() - t0)
            dev_ms = (dt - dts) * 1e3 / (n_decode - n_short)
            rtt_ms = dts * 1e3 - n_short * dev_ms
        except Exception:
            pass

    # roofline: one full packed-weight read per token
    wbytes = 0
    for leaf in jax.tree.leaves(params):
        wbytes += leaf.size * leaf.dtype.itemsize
    bw = 819e9 if on_tpu else 50e9
    sol_tokens_per_s = bw / wbytes

    record = {
        "metric": "llama2_7b_int4_decode_tokens_per_s_per_chip" if on_tpu
                  else "tiny_int4_decode_tokens_per_s (cpu fallback)",
        "value": round(toks_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_s / sol_tokens_per_s, 4),
    }
    if dev_ms is not None:
        record["dispatch_rtt_ms"] = round(rtt_ms, 1)
        record["device_ms_per_token"] = round(dev_ms, 3)
        record["device_true_tokens_per_s"] = round(1e3 / dev_ms, 1)

    # per-kernel roofline accounting (machine-recorded; VERDICT r2 item 9) —
    # one extra compile (~60s on the relay); MI_BENCH_KERNELS=0 skips it.
    # Best-effort: the headline line must print even if the breakdown's
    # extra compile fails or the relay stalls on it.
    if st is not None and os.environ.get("MI_BENCH_KERNELS", "1") != "0":
        try:
            from mi_optimize_tpu.eval.latency import kernel_breakdown

            kb = kernel_breakdown(
                model, tok, pos0, None if fl is not None else scache,
                dt / n_decode, n=n_decode, stack_meta=st,
                flat_meta=fl, flat_cache=fcache if fl is not None else None)
        except Exception as e:
            kb = None
            print(f"# kernel breakdown skipped: {e!r}", flush=True)
        if kb is not None:
            record["kernels"] = kb
            from mi_optimize_tpu.utils.observability import RunManifest

            man = RunManifest("bench_decode")
            man.metric("tokens_per_s_per_chip", record["value"])
            man.metric("vs_baseline", record["vs_baseline"])
            man.metric("kernels", kb)
            man.save(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "BENCH_MANIFEST.json"))

    print(json.dumps(record))


if __name__ == "__main__":
    main()
