#!/usr/bin/env python
"""On-chip check: 7B int4 decode with a FULL 2048-slot int8 KV cache.

The v1 megakernel held the whole cache as one VMEM block and could not
compile beyond ~T=400 (16MB scoped-vmem); the v2 time-blocked flash phase
streams [128, Hkv, D] blocks and must compile and decode at T=2048, with
dead blocks skipped via the scalar-prefetch live-prefix clamp.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import build_quantized_llama_on_device
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import decode_loop, fuse_for_serving, init_cache, prefill

cfg = LlamaConfig.llama2_7b()
params = fuse_for_serving(Model(config=cfg,
                                params=build_quantized_llama_on_device(cfg),
                                family="llama")).params

cache = init_cache(cfg, 1, 2048, jnp.int8)
ids = jax.random.randint(jax.random.PRNGKey(1), (1, 128), 0, cfg.vocab_size)
logits, cache = prefill(params, cfg, ids, cache, True)
tok = jnp.argmax(logits, -1)[:, None]

n = 16
toks, cache2 = decode_loop(params, cfg, tok, cache, jnp.asarray(128), n, True)
_ = int(toks[0, -1])
t0 = time.perf_counter()
toks, _ = decode_loop(params, cfg, tok, cache, jnp.asarray(128), n, True)
_ = int(toks[0, -1])
dt = time.perf_counter() - t0
print(f"T=2048 decode OK: {n/dt:.1f} tok/s at pos~128 (live-prefix clamp active)")

# decode near the END of the cache (every history block live)
cache3 = init_cache(cfg, 1, 2048, jnp.int8)
logits, cache3 = prefill(params, cfg, ids, cache3, True)
toks, cache3 = decode_loop(params, cfg, tok, cache3, jnp.asarray(1950), n, True)
_ = int(toks[0, -1])
t0 = time.perf_counter()
toks, _ = decode_loop(params, cfg, tok, cache3, jnp.asarray(1950), n, True)
_ = int(toks[0, -1])
dt = time.perf_counter() - t0
print(f"T=2048 decode OK: {n/dt:.1f} tok/s at pos~1950 (16 live blocks/layer)")
