"""Serving path: jit-compiled KV-cached prefill + single-token decode.

This fills the role of the reference's HF `model.generate` inference
(/root/reference/mi_optimize/examples/inference.py) and of the external
fastllm C++ engine the reference exports to (.flm) — here the native engine IS
the JAX/XLA program: packed weights resident in HBM behind the fused Pallas
dequant-matmul, static-shape KV cache, one compiled prefill and one compiled
decode-step function.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.model import Model


def _cache_len(cache) -> int:
    c0 = cache[0]
    return (c0["k"] if isinstance(c0, dict) else c0[0]).shape[1]


def init_cache(cfg, batch: int, max_len: int, dtype=jnp.bfloat16):
    """KV cache, one entry per layer.

    dtype jnp.int8 selects the quantized cache (int8 values + per-token/head
    f32 scales — half the HBM traffic of bf16); any float dtype gives the
    plain cache.
    """
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if dtype == jnp.int8:
        return [
            {
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(shape[:3], jnp.float32),
                "v_scale": jnp.zeros(shape[:3], jnp.float32),
            }
            for _ in range(cfg.num_layers)
        ]
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.num_layers)
    ]


@partial(jax.jit, static_argnames=("cfg", "fused"))
def prefill(params, cfg, input_ids, cache, fused=True):
    """Process the prompt; returns (last-token logits [B,V], filled cache)."""
    B, S = input_ids.shape
    max_len = _cache_len(cache)
    x = llama.embed(params, input_ids)
    cos, sin = llama.rope_tables(cfg, jnp.arange(S))
    mask = jnp.arange(max_len)[None, :] <= jnp.arange(S)[:, None]  # [S, T]
    new_cache = []
    for blk, kv in zip(params["layers"], cache):
        x, kv, _ = llama.block_apply(
            blk, x, cos, sin, mask, cfg, kv_cache=kv, cache_index=0, fused=fused
        )
        new_cache.append(kv)
    x = llama.rms_norm(x[:, -1:], params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, x, fused=fused)[:, 0]
    return logits, new_cache


@partial(jax.jit, static_argnames=("cfg", "fused"))
def prefill_chunk(params, cfg, input_ids, cache, pos0, fused=True):
    """Process a chunk of C tokens starting at absolute position `pos0`
    (cached context before pos0 is attended); returns (logits [B,C,V], cache).

    This is the verify primitive for speculative decoding and the building
    block for chunked (paged) prefill: unlike `prefill` it scores EVERY chunk
    position, and unlike `decode_step` it ingests C tokens in one call."""
    B, C = input_ids.shape
    max_len = _cache_len(cache)
    x = llama.embed(params, input_ids)
    positions = pos0 + jnp.arange(C)
    cos, sin = llama.rope_tables(cfg, positions)
    mask = jnp.arange(max_len)[None, :] <= positions[:, None]  # [C, T]
    new_cache = []
    for blk, kv in zip(params["layers"], cache):
        x, kv, _ = llama.block_apply(
            blk, x, cos, sin, mask, cfg, kv_cache=kv, cache_index=pos0,
            fused=fused
        )
        new_cache.append(kv)
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    return llama.unembed(params, cfg, x, fused=fused), new_cache


@partial(jax.jit, static_argnames=("cfg", "fused"))
def prefill_chunk_batched(params, cfg, input_ids, cache, positions, fused=True):
    """B-slot chunk ingest/verify: input_ids [B, C] with PER-SLOT absolute
    start positions [B] — slot b's chunk covers positions[b]..positions[b]+C-1
    against its own cached prefix. Returns (logits [B, C, V], cache).

    The batched verify primitive for speculative decoding under continuous
    batching (round 3, VERDICT item 4): one weight stream scores B chunks.
    Token-exact vs per-slot `prefill_chunk` (tests/test_spec_batched.py)."""
    B, C = input_ids.shape
    max_len = _cache_len(cache)
    x = llama.embed(params, input_ids)
    posm = positions[:, None] + jnp.arange(C)[None, :]           # [B, C]
    cos, sin = llama.rope_tables(cfg, posm)                       # [B, C, rd]
    mask = (jnp.arange(max_len)[None, None, None, :]
            <= posm[:, None, :, None])                            # [B,1,C,T]
    new_cache = []
    for blk, kv in zip(params["layers"], cache):
        x, kv, _ = llama.block_apply(
            blk, x, cos, sin, mask, cfg, kv_cache=kv, cache_index=positions,
            fused=fused)
        new_cache.append(kv)
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    return llama.unembed(params, cfg, x, fused=fused), new_cache


def _decode_core(params, cfg, token, cache, pos, fused=True):
    """One autoregressive step. token [B,1], pos scalar; returns (logits, cache)."""
    max_len = _cache_len(cache)
    x = llama.embed(params, token)
    cos, sin = llama.rope_tables(cfg, pos[None])
    mask = (jnp.arange(max_len)[None, :] <= pos)[None, :]  # [1, T] -> bcast [S=1,T]
    new_cache = []
    for blk, kv in zip(params["layers"], cache):
        x, kv, _ = llama.block_apply(
            blk, x, cos, sin, mask, cfg, kv_cache=kv, cache_index=pos, fused=fused
        )
        new_cache.append(kv)
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, x, fused=fused)[:, 0]
    return logits, new_cache


@partial(jax.jit, static_argnames=("cfg", "fused"))
def decode_step(params, cfg, token, cache, pos, fused=True):
    return _decode_core(params, cfg, token, cache, pos, fused)


@partial(jax.jit, static_argnames=("cfg", "n", "fused"))
def decode_loop(params, cfg, token, cache, pos0, n, fused=True):
    """Greedy-decode `n` tokens entirely on device (one dispatch).

    lax.scan keeps the autoregressive loop inside the compiled program —
    essential when host<->device dispatch latency is non-trivial, and the shape
    the multi-host serving path uses (no per-token host round-trips).
    """
    def step(carry, _):
        tok, cache, pos = carry
        logits, cache = _decode_core(params, cfg, tok, cache, pos, fused)
        nt = jnp.argmax(logits, -1).astype(tok.dtype)[:, None]
        return (nt, cache, pos + 1), nt[:, 0]

    (tok, cache, pos), toks = jax.lax.scan(step, (token, cache, pos0), None, length=n)
    return jnp.swapaxes(toks, 0, 1), cache


def _sample(logits, temperature, key, top_p=1.0, top_k=0):
    """Greedy (temperature 0) or temperature sampling with optional
    nucleus (top_p) / top_k truncation — the sampler surface the reference
    reaches through HF generate (temperature/top_p kwargs,
    /root/reference/mi_optimize/benchmark.py:97,145). jit-safe: static
    truncation thresholds, sorted-mass masking."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        # exclusive cumulative mass: keep every token whose predecessors'
        # mass is < top_p (always keeps the most likely token)
        cum = jnp.cumsum(probs, axis=-1) - probs
        # always keep the most likely token (top_p <= 0 degrades to greedy
        # rather than an all--inf degenerate row)
        keep = (cum < top_p).at[..., 0].set(True)
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                         keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate(
    model: Model,
    input_ids: np.ndarray,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    eos_token_id: Optional[int] = None,
    max_len: Optional[int] = None,
    seed: int = 0,
    fused: bool = True,
    cache_dtype=jnp.float32,
    top_p: float = 1.0,
    top_k: int = 0,
) -> np.ndarray:
    """Greedy/temperature/top-p/top-k generation; returns [B, prompt+new]."""
    cfg, params = model.config, model.params
    input_ids = np.asarray(input_ids)
    B, S = input_ids.shape
    total = max_len or min(cfg.max_seq_len, S + max_new_tokens)
    if total % 128 and total + (-total) % 128 <= cfg.max_seq_len:
        # round the cache up to a multiple of 128: engages the decode
        # megakernel's time-blocked flash attention (ops/block_fused.py)
        total += (-total) % 128
    cache = init_cache(cfg, B, total, cache_dtype)
    logits, cache = prefill(params, cfg, jnp.asarray(input_ids), cache, fused)
    key = jax.random.PRNGKey(seed)
    out = [input_ids]
    tok = None
    for i in range(max_new_tokens):
        key, sub = jax.random.split(key)
        tok = _sample(logits, temperature, sub, top_p, top_k)
        out.append(np.asarray(tok)[:, None])
        if eos_token_id is not None and bool((tok == eos_token_id).all()):
            break
        pos = jnp.asarray(S + i)
        logits, cache = decode_step(params, cfg, tok[:, None], cache, pos, fused)
    return np.concatenate(out, axis=1)
