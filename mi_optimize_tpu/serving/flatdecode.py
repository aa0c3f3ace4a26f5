"""Serving glue for the FLAT whole-model megakernel (ops/model_flat.py):
single-stream greedy decode with the lm_head + argmax fused in-kernel.

Flow (mirrors megadecode, with the merged-cache layout the flat kernel
streams):

    model = fuse_for_serving(model)
    st = stack_serving(model); fl = stack_flat(model, st)
    cache = prefill(...) per-layer -> stack_cache_flat
    decode_loop_flat(...)          # one pallas launch per token, full stop

Falls back (stack_flat returns None) for asymmetric grids, unpacked/absent
lm_head, or shapes outside the flat contract — callers then use
megadecode.decode_loop_model.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models import llama
from ..models.model import Model


def stack_flat(model: Model, st=None):
    """(stack, meta) for the flat kernel, or None. `st` may pass a
    precomputed megadecode.stack_serving result to avoid restacking."""
    from ..ops.model_flat import stack_flat_params
    from .megadecode import stack_serving

    if st is None:
        st = stack_serving(model)
    if st is None:
        return None
    return stack_flat_params(model, st[0], st[1])


def stack_cache_flat(cache_list):
    """Per-layer engine cache (batch=1, int8) -> merged flat layout
    {"kv": [L,T,2,Hkv,D] int8, "kv_scale": [L,T,2,Hkv] f32}."""
    k = jnp.stack([c["k"][0] for c in cache_list])        # [L, T, Hkv, D]
    v = jnp.stack([c["v"][0] for c in cache_list])
    ks = jnp.stack([c["k_scale"][0] for c in cache_list])  # [L, T, Hkv]
    vs = jnp.stack([c["v_scale"][0] for c in cache_list])
    return {
        "kv": jnp.stack([k, v], axis=2),
        "kv_scale": jnp.stack([ks, vs], axis=2),
    }


def _flat_step(params, stack, meta, cfg, tok, cache, pos, interpret):
    from ..ops.model_flat import model_decode_flat

    x = llama.embed(params, tok)                           # [1, 1, h]
    cos, sin = llama.rope_tables(cfg, pos[None])
    cossin = jnp.concatenate(
        [cos.reshape(-1)[-cfg.head_dim:], sin.reshape(-1)[-cfg.head_dim:]])
    tok2, logits, kvrows, kvsc = model_decode_flat(
        stack, x, cossin, cache, pos, cfg, meta, interpret=interpret)
    kvrows, kvsc = jax.lax.optimization_barrier((kvrows, kvsc))
    cache = {
        "kv": jax.lax.dynamic_update_slice(
            cache["kv"], kvrows[:, None].astype(cache["kv"].dtype),
            (0, pos, 0, 0, 0)),
        "kv_scale": jax.lax.dynamic_update_slice(
            cache["kv_scale"], jnp.swapaxes(kvsc, 1, 2),
            (0, pos, 0, 0)),
    }
    return tok2[0, 0], logits, cache


def _flat_seg_step(params, stack, meta, cfg, tok, cache, pos, kseg,
                   interpret):
    """kseg greedy tokens in ONE launch (ops/model_flat_seg.py): embed of
    the NEXT token is gathered in-kernel, the segment's KV rows ride VMEM
    scratch, and the caller scatters all kseg cache rows at once. Returns
    (tokens [kseg] i32, cache)."""
    from ..ops.model_flat_seg import model_decode_flat_seg

    x = llama.embed(params, tok)                           # [1, 1, h]
    pos = jnp.asarray(pos)
    cos, sin = llama.rope_tables(cfg, pos + jnp.arange(kseg))
    cossin = jnp.concatenate([cos, sin], axis=-1)          # [kseg, 2D]
    emb = jnp.asarray(params["embed"])
    toks, kvrows, kvsc = model_decode_flat_seg(
        stack, emb, x, cossin, cache, pos, cfg, meta, kseg,
        interpret=interpret)
    kvrows, kvsc = jax.lax.optimization_barrier((kvrows, kvsc))
    # [kseg, L, ...] -> [L, kseg, ...]; one scatter per field for the whole
    # segment (vs kseg scatters of the per-token path)
    rows = jnp.swapaxes(kvrows, 0, 1)                      # [L,kseg,2,Hkv,D]
    scs = jnp.swapaxes(kvsc[:, :, :, 0, :], 0, 1)          # [L,kseg,2,Hkv]
    cache = {
        "kv": jax.lax.dynamic_update_slice(
            cache["kv"], rows.astype(cache["kv"].dtype), (0, pos, 0, 0, 0)),
        "kv_scale": jax.lax.dynamic_update_slice(
            cache["kv_scale"], scs, (0, pos, 0, 0)),
    }
    return toks[:, 0, 0], cache


@partial(jax.jit,
         static_argnames=("cfg", "meta", "n", "kseg", "interpret"))
def decode_loop_flat_seg(params, stack, meta, cfg, token, cache, pos0, n,
                         kseg=8, interpret=False):
    """Greedy-decode n tokens with ceil(n/kseg) multi-token launches.
    token [1,1] -> (tokens [1, ceil(n/kseg)*kseg], cache) — the caller
    keeps the first n (surplus tokens in the last segment are decoded but
    still correct: they extend the same greedy sequence)."""
    nseg = -(-n // kseg)

    def seg(carry, _):
        tok, cache, pos = carry
        toks, cache = _flat_seg_step(params, stack, meta, cfg, tok, cache,
                                     pos, kseg, interpret)
        nt = toks[kseg - 1].astype(token.dtype).reshape(1, 1)
        return (nt, cache, pos + kseg), toks

    (tok, cache, pos), toks = jax.lax.scan(seg, (token, cache, pos0), None,
                                           length=nseg)
    return toks.reshape(1, nseg * kseg), cache


@partial(jax.jit, static_argnames=("cfg", "meta", "n", "interpret"))
def decode_loop_flat(params, stack, meta, cfg, token, cache, pos0, n,
                     interpret=False):
    """Greedy-decode n tokens, ONE pallas call per token including the
    lm_head+argmax. token [1,1] -> (tokens [1,n], cache)."""

    def step(carry, _):
        tok, cache, pos = carry
        nt, _, cache = _flat_step(params, stack, meta, cfg, tok, cache, pos,
                                  interpret)
        nt2 = nt.astype(token.dtype).reshape(1, 1)
        return (nt2, cache, pos + 1), nt2[:, 0]

    (tok, cache, pos), toks = jax.lax.scan(step, (token, cache, pos0), None,
                                           length=n)
    return jnp.swapaxes(toks, 0, 1), cache
