"""Continuous batching: slot-based scheduler over a shared KV cache.

North-star scope (BASELINE.json: "continuous batching across hosts") — absent
from the reference, whose inference is single-request model.generate. Design:

  * the cache holds `n_slots` independent sequences; each slot has its own
    position counter, so sequences of different lengths decode together
  * one jitted multi-slot decode step: tokens [B,1] + positions [B] ->
    per-slot causal masks [B,1,1,T] and per-slot cache writes (vmapped
    dynamic_update_slice in block_apply)
  * prefill runs per request (batch-1 jit, bucketed lengths) and its KV slab
    is scattered into the slot — new requests join between decode steps
    without recompiling or disturbing running slots

All shapes are static (slots, max_len), so the decode step compiles once —
the compiled-program discipline continuous batching needs on TPU.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.model import Model
from .engine import init_cache


@partial(jax.jit, static_argnames=("cfg", "fused"))
def decode_step_multi(params, cfg, tokens, cache, positions, fused=True):
    """tokens [B,1], positions [B] (per-slot) -> (logits [B,V], cache)."""
    from .engine import _cache_len

    max_len = _cache_len(cache)
    x = llama.embed(params, tokens)
    cos, sin = llama.rope_tables(cfg, positions[:, None])  # [B,1,rd]
    mask = (jnp.arange(max_len)[None, :] <= positions[:, None])[:, None, None, :]
    new_cache = []
    for blk, kv in zip(params["layers"], cache):
        x, kv, _ = llama.block_apply(
            blk, x, cos, sin, mask, cfg, kv_cache=kv, cache_index=positions,
            fused=fused,
        )
        new_cache.append(kv)
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, x, fused=fused)[:, 0]
    return logits, new_cache


@partial(jax.jit, static_argnames=("cfg", "fused"))
def _prefill_kv(params, cfg, input_ids, fused=True):
    """Run the prompt without a cache; return (last logits, per-layer (k,v))."""
    B, S = input_ids.shape
    x = llama.embed(params, input_ids)
    cos, sin = llama.rope_tables(cfg, jnp.arange(S))
    mask = llama.causal_mask(S)
    kvs = []
    for blk in params["layers"]:
        # capture=False, no cache: block returns no kv — recompute k/v instead
        # by running with a local full-length cache
        kv = (
            jnp.zeros((B, S, cfg.num_kv_heads, cfg.head_dim), jnp.float32),
            jnp.zeros((B, S, cfg.num_kv_heads, cfg.head_dim), jnp.float32),
        )
        x, kv, _ = llama.block_apply(blk, x, cos, sin, mask, cfg, kv_cache=kv,
                                     cache_index=jnp.asarray(0), fused=fused)
        kvs.append(kv)
    x = llama.rms_norm(x[:, -1:], params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, x, fused=fused)[:, 0]
    return logits, kvs


@dataclass
class Request:
    rid: int
    prompt: np.ndarray           # [S] token ids
    max_new_tokens: int = 32
    eos_token_id: Optional[int] = None
    tokens: List[int] = field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """Static-shape slot scheduler; join/leave between decode steps."""

    def __init__(self, model: Model, n_slots: int = 4, max_len: int = 512,
                 fused: bool = True):
        self.model = model
        self.cfg = model.config
        self.n_slots = n_slots
        self.max_len = min(max_len, self.cfg.max_seq_len)
        self.fused = fused
        self.cache = init_cache(self.cfg, n_slots, self.max_len, jnp.float32)
        self.positions = np.zeros(n_slots, np.int64)  # next write index per slot
        self.last_token = np.zeros(n_slots, np.int64)
        self.slot_req: List[Optional[Request]] = [None] * n_slots
        self._next_rid = 0

    # ------------------------------------------------------------------
    def add_request(self, prompt, max_new_tokens=32, eos_token_id=None) -> Optional[int]:
        """Prefill into a free slot; returns request id or None if full."""
        try:
            slot = self.slot_req.index(None)
        except ValueError:
            return None
        prompt = np.asarray(prompt).reshape(-1)[-(self.max_len - max_new_tokens - 1):]
        req = Request(self._next_rid, prompt, max_new_tokens, eos_token_id)
        self._next_rid += 1

        logits, kvs = _prefill_kv(self.model.params, self.cfg,
                                  jnp.asarray(prompt[None, :]), self.fused)
        S = len(prompt)
        # scatter the prompt KV slab into this slot
        new_cache = []
        for (ck, cv), (pk, pv) in zip(self.cache, kvs):
            ck = jax.lax.dynamic_update_slice(
                ck, pk.astype(ck.dtype), (slot, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, pv.astype(cv.dtype), (slot, 0, 0, 0))
            new_cache.append((ck, cv))
        self.cache = new_cache
        tok = int(np.argmax(np.asarray(logits[0])))
        req.tokens.append(tok)
        self.positions[slot] = S
        self.last_token[slot] = tok
        self.slot_req[slot] = req
        return req.rid

    def step(self) -> Dict[int, int]:
        """One decode step for all active slots; returns {rid: new_token}."""
        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return {}
        logits, self.cache = decode_step_multi(
            self.model.params, self.cfg,
            jnp.asarray(self.last_token[:, None]), self.cache,
            jnp.asarray(self.positions), self.fused,
        )
        toks = np.argmax(np.asarray(logits), axis=-1)
        out = {}
        for i in active:
            req = self.slot_req[i]
            tok = int(toks[i])
            req.tokens.append(tok)
            out[req.rid] = tok
            self.positions[i] += 1
            self.last_token[i] = tok
            hit_eos = req.eos_token_id is not None and tok == req.eos_token_id
            if len(req.tokens) >= req.max_new_tokens or hit_eos \
                    or self.positions[i] >= self.max_len - 1:
                req.done = True
                self.slot_req[i] = None  # slot freed; a new request can join
        return out

    def run_all(self, prompts, max_new_tokens=16) -> Dict[int, List[int]]:
        """Convenience driver: feed prompts through the scheduler to completion."""
        pending = list(prompts)
        results: Dict[int, List[int]] = {}
        reqs: List[Request] = []
        while pending or any(r is not None for r in self.slot_req):
            while pending:
                rid = self.add_request(pending[0], max_new_tokens)
                if rid is None:
                    break
                reqs.append([r for r in self.slot_req if r and r.rid == rid][0])
                pending.pop(0)
            self.step()
            for r in reqs:
                if r.done:
                    results[r.rid] = r.tokens
        for r in reqs:
            results[r.rid] = r.tokens
        return results
