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
    """Prompt -> (last logits, per-layer fp (k, v) slabs of prompt length).

    Used by the paged batcher, which re-scatters the slab into pages."""
    from .engine import init_cache, prefill

    B, S = input_ids.shape
    cache = init_cache(cfg, B, S, jnp.float32)
    return prefill(params, cfg, input_ids, cache, fused)


@partial(jax.jit, static_argnames=("cfg", "fused", "slot"))
def _prefill_into_slot(params, cfg, input_ids, cache, slot, fused=True):
    """Prefill a batch-1 request and scatter its KV slab into `slot` of the
    shared multi-slot cache — same dtype/structure as the slot cache (tuple
    fp or dict int8+scales), so the batcher composes with quantized KV."""
    from .engine import _cache_len, init_cache, prefill

    one = init_cache(cfg, 1, _cache_len(cache),
                     jnp.int8 if isinstance(cache[0], dict) else cache[0][0].dtype)
    logits, one = prefill(params, cfg, input_ids, one, fused)

    def scatter(buf, new):
        return jax.lax.dynamic_update_slice(
            buf, new.astype(buf.dtype), (slot,) + (0,) * (buf.ndim - 1))

    if isinstance(cache[0], dict):
        new_cache = [{f: scatter(c[f], p[f]) for f in c} for c, p in zip(cache, one)]
    else:
        new_cache = [tuple(scatter(c[i], p[i]) for i in range(2))
                     for c, p in zip(cache, one)]
    return logits, new_cache


@partial(jax.jit, static_argnames=("cfg", "slot", "max_len"))
def _prefill_into_slot_mega(params, cfg, input_ids, cache, slot, max_len):
    """Prefill a request and scatter its KV slab into `slot` of a BATCHED
    STACKED (head-transposed) megakernel cache [L, B, Hkv, T, D]."""
    from .engine import init_cache, prefill

    one = init_cache(cfg, 1, max_len, jnp.int8)
    logits, one = prefill(params, cfg, input_ids, one, True)
    k = jnp.stack([c["k"][0] for c in one]).swapaxes(1, 2)       # [L,Hkv,T,D]
    v = jnp.stack([c["v"][0] for c in one]).swapaxes(1, 2)
    ks = jnp.stack([c["k_scale"][0] for c in one]).swapaxes(1, 2)  # [L,Hkv,T]
    vs = jnp.stack([c["v_scale"][0] for c in one]).swapaxes(1, 2)
    cache = {
        "k": cache["k"].at[:, slot].set(k.astype(cache["k"].dtype)),
        "v": cache["v"].at[:, slot].set(v.astype(cache["v"].dtype)),
        "k_scale": cache["k_scale"].at[:, slot].set(ks),
        "v_scale": cache["v_scale"].at[:, slot].set(vs),
    }
    return logits, cache


@dataclass
class Request:
    rid: int
    prompt: np.ndarray           # [S] token ids
    max_new_tokens: int = 32
    eos_token_id: Optional[int] = None
    tokens: List[int] = field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """Static-shape slot scheduler; join/leave between decode steps.

    For n_slots > 8 prefer PagedMegaBatcher: aggregate decode throughput
    falls past ~8 rows per kernel launch on v5e (the bsz VMEM cliff,
    BENCH_DETAILS r5) and the paged batcher steps wide batches in waves
    of 8 over its shared pool — the dense cache layout here cannot wave
    without slicing (copying) the multi-GB cache per group."""

    def __init__(self, model: Model, n_slots: int = 4, max_len: int = 512,
                 fused: bool = True, cache_dtype=jnp.float32,
                 use_megakernel: Optional[bool] = None):
        self.model = model
        self.cfg = model.config
        self.n_slots = n_slots
        self.max_len = min(max_len, self.cfg.max_seq_len)
        self.fused = fused
        self.cache = init_cache(self.cfg, n_slots, self.max_len, cache_dtype)
        # batched whole-model megakernel fast path: ONE pallas launch decodes
        # all slots, streaming each weight block once for the whole batch
        # (ops/model_fused.py::model_decode_mega_batch)
        self._mega = None
        if use_megakernel is None:
            use_megakernel = fused and jax.default_backend() == "tpu"
        if (use_megakernel and fused and cache_dtype == jnp.int8
                and self.max_len % 128 == 0):
            from .megadecode import stack_cache_batched, stack_serving

            st = stack_serving(model)
            if st is not None:
                self._mega = st
                self.cache = stack_cache_batched(self.cache)
                # r5 fused lm rows: opt-in via MI_FUSED_LM=1 (see
                # megadecode.default_lm — the XLA lm_head overlaps the
                # scan glue and beats the fused rows at B=8)
                from .megadecode import default_lm

                self._lm = default_lm(model, st[1])
        self.positions = np.zeros(n_slots, np.int64)  # next write index per slot
        self.last_token = np.zeros(n_slots, np.int64)
        self.slot_req: List[Optional[Request]] = [None] * n_slots
        self._next_rid = 0

    # ------------------------------------------------------------------
    def _admission_headroom(self) -> int:
        """Cache rows a step may touch beyond the emitted token (subclasses
        with overshoot writes — speculative drafting — need more)."""
        return 1

    def add_request(self, prompt, max_new_tokens=32, eos_token_id=None) -> Optional[int]:
        """Prefill into a free slot; returns request id or None if full."""
        try:
            slot = self.slot_req.index(None)
        except ValueError:
            return None
        # max(..., 1): a degenerate max_new_tokens >= max_len must still trim
        # from the tail, not keep the whole prompt ([-0:] is the full array)
        keep = max(self.max_len - max_new_tokens - self._admission_headroom(), 1)
        prompt = np.asarray(prompt).reshape(-1)[-keep:]
        req = Request(self._next_rid, prompt, max_new_tokens, eos_token_id)
        self._next_rid += 1

        if self._mega is not None:
            logits, self.cache = _prefill_into_slot_mega(
                self.model.params, self.cfg, jnp.asarray(prompt[None, :]),
                self.cache, slot, self.max_len)
        else:
            logits, self.cache = _prefill_into_slot(
                self.model.params, self.cfg, jnp.asarray(prompt[None, :]),
                self.cache, slot, self.fused)
        S = len(prompt)
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
        if self._mega is not None:
            from .megadecode import model_step_batch_donated \
                as model_step_batch

            stack, meta = self._mega
            lm, lm_meta = (self._lm if getattr(self, "_lm", None) is not None
                           else (None, None))
            logits, self.cache = model_step_batch(
                self.model.params, stack, meta, self.cfg,
                jnp.asarray(self.last_token[:, None]), self.cache,
                jnp.asarray(self.positions), lm=lm, lm_meta=lm_meta,
                interpret=jax.default_backend() != "tpu")
        else:
            logits, self.cache = decode_step_multi(
                self.model.params, self.cfg,
                jnp.asarray(self.last_token[:, None]), self.cache,
                jnp.asarray(self.positions), self.fused,
            )
        # device argmax: pull [B] ids, not [B, V] logits (slow host link)
        toks = np.asarray(jnp.argmax(logits, -1))
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


@partial(jax.jit, static_argnames=("cfg", "meta", "k", "interpret"))
def draft_propose_batch(params, stack, meta, cfg, tokens, cache, positions, k,
                        interpret=False):
    """B-slot draft proposal on the BATCHED whole-model megakernel: k greedy
    steps for every slot (one weight stream per step for the whole batch),
    plus the unconditional ingest of each slot's k-th proposal (rollback-safe:
    rows past the verified prefix are positionally masked and overwritten).
    Returns (proposals [B, k], cache)."""
    from .megadecode import model_step_batch

    def step(carry, _):
        tok, c, p = carry
        logits, c = model_step_batch(params, stack, meta, cfg, tok, c, p,
                                     interpret)
        nt = jnp.argmax(logits, -1).astype(tok.dtype)[:, None]
        return (nt, c, p + 1), nt[:, 0]

    (lastk, cache, _), props = jax.lax.scan(
        step, (tokens, cache, positions), None, length=k)
    _, cache = model_step_batch(params, stack, meta, cfg, lastk, cache,
                                positions + k, interpret)
    return jnp.swapaxes(props, 0, 1), cache


@partial(jax.jit, static_argnames=("cfg", "k", "fused"))
def _draft_propose_multi(params, cfg, tokens, cache, positions, k, fused=True):
    """Per-layer fallback of draft_propose_batch (same contract)."""
    def step(carry, _):
        tok, c, p = carry
        logits, c = decode_step_multi(params, cfg, tok, c, p, fused)
        nt = jnp.argmax(logits, -1).astype(tok.dtype)[:, None]
        return (nt, c, p + 1), nt[:, 0]

    (lastk, cache, _), props = jax.lax.scan(
        step, (tokens, cache, positions), None, length=k)
    _, cache = decode_step_multi(params, cfg, lastk, cache, positions + k,
                                 fused)
    return jnp.swapaxes(props, 0, 1), cache


class SpeculativeBatcher(ContinuousBatcher):
    """Continuous batching composed with speculative decoding (round 3,
    VERDICT item 4): every scheduler step drafts k tokens PER SLOT (batched
    megakernel on the draft when its contract holds), then verifies all
    slots' k+1-token chunks in ONE target forward
    (engine.prefill_chunk_batched, per-slot positions) — each slot advances
    1..k+1 tokens per step. Greedy spec-dec is exact, so emitted sequences
    equal the plain batcher's (tests/test_spec_batched.py) — up to the
    capacity boundary: a spec round needs 2k+2 rows of write headroom, so
    slots retire (and admission trims prompts) 2k+1 tokens earlier than the
    plain batcher; requests that would decode into that tail emit fewer
    tokens here.

    The TARGET side verifies all slots' chunks in ONE whole-model launch when
    the chunk megakernel is available (megadecode.model_step_chunk_batch —
    pass use_megakernel=True with an int8 cache, auto on TPU); otherwise the
    per-layer prefill_chunk_batched path runs. The DRAFT side uses the
    batched stacked megakernel layout when available."""

    def __init__(self, model: Model, draft: Model, k: int = 4,
                 n_slots: int = 4, max_len: int = 512, fused: bool = True,
                 cache_dtype=jnp.float32,
                 use_draft_megakernel: Optional[bool] = None,
                 use_megakernel: Optional[bool] = None):
        super().__init__(model, n_slots, max_len, fused, cache_dtype,
                         use_megakernel=use_megakernel)
        self.draft = draft
        self.k = k
        self._dmega = None
        if use_draft_megakernel is None:
            use_draft_megakernel = fused and jax.default_backend() == "tpu"
        if use_draft_megakernel and self.max_len % 128 == 0:
            from .megadecode import stack_cache_batched, stack_serving

            st = stack_serving(draft)
            if st is not None:
                self._dmega = st
                self.dcache = stack_cache_batched(
                    init_cache(draft.config, n_slots, self.max_len, jnp.int8))
        if self._dmega is None:
            self.dcache = init_cache(draft.config, n_slots, self.max_len,
                                     cache_dtype)
        # per-round accounting (accept-rate telemetry)
        self.rounds = 0
        self.proposed = 0
        self.accepted = 0

    def _admission_headroom(self) -> int:
        # a spec round writes up to pos + 2k rows (draft ingest overshoot);
        # admission must leave that room so the step()-time position clamp
        # never moves a live slot (r3 code review)
        return 2 * self.k + 2

    def add_request(self, prompt, max_new_tokens=32, eos_token_id=None):
        try:
            slot = self.slot_req.index(None)
        except ValueError:
            return None
        rid = super().add_request(prompt, max_new_tokens, eos_token_id)
        if rid is None:
            return None
        ids = jnp.asarray(self.slot_req[slot].prompt[None, :])
        if self._dmega is not None:
            _, self.dcache = _prefill_into_slot_mega(
                self.draft.params, self.draft.config, ids, self.dcache, slot,
                self.max_len)
        else:
            _, self.dcache = _prefill_into_slot(
                self.draft.params, self.draft.config, ids, self.dcache, slot,
                self.fused)
        return rid

    def step(self) -> Dict[int, List[int]]:
        """One spec round for all active slots; returns {rid: [new tokens]}."""
        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return {}
        interp = jax.default_backend() != "tpu"
        toks = jnp.asarray(self.last_token[:, None])
        # inactive slots still ride the batched programs with their stale
        # positions; clamp so their draft-overshoot writes (pos..pos+2k) stay
        # in range — active slots are retired with this headroom (see `done`)
        # so the clamp never moves a live slot
        pos = jnp.asarray(np.minimum(self.positions,
                                     self.max_len - 2 * self.k - 2))
        if self._dmega is not None:
            dstack, dmeta = self._dmega
            props, self.dcache = draft_propose_batch(
                self.draft.params, dstack, dmeta, self.draft.config, toks,
                self.dcache, pos, self.k, interpret=interp)
        else:
            props, self.dcache = _draft_propose_multi(
                self.draft.params, self.draft.config, toks, self.dcache, pos,
                self.k, self.fused)
        chunk = jnp.concatenate([toks, props], axis=1)       # [B, k+1]
        if self._mega is not None:
            # all slots' chunks verified in ONE whole-model launch
            from .megadecode import model_step_chunk_batch

            tstack, tmeta = self._mega
            vlogits, self.cache = model_step_chunk_batch(
                self.model.params, tstack, tmeta, self.cfg, chunk, self.cache,
                pos, interpret=interp)
        else:
            from .engine import prefill_chunk_batched

            vlogits, self.cache = prefill_chunk_batched(
                self.model.params, self.cfg, chunk, self.cache, pos,
                self.fused)
        ver = np.argmax(np.asarray(vlogits), axis=-1)        # [B, k+1]
        props_np = np.asarray(props)
        self.rounds += 1
        out: Dict[int, List[int]] = {}
        for i in active:
            req = self.slot_req[i]
            match = ver[i, :self.k] == props_np[i]
            n_acc = self.k if match.all() else int(np.argmin(match))
            bonus = int(ver[i, n_acc])
            emit = [int(t) for t in props_np[i][:n_acc]] + [bonus]
            self.proposed += self.k
            self.accepted += n_acc
            # budget / eos trimming applies to what the request KEEPS; the
            # cache/pos bookkeeping always advances by the verified n_acc+1
            budget = req.max_new_tokens - len(req.tokens)
            kept = emit[:budget]
            if req.eos_token_id is not None and req.eos_token_id in kept:
                kept = kept[:kept.index(req.eos_token_id) + 1]
            req.tokens.extend(kept)
            out[req.rid] = kept
            self.positions[i] += n_acc + 1
            self.last_token[i] = bonus
            done = (len(kept) < len(emit)
                    or len(req.tokens) >= req.max_new_tokens
                    # headroom: a round writes up to pos + 2k rows (draft
                    # ingest overshoot) — retire the slot before overflow
                    or self.positions[i] >= self.max_len - 2 * self.k - 2)
            if done:
                req.done = True
                self.slot_req[i] = None
        return out

    def run_all(self, prompts, max_new_tokens=16) -> Dict[int, List[int]]:
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
            results[r.rid] = r.tokens
        return results


def shard_batcher(batcher: "ContinuousBatcher", mesh) -> "ContinuousBatcher":
    """Distribute a ContinuousBatcher over a mesh: slots shard across 'data'
    (each host/data-shard owns n_slots/|data| sequences), model params follow
    the TP rules — the north star's "continuous batching across hosts".

    The decode step is the same jitted program: GSPMD partitions the per-slot
    cache updates and the TP matmuls from the NamedShardings alone. Requires
    n_slots % mesh.shape['data'] == 0 (slot axis cuts evenly).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import shard_model

    if batcher.n_slots % mesh.shape["data"]:
        raise ValueError(
            f"n_slots={batcher.n_slots} not divisible by data={mesh.shape['data']}")
    batcher.model = shard_model(batcher.model, mesh)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    if isinstance(batcher.cache, dict):  # stacked megakernel cache [L,B,...]
        batcher.cache = {
            f: put(v, P(None, "data") + P(*([None] * (v.ndim - 2))))
            for f, v in batcher.cache.items()
        }
    else:  # per-layer list: slot axis leads
        def slot_spec(v):
            return P("data") + P(*([None] * (v.ndim - 1)))

        if isinstance(batcher.cache[0], dict):
            batcher.cache = [{f: put(v, slot_spec(v)) for f, v in c.items()}
                             for c in batcher.cache]
        else:
            batcher.cache = [tuple(put(v, slot_spec(v)) for v in c)
                             for c in batcher.cache]
    return batcher
