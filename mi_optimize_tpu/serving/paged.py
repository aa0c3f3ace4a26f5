"""Paged KV cache: slots share a global page pool (vLLM-style, TPU-static).

The slot scheduler in batching.py reserves max_len cache per slot; paging
lifts that: K/V live in fixed-size pages drawn from one pool, a per-slot page
table maps logical positions to pages, and the host-side scheduler owns the
free list. Memory scales with *actual* tokens in flight, not
n_slots × max_len.

TPU discipline: every shape is static (pool size, pages/slot, page size), the
page table is a device int32 array updated functionally, and reads/writes are
gathers/scatters inside one jitted decode step — no recompilation as requests
come and go.

  write:  page = table[slot, pos // P]; pages[page, pos % P] = kv
  read:   kv_slot = pages[table[slot]]  ->  [pages_per_slot * P, H, D] view

The gather materializes the slot's logical view per step — the same HBM
traffic attention already needs; a fused paged-attention kernel is the
follow-up (ROADMAP).
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
from .batching import _prefill_kv


@partial(jax.jit, static_argnames=("k",))
def _topk_packed(logits, k):
    """[2, B, k] f32: per-row top-k values and bitcast token ids in one
    array, so the sampling step's device->host pull is a single round trip."""
    v, i = jax.lax.top_k(logits.astype(jnp.float32), k)
    return jnp.stack([v, jax.lax.bitcast_convert_type(i, jnp.float32)])


@partial(jax.jit, donate_argnums=(0,))
def _copy_pool_page(pool, src, dst):
    """Copy one pool page's content (all layers/fields) — the private tail
    page of a parallel-sampling fork when the prompt ends mid-page."""
    return {f: pool[f].at[:, dst].set(pool[f][:, src]) for f in pool}


def init_paged_cache(cfg, n_pages: int, page_size: int, n_slots: int,
                     pages_per_slot: int, dtype=jnp.float32):
    """Per-layer paged KV storage + one shared page table."""
    shape = (n_pages, page_size, cfg.num_kv_heads, cfg.head_dim)
    layers = [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.num_layers)
    ]
    table = jnp.full((n_slots, pages_per_slot), 0, jnp.int32)
    return layers, table


@partial(jax.jit, static_argnames=("cfg", "page_size", "fused"))
def paged_decode_step(params, cfg, tokens, layers, table, positions,
                      page_size, fused=True):
    """tokens [B,1], positions [B] -> (logits, new_layers).

    Per layer: scatter this step's k/v into (page, offset), then gather each
    slot's pages into its logical [T,H,D] view for attention.
    """
    B = tokens.shape[0]
    pages_per_slot = table.shape[1]
    T = pages_per_slot * page_size

    x = llama.embed(params, tokens)
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    mask = (jnp.arange(T)[None, :] <= positions[:, None])[:, None, None, :]

    page_idx = table[jnp.arange(B), positions // page_size]  # [B]
    offset = positions % page_size

    from ..models.quant_linear import quant_linear_apply

    new_layers = []
    for blk, (pk, pv) in zip(params["layers"], layers):
        # attention must see the FULL paged history, so the block is inlined
        # here (block_apply's cache path assumes a contiguous per-slot buffer)
        h = llama.rms_norm(x, blk["input_norm"], cfg.rms_eps)

        q_dim = cfg.num_heads * cfg.head_dim
        kv_dim = cfg.num_kv_heads * cfg.head_dim
        if "qkv_proj" in blk:
            qkv = quant_linear_apply(blk["qkv_proj"], h, fused=fused)
            q, k, v = (qkv[..., :q_dim], qkv[..., q_dim:q_dim + kv_dim],
                       qkv[..., q_dim + kv_dim:])
        else:
            q = quant_linear_apply(blk["q_proj"], h, fused=fused)
            k = quant_linear_apply(blk["k_proj"], h, fused=fused)
            v = quant_linear_apply(blk["v_proj"], h, fused=fused)
        q = q.reshape(B, 1, cfg.num_heads, cfg.head_dim)
        k = k.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim)
        q = llama.apply_rope(q, cos, sin, cfg)
        k = llama.apply_rope(k, cos, sin, cfg)

        # scatter the new k/v into (page, offset) per slot
        pk = pk.at[page_idx, offset].set(k[:, 0].astype(pk.dtype))
        pv = pv.at[page_idx, offset].set(v[:, 0].astype(pv.dtype))

        from ..ops.paged_attention import (
            paged_attention_supported, paged_flash_attention)

        if fused and paged_attention_supported(page_size, cfg.head_dim):
            # fused kernel: pages read directly via page-table indexed block
            # fetches — no [B, T, H, D] logical-view materialization
            attn = paged_flash_attention(
                q.reshape(B, -1), pk, pv, table, positions,
                n_heads=cfg.num_heads, n_kv_heads=cfg.num_kv_heads,
                head_dim=cfg.head_dim, page_size=page_size,
                interpret=jax.default_backend() != "tpu")
            attn = attn.reshape(B, 1, cfg.num_heads * cfg.head_dim).astype(x.dtype)
        else:
            # gather each slot's logical view
            k_all = pk[table].reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
            v_all = pv[table].reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
            attn = llama.attention(q, k_all.astype(q.dtype), v_all.astype(q.dtype),
                                   mask, cfg)
            attn = attn.reshape(B, 1, cfg.num_heads * cfg.head_dim)
        x = x + quant_linear_apply(blk["o_proj"], attn, fused=fused)
        h2 = llama.rms_norm(x, blk["post_norm"], cfg.rms_eps)
        if "gateup_proj" in blk:
            gu = quant_linear_apply(blk["gateup_proj"], h2, fused=fused)
            gate, up = gu[..., :cfg.intermediate_size], gu[..., cfg.intermediate_size:]
        else:
            gate = quant_linear_apply(blk["gate_proj"], h2, fused=fused)
            up = quant_linear_apply(blk["up_proj"], h2, fused=fused)
        x = x + quant_linear_apply(blk["down_proj"], jax.nn.silu(gate) * up, fused=fused)
        new_layers.append((pk, pv))

    x = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, x, fused=fused)[:, 0]
    return logits, new_layers


class PagedMegaBatcher:
    """Continuous batching over a shared KV page POOL with the batched
    whole-model decode megakernel (round 3, VERDICT item 8): page-pool memory
    management (memory scales with tokens in flight, pages recycle across
    requests) composed with the one-launch-per-step batched fast path. The
    kernel reads KV blocks THROUGH the page table (scalar prefetch) — no
    logical-view gather — so the step's HBM traffic equals the dense batched
    megakernel's.

    Page size = the kernel's flash block (128/256 tokens). Page 0 is scratch:
    retired slots point at it and their writes land there. Allocation is
    host-side (free list); a slot allocates lazily as its position crosses a
    page boundary. `n_pages` sizes the pool — it may be far below
    n_slots * max_len/P; `add_request` returns None when the pool can't cover
    the prompt, and `step` raises if lazy growth finds the pool exhausted
    (admission control should leave 1 page/slot headroom).

    prefix_cache=True enables AUTOMATIC PREFIX CACHING (vLLM-style): every
    full prompt page is registered under a chain hash of all tokens through
    its end; a later request whose prompt starts with a cached chain maps
    those pages directly (refcount++, zero prefill compute for the hit run)
    and only its uncached suffix runs — through the paged whole-model CHUNK
    megakernel (megadecode.model_step_chunk_batch_paged), attending to the
    hit pages through the page table. Pages whose refcount drops to zero stay
    resident on an LRU list and are evicted (freed + deregistered) only under
    allocator pressure, so the cache costs no pool capacity.

    Capacity caveat: with prefix_cache=True the admission clamp reserves one
    extra chunk quantum (32 tokens on TPU, 8 on CPU) of slot capacity for the
    suffix-chunk pad rows, EVEN on a full cache miss — prompts within one
    quantum of max_len - max_new_tokens are truncated one quantum shorter
    than a cache-disabled batcher would, so outputs for those edge prompts
    can differ between prefix_cache on/off. Prompts shorter than that bound
    are unaffected and greedy sequences match exactly (interpret mode).

    Numerics: hit pages hold byte-identical KV (same tokens, same absolute
    positions), so cached-vs-uncached agreement is exact up to the suffix
    path: the chunk megakernel's bf16 MXU passes differ from the dense
    prefill's in the last few ULPs — greedy-exact in interpret mode
    (tests/test_prefix_cache.py), while on hardware a near-tie greedy argmax
    on a RANDOM-INIT model can flip (measured max rel logit diff ~1.7e-2 at
    tiny scale — the same property as the spec-dec verify path,
    BENCH_DETAILS.md; real checkpoints have logit margins that dwarf bf16
    noise).
    """

    def __init__(self, model: Model, n_slots: int = 4, max_len: int = 512,
                 page_size: int = 128, n_pages: Optional[int] = None,
                 prefix_cache: bool = False,
                 wave_slots: Optional[int] = None):
        from .megadecode import init_pool_batched, stack_serving

        assert max_len % page_size == 0 and page_size % 128 == 0
        st = stack_serving(model)
        if st is None:
            raise ValueError("model does not satisfy the megakernel contract")
        self.model = model
        self.cfg = model.config
        self._mega = st
        # r5: fused terminal lm_head rows (B-row rms+unembed+argmax
        # in-kernel) — opt-in via MI_FUSED_LM=1 (see megadecode.default_lm:
        # with the unrolled-DUS scatter the XLA lm_head overlaps the scan
        # glue and beats the fused rows at B=8, 12.5 vs 15.1 ms)
        from .megadecode import default_lm

        self._lm = default_lm(model, st[1])
        self._wave = wave_slots          # None -> _wave_size() default (8)
        self.page_size = page_size
        self.max_len = min(max_len, self.cfg.max_seq_len)
        self.pps = self.max_len // page_size
        if n_pages is None:
            n_pages = 1 + n_slots * self.pps
        self.n_slots = n_slots
        self.pool = init_pool_batched(self.cfg, n_pages, page_size)
        self.table = np.zeros((n_slots, self.pps), np.int32)
        self.free_pages = list(range(1, n_pages))
        # full prompt pages are SHARED between the n forks of a parallel-
        # sampling request (vLLM-style): refcounted, freed at zero
        self.page_refs = np.zeros(n_pages, np.int32)
        self.positions = np.zeros(n_slots, np.int64)
        self.last_token = np.zeros(n_slots, np.int64)
        self.slot_req: List[Optional["Request"]] = [None] * n_slots
        self.slot_sample: List[Optional[dict]] = [None] * n_slots
        self._next_rid = 0
        # --- automatic prefix cache state (all host-side) ---
        self._pc = prefix_cache
        self._pc_key2page: Dict[int, int] = {}   # chain hash -> pool page
        self._pc_page2key: Dict[int, int] = {}   # inverse (registered pages)
        self._pc_lru: Dict[int, None] = {}       # refcount-0 cached pages, LRU
        self.pc_hit_tokens = 0
        self.pc_miss_tokens = 0

    def _alloc(self, n):
        if len(self.free_pages) + len(self._pc_lru) < n:
            return None
        while len(self.free_pages) < n:  # evict coldest cached pages
            pg = next(iter(self._pc_lru))
            del self._pc_lru[pg]
            del self._pc_key2page[self._pc_page2key.pop(pg)]
            self.free_pages.append(pg)
        out = self.free_pages[:n]
        del self.free_pages[:n]
        self.page_refs[out] = 1
        return out

    def _ref_cached(self, page: int):
        """Take a reference on a prefix-cache hit page (possibly reviving it
        off the refcount-0 LRU list)."""
        if self.page_refs[page] == 0:
            self._pc_lru.pop(page, None)
        self.page_refs[page] += 1

    def _unref(self, page: int):
        """Drop one reference; at zero, registered pages go back on the LRU
        (evictable, still cached) and unregistered ones to the free list."""
        page = int(page)
        self.page_refs[page] -= 1
        if self.page_refs[page] == 0:
            if page in self._pc_page2key:
                self._pc_lru[page] = None
            else:
                self.free_pages.append(page)

    def _page_keys(self, prompt) -> List[int]:
        """Chain hash per full page: key[j] covers tokens [0, (j+1)*P) — a
        page is only reusable when its ENTIRE prefix matches."""
        P = self.page_size
        keys, h = [], 0
        arr = np.asarray(prompt, np.int64)
        for j in range(len(arr) // P):
            h = hash((h, arr[j * P:(j + 1) * P].tobytes()))
            keys.append(h)
        return keys

    def prefix_cache_stats(self) -> Dict[str, int]:
        return {"hit_tokens": self.pc_hit_tokens,
                "miss_tokens": self.pc_miss_tokens,
                "cached_pages": len(self._pc_key2page),
                "evictable_pages": len(self._pc_lru)}

    def _retire(self, slot):
        for p in self.table[slot]:
            if p != 0:
                self._unref(p)
        self.table[slot] = 0
        self.positions[slot] = 0   # dead slot reads/writes only scratch page 0
        self.last_token[slot] = 0
        self.slot_req[slot] = None
        self.slot_sample[slot] = None

    def _headroom(self) -> int:
        # rows past the current position a step may write (1 for plain
        # decode; the speculative subclass needs the 2k+2 overshoot margin)
        return 1

    def _pc_chunk_quantum(self) -> int:
        """Fixed chunk length for suffix prefill: ONE compiled program
        regardless of suffix length (longer suffixes run several sequential
        launches). 8: the chunk kernel hits a VMEM-pipeline cliff past
        C~9 (exp_chunk_c_sweep r5: 10.4 ms device-true at C=9 but 41.5 at
        C=13 and 59 at C=17, tile-dependent and non-monotonic above the
        knee — ROADMAP item 3), so several C=8 launches at ~weight-stream
        cost beat one big-C launch (measured: one paged C=8 launch at a
        1016-token prefix = 13.5 ms device-true -> a 16-token suffix is
        ~27 ms in two launches vs 57.7 in one C=16)."""
        return 8

    def _pick(self, slot, logits_row) -> int:
        """Per-slot next token: greedy, or host-side temperature/top-k/top-p
        sampling (mirrors engine._sample's truncation semantics) with the
        slot's own deterministic rng — forks of one request diverge only by
        their sample draws."""
        st = self.slot_sample[slot]
        if st is None or st["temperature"] <= 0.0:
            return int(np.argmax(logits_row))
        x = logits_row.astype(np.float64) / st["temperature"]
        if st["top_k"]:
            kth = np.sort(x)[-st["top_k"]]
            x = np.where(x < kth, -np.inf, x)
        p = np.exp(x - x.max())
        p /= p.sum()
        if st["top_p"] < 1.0:
            order = np.argsort(-p)
            keep = np.cumsum(p[order]) < st["top_p"]
            keep[0] = True             # always keep the most likely token
            mask = np.zeros(p.shape, bool)
            mask[order[keep]] = True
            p = np.where(mask, p, 0.0)
            p /= p.sum()
        return int(st["rng"].choice(p.shape[0], p=p))

    def _pick_topk(self, slot, vals_row, idx_row) -> int:
        """_pick over a device-truncated (top-K values, token ids) pair —
        the step path's compact pull. Greedy = idx_row[0] (device argmax);
        sampling applies the slot's temperature/top-k/top-p over the K
        candidates and maps the draw back through idx_row."""
        st = self.slot_sample[slot]
        if st is None or st["temperature"] <= 0.0:
            return int(idx_row[0])
        x = vals_row.astype(np.float64) / st["temperature"]
        if st["top_k"]:
            kth = np.sort(x)[-min(st["top_k"], x.shape[0])]
            x = np.where(x < kth, -np.inf, x)
        p = np.exp(x - x.max())
        p /= p.sum()
        if st["top_p"] < 1.0:
            order = np.argsort(-p)
            keep = np.cumsum(p[order]) < st["top_p"]
            keep[0] = True
            mask = np.zeros(p.shape, bool)
            mask[order[keep]] = True
            p = np.where(mask, p, 0.0)
            p /= p.sum()
        return int(idx_row[st["rng"].choice(p.shape[0], p=p)])

    def add_request(self, prompt, max_new_tokens=32, eos_token_id=None,
                    n: int = 1, temperature: float = 0.0, top_p: float = 1.0,
                    top_k: int = 0, seed: Optional[int] = None):
        """Admit a request; returns its rid (or None if not admittable).

        n > 1: PARALLEL SAMPLING — n forks of the prompt decode
        independently (one prefill; the full prompt pages are shared
        refcounted between forks, only the partial tail page is copied
        per fork), each sampling with its own rng stream. Returns the list
        of n rids, or None (all-or-nothing admission)."""
        from .batching import Request
        from .engine import init_cache, prefill
        from .megadecode import scatter_prefill_pages

        assert n >= 1
        if n > 1 and temperature <= 0.0:
            raise ValueError("parallel sampling (n>1) needs temperature > 0 "
                             "(greedy forks would be identical)")
        slots = [i for i, r in enumerate(self.slot_req) if r is None][:n]
        if len(slots) < n:
            return None
        keep = max(self.max_len - max_new_tokens - self._headroom(), 1)
        if self._pc:
            # a suffix chunk's pad rows reach position S + q - 2; keep them
            # inside the slot's page-table row (entries past npg are 0 ->
            # scratch, but indices past pps would clamp-gather a live page)
            keep = min(keep, self.max_len - self._pc_chunk_quantum())
        prompt = np.asarray(prompt).reshape(-1)[-keep:]
        S = len(prompt)
        P = self.page_size
        npg = S // P + 1               # covers positions 0..S (first decode row)

        # prefix-cache lookup: longest cached chain of full pages, capped so
        # at least the last prompt token is computed (we need its logits)
        keys = self._page_keys(prompt) if self._pc else []
        nhit = 0
        for k in keys:
            if k in self._pc_key2page:
                nhit += 1
            else:
                break
        nhit = min(nhit, (S - 1) // P)

        # Pin hit pages BEFORE allocating: _alloc evicts refcount-0 LRU pages
        # and could otherwise evict — and re-issue as fresh writable pages —
        # the very pages we are about to map (KeyError crash at best, silent
        # KV aliasing at worst). Pinning takes them off the evictable list.
        hit_pages = [self._pc_key2page[keys[j]] for j in range(nhit)]
        for pg in hit_pages:
            self._ref_cached(pg)

        # primary takes npg-nhit fresh pages; each fork adds a private tail
        pages = self._alloc(npg - nhit + (n - 1))
        if pages is None and nhit:
            # pool can't cover the suffix with the hit pages pinned — fall
            # back to a full cache-miss prefill, which is free to evict the
            # would-be hit pages themselves (strictly more capacity)
            for pg in hit_pages:
                self._unref(pg)
            nhit, hit_pages = 0, []
            pages = self._alloc(npg + (n - 1))
        if pages is None:
            return None
        slot = slots[0]
        for j, pg in enumerate(hit_pages):
            self.table[slot, j] = pg
        self.table[slot, nhit:npg] = pages[:npg - nhit]
        # stats count only ADMITTED work (rejected requests are retried by
        # callers and would otherwise double-count)
        self.pc_hit_tokens += nhit * P
        self.pc_miss_tokens += S - nhit * P

        if nhit == 0:
            # batch-1 prefill at full logical capacity (ONE compile for all
            # prompt lengths), then whole-page scatter of the first
            # ceil(S/P) pages; the valid mask redirects the rest to scratch
            one = init_cache(self.cfg, 1, self.max_len, jnp.int8)
            logits, one = prefill(self.model.params, self.cfg,
                                  jnp.asarray(prompt[None, :]), one, True)
            n_slab = -(-S // P)
            self.pool = scatter_prefill_pages(
                self.pool, one, jnp.asarray(self.table[slot]),
                jnp.arange(self.pps) < n_slab, self.cfg)
            logits0 = np.asarray(logits[0])
        else:
            # suffix prefill THROUGH the page table: the paged whole-model
            # CHUNK megakernel scores q tokens per launch against the hit
            # pages (fixed C=q -> ONE compiled program, VMEM bounded: C=128
            # at 7B needs 106M scoped vmem vs the 64M limit, so long
            # suffixes chunk sequentially). Pad rows (position > S-1) land
            # in fresh/scratch pages and are overwritten by decode (or a
            # later chunk) before ever being read.
            from .megadecode import model_step_chunk_batch_paged

            suf = prompt[nhit * P:]
            s_len = len(suf)
            q = self._pc_chunk_quantum()
            logits0 = None
            off = 0
            while off < s_len:
                n_real = min(q, s_len - off)
                toks = np.zeros(q, prompt.dtype)
                toks[:n_real] = suf[off:off + n_real]
                logits_c, self.pool = model_step_chunk_batch_paged(
                    self.model.params, self._mega[0], self._mega[1],
                    self.cfg, jnp.asarray(toks[None, :]), self.pool,
                    jnp.asarray(self.table[slot:slot + 1]),
                    jnp.asarray([nhit * P + off]),
                    interpret=jax.default_backend() != "tpu")
                if off + n_real == s_len:
                    logits0 = np.asarray(logits_c[0, n_real - 1])
                off += n_real

        # register this prompt's full pages for future hits
        if self._pc:
            for j in range(S // P):
                pg = int(self.table[slot, j])
                if keys[j] not in self._pc_key2page and pg != 0:
                    self._pc_key2page[keys[j]] = pg
                    self._pc_page2key[pg] = keys[j]

        rids = []
        for f, s in enumerate(slots):
            if f > 0:
                tail = pages[npg - nhit + f - 1]
                j0 = S // P            # index of the written-from-S-on page
                shared = self.table[slot, :j0]
                self.table[s, :j0] = shared
                self.page_refs[shared] += 1
                self.table[s, j0] = tail
                if S % P:              # tail page holds prompt rows -> copy
                    self.pool = _copy_pool_page(
                        self.pool, int(self.table[slot, j0]), int(tail))
            req = Request(self._next_rid, prompt, max_new_tokens,
                          eos_token_id)
            self._next_rid += 1
            self.slot_sample[s] = None if temperature <= 0.0 else {
                "temperature": temperature, "top_p": top_p, "top_k": top_k,
                "rng": np.random.default_rng(
                    None if seed is None else seed + f),
            }
            tok = self._pick(s, logits0)
            req.tokens.append(tok)
            self.positions[s] = S
            self.last_token[s] = tok
            self.slot_req[s] = req
            rids.append(req.rid)
        return rids if n > 1 else rids[0]

    def _wave_size(self) -> int:
        """Max slots per kernel launch. Aggregate decode throughput FALLS
        beyond ~8 rows per launch on v5e (exp_paged_batched r5: 562 agg
        tok/s at B=8, 516 at B=12, 457 at B=16 — the bsz-scaled VMEM
        cliff, ROADMAP item 3), so larger batchers step in WAVES of 8
        sharing the pool: two B=8 launches (~28 ms for 16 slots) beat
        one B=16 launch (35 ms)."""
        return self._wave or 8

    def step(self) -> Dict[int, int]:
        from .megadecode import model_step_batch_paged_donated \
            as model_step_batch_paged

        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return {}
        P = self.page_size
        for i in active:  # lazy page growth at boundary crossings
            j = int(self.positions[i]) // P
            if self.table[i, j] == 0:
                pg = self._alloc(1)
                if pg is None:
                    raise RuntimeError("KV page pool exhausted")
                self.table[i, j] = pg[0]
        stack, meta = self._mega
        lm, lm_meta = self._lm if self._lm is not None else (None, None)
        interp = jax.default_backend() != "tpu"
        W = self._wave_size()
        if self.n_slots <= W:
            row_of = {i: i for i in active}
            logits, self.pool = model_step_batch_paged(
                self.model.params, stack, meta, self.cfg,
                jnp.asarray(self.last_token[:, None]), self.pool,
                jnp.asarray(self.table), jnp.asarray(self.positions),
                interpret=interp, lm=lm, lm_meta=lm_meta)
        else:
            # wave mode (see _wave_size): W-slot launches over the SHARED
            # donated pool, ONE compiled shape regardless of n_slots.
            # Short waves pad by REPEATING the last active slot — the dup
            # row recomputes the same KV row and the unrolled-DUS scatter
            # rewrites the same (page, offset) with identical data.
            parts = []
            row_of: Dict[int, int] = {}
            r0 = 0
            for o in range(0, len(active), W):
                g = active[o:o + W]
                idx = g + [g[-1]] * (W - len(g))
                lg, self.pool = model_step_batch_paged(
                    self.model.params, stack, meta, self.cfg,
                    jnp.asarray(self.last_token[idx][:, None]), self.pool,
                    jnp.asarray(self.table[idx]),
                    jnp.asarray(self.positions[idx]),
                    interpret=interp, lm=lm, lm_meta=lm_meta)
                parts.append(lg)
                for off, s in enumerate(idx):
                    row_of.setdefault(s, r0 + off)
                r0 += W
            logits = jnp.concatenate(parts, 0)
        # compact pull (r4): this environment's host link is ~MB/s, so the
        # full [B, V] logits pull dominated the step (67 vs 18 ms measured).
        # Greedy slots need only the device argmax; sampling slots get the
        # device top-K (values + ids) with K = max(256, largest requested
        # top_k among active slots) — exact for any top_k (r4 advisor: a
        # fixed 256 silently truncated top_k > 256), and top_p acts on the
        # truncated, renormalized set (tail mass beyond K post-temperature
        # is negligible; heavy-tail-exact top_p would need the full pull —
        # the prefill token, scored via _pick on full logits, is exact).
        if all(self.slot_sample[i] is None for i in active):
            toks_np = np.asarray(jnp.argmax(logits, -1))
            pick = lambda i: int(toks_np[row_of[i]])
        else:
            want = max([256] + [int(self.slot_sample[i]["top_k"])
                                for i in active
                                if self.slot_sample[i] is not None])
            K = min(want, logits.shape[-1])
            # (values, bitcast ids) stacked on device -> ONE blocking pull
            # per step (each pull pays full tunnel RTT on this host link)
            packed = np.asarray(_topk_packed(logits, K))
            vals_np = packed[0]
            idx_np = packed[1].view(np.int32)
            pick = lambda i: self._pick_topk(i, vals_np[row_of[i]],
                                             idx_np[row_of[i]])
        out = {}
        for i in active:
            req = self.slot_req[i]
            tok = pick(i)
            req.tokens.append(tok)
            out[req.rid] = tok
            self.positions[i] += 1
            self.last_token[i] = tok
            hit_eos = req.eos_token_id is not None and tok == req.eos_token_id
            if len(req.tokens) >= req.max_new_tokens or hit_eos \
                    or self.positions[i] >= self.max_len - 1:
                req.done = True
                self._retire(i)
        return out

    def run_all(self, prompts, max_new_tokens=16) -> Dict[int, List[int]]:
        pending = list(prompts)
        results: Dict[int, List[int]] = {}
        reqs = []
        while pending or any(r is not None for r in self.slot_req):
            while pending:
                rid = self.add_request(pending[0], max_new_tokens)
                if rid is None:
                    break
                reqs.append([r for r in self.slot_req if r and r.rid == rid][0])
                pending.pop(0)
            if not any(r is not None for r in self.slot_req):
                if pending:  # nothing running and nothing admittable
                    raise RuntimeError("page pool too small for request")
                break
            self.step()
        for r in reqs:
            results[r.rid] = r.tokens
        return results


class PagedSpeculativeBatcher(PagedMegaBatcher):
    """Speculative decoding UNDER page-pool memory management (round 3
    serving composition: "paged + speculative"). Each scheduler step drafts k
    tokens per slot (batched whole-model megakernel on the draft's dense
    cache — the draft, e.g. int2, is the small model; the TARGET KV is the
    big allocation and lives in the shared page pool), then verifies every
    slot's k+1-token chunk in ONE whole-model CHUNK launch reading/writing
    THROUGH the page table (megadecode.model_step_chunk_batch_paged).

    Greedy spec-dec is exact, so emitted sequences equal the plain paged
    batcher's up to the capacity boundary (slots retire 2k+1 tokens earlier:
    a round writes up to position prefix+k and the next round may start at
    prefix+k+1). Page growth is lazy per round: before stepping, each active
    slot allocates any missing pages covering prefix..prefix+k."""

    def __init__(self, model: Model, draft: Model, k: int = 4,
                 n_slots: int = 4, max_len: int = 512, page_size: int = 128,
                 n_pages: Optional[int] = None,
                 verify_wave_slots: Optional[int] = None):
        from .engine import init_cache
        from .megadecode import stack_cache_batched, stack_serving

        super().__init__(model, n_slots, max_len, page_size, n_pages)
        self._verify_wave = verify_wave_slots   # None -> <=8 rows/launch
        self.draft = draft
        self.k = k
        st = stack_serving(draft)
        if st is None:
            raise ValueError("draft does not satisfy the megakernel contract")
        self._dmega = st
        self.dcache = stack_cache_batched(
            init_cache(draft.config, n_slots, self.max_len, jnp.int8))
        self.rounds = 0
        self.proposed = 0
        self.accepted = 0

    def _headroom(self) -> int:
        return 2 * self.k + 2

    def add_request(self, prompt, max_new_tokens=32, eos_token_id=None):
        from .batching import _prefill_into_slot_mega

        try:
            slot = self.slot_req.index(None)
        except ValueError:
            return None
        rid = super().add_request(prompt, max_new_tokens, eos_token_id)
        if rid is None:
            return None
        ids = jnp.asarray(self.slot_req[slot].prompt[None, :])
        _, self.dcache = _prefill_into_slot_mega(
            self.draft.params, self.draft.config, ids, self.dcache, slot,
            self.max_len)
        return rid

    def step(self) -> Dict[int, List[int]]:
        """One spec round for all active slots; returns {rid: [new tokens]}."""
        from .batching import draft_propose_batch
        from .megadecode import model_step_chunk_batch_paged

        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return {}
        interp = jax.default_backend() != "tpu"
        P = self.page_size
        for i in active:  # lazy growth: this round writes rows pos..pos+k
            for j in range(int(self.positions[i]) // P,
                           (int(self.positions[i]) + self.k) // P + 1):
                if self.table[i, j] == 0:
                    pg = self._alloc(1)
                    if pg is None:
                        raise RuntimeError("KV page pool exhausted")
                    self.table[i, j] = pg[0]
        toks = jnp.asarray(self.last_token[:, None])
        pos = jnp.asarray(self.positions.astype(np.int32))
        dstack, dmeta = self._dmega
        props, self.dcache = draft_propose_batch(
            self.draft.params, dstack, dmeta, self.draft.config, toks,
            self.dcache, pos, self.k, interpret=interp)
        chunk = jnp.concatenate([toks.astype(props.dtype), props], axis=1)
        stack, meta = self._mega
        # WAVE the verify (r5): the chunk kernel runs B*(k+1) virtual rows
        # per launch, and throughput collapses past ~8-9 rows (the bsz
        # VMEM cliff, exp_chunk_c_sweep — e.g. 4 slots x C=5 = 20 rows
        # lands at ~3-4x the per-row cost). Groups of G slots keep each
        # launch at <= 8 rows (short groups pad by repeating a slot —
        # identical rows re-scatter identical data); argmax happens ON
        # DEVICE so the host pulls [B, k+1] ints, not [B, k+1, V] logits
        # (~2.5 MB over this environment's ~MB/s host link).
        C = self.k + 1
        B = chunk.shape[0]
        G = self._verify_wave or max(1, 8 // C)
        parts = []
        for o in range(0, B, min(G, B)):
            g = list(range(o, min(o + G, B)))
            idx = g + [g[-1]] * (G - len(g))
            ji = jnp.asarray(idx)
            lg, self.pool = model_step_chunk_batch_paged(
                self.model.params, stack, meta, self.cfg, chunk[ji],
                self.pool, jnp.asarray(self.table[idx]), pos[ji],
                interpret=interp)
            parts.append(jnp.argmax(lg, axis=-1)[: len(g)])
        ver = np.asarray(jnp.concatenate(parts, 0))          # [B, k+1]
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
                    or self.positions[i] >= self.max_len - self._headroom())
            if done:
                req.done = True
                self._retire(i)
        return out


@dataclass
class PagedRequest:
    rid: int
    tokens: List[int] = field(default_factory=list)
    max_new_tokens: int = 32
    done: bool = False


class PagedBatcher:
    """Continuous batching over the shared page pool."""

    def __init__(self, model: Model, n_slots=4, page_size=16, n_pages=64,
                 pages_per_slot=8, fused=True):
        self.model = model
        self.cfg = model.config
        self.fused = fused
        self.page_size = page_size
        self.pages_per_slot = pages_per_slot
        self.layers, self.table = init_paged_cache(
            self.cfg, n_pages, page_size, n_slots, pages_per_slot)
        self.table = np.array(self.table)  # host-owned, writable copy
        # page 0 is a scratch page never read (slots start with real pages)
        self.free_pages = list(range(1, n_pages))
        self.positions = np.zeros(n_slots, np.int64)
        self.last_token = np.zeros(n_slots, np.int64)
        self.slot_req: List[Optional[PagedRequest]] = [None] * n_slots
        self._rid = 0

    def _alloc(self, n):
        if len(self.free_pages) < n:
            return None
        out = self.free_pages[:n]
        del self.free_pages[:n]
        return out

    def _free_slot(self, slot):
        used = [p for p in self.table[slot] if p != 0]
        self.free_pages.extend(int(p) for p in used)
        self.table[slot] = 0

    def add_request(self, prompt, max_new_tokens=16) -> Optional[int]:
        try:
            slot = self.slot_req.index(None)
        except ValueError:
            return None
        prompt = np.asarray(prompt).reshape(-1)
        total = len(prompt) + max_new_tokens
        need = -(-total // self.page_size)
        if need > self.pages_per_slot:
            raise ValueError("request exceeds pages_per_slot capacity")
        pages = self._alloc(need)
        if pages is None:
            return None
        self.table[slot, :need] = pages

        logits, kvs = _prefill_kv(self.model.params, self.cfg,
                                  jnp.asarray(prompt[None, :]), self.fused)
        S = len(prompt)
        # scatter prompt K/V into this slot's pages
        new_layers = []
        pos = np.arange(S)
        pg = self.table[slot][pos // self.page_size]
        off = pos % self.page_size
        for (pk, pv), (ck, cv) in zip(self.layers, kvs):
            pk = pk.at[pg, off].set(ck[0].astype(pk.dtype))
            pv = pv.at[pg, off].set(cv[0].astype(pv.dtype))
            new_layers.append((pk, pv))
        self.layers = new_layers

        req = PagedRequest(self._rid, max_new_tokens=max_new_tokens)
        self._rid += 1
        tok = int(np.argmax(np.asarray(logits[0])))
        req.tokens.append(tok)
        self.positions[slot] = S
        self.last_token[slot] = tok
        self.slot_req[slot] = req
        return req.rid

    def step(self) -> Dict[int, int]:
        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return {}
        logits, self.layers = paged_decode_step(
            self.model.params, self.cfg, jnp.asarray(self.last_token[:, None]),
            self.layers, jnp.asarray(self.table), jnp.asarray(self.positions),
            self.page_size, self.fused,
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
            if len(req.tokens) >= req.max_new_tokens:
                req.done = True
                self._free_slot(i)
                self.slot_req[i] = None
        return out
