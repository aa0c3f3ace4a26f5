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
        toks = np.argmax(np.asarray(logits), axis=-1)
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
