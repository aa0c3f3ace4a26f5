"""Fused paged attention: page-table-indexed flash decode over a page pool.

serving/paged.py's stock path materializes each slot's logical KV view with a
gather (`pages[table]` -> [B, T, H, D]) every step — that DOUBLES attention's
HBM traffic (read pages, write view, read view). This kernel reads the pages
directly: the page table rides scalar prefetch, every grid step's BlockSpec
index map looks up `table[slot, page]`, and a live-page clamp keeps pages
beyond the slot's position from ever being fetched (the grid step becomes a
no-op on an already-resident block, the same trick as the decode megakernel's
flash phase in ops/block_fused.py).

Layout: pages are viewed as [n_pages, P, Hkv*D] (heads along lanes, D=128 per
head-tile), so a page block is one (P-sublane, 128*Hkv-lane) tile fetch.
Grid (B, pages_per_slot), flash state (m, l, acc) in VMEM scratch per slot.

Role in the reference's terms: the reference has no serving engine of its own
(it exports to fastllm, examples/llama/llama2_to_flm.py); paged attention is
part of our TPU-native replacement for that engine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def paged_attention_supported(page_size: int, head_dim: int) -> bool:
    return page_size % 8 == 0 and head_dim == 128


def _kernel(
    table_ref, pos_ref,            # scalar prefetch
    q_ref, pk_ref, pv_ref,         # inputs
    out_ref,                       # output
    m_sc, l_sc, acc_sc,            # scratch [H, D]
    *,
    n_heads, n_kv_heads, head_dim, page_size, pps,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    reps = n_heads // n_kv_heads
    scale = 1.0 / float(np.sqrt(head_dim))
    pos = pos_ref[b]

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, -1e30)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    @pl.when(j * page_size <= pos)
    def _():
        q = q_ref[:].astype(jnp.float32).reshape(n_heads, head_dim)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, page_size), 1)
        live = j * page_size + lanes <= pos      # include this step's own row
        kf = pk_ref[:][0].astype(jnp.float32)    # [P, Hkv*D]
        vf = pv_ref[:][0].astype(jnp.float32)
        for hk in range(n_kv_heads):
            rows = slice(hk * reps, (hk + 1) * reps)
            kh = kf[:, hk * head_dim:(hk + 1) * head_dim]   # [P, D]
            vh = vf[:, hk * head_dim:(hk + 1) * head_dim]
            s = jax.lax.dot_general(q[rows], kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(live, s, jnp.finfo(jnp.float32).min)
            m_old = m_sc[rows][:, :1]
            m_new = jnp.maximum(m_old, s.max(axis=-1, keepdims=True))
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(s - m_new)
            pv_ = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            acc_sc[rows] = acc_sc[rows] * corr + pv_
            l_sc[rows] = l_sc[rows] * corr + p.sum(axis=-1, keepdims=True)
            m_sc[rows] = jnp.broadcast_to(m_new, (reps, head_dim))

    @pl.when(j == pps - 1)
    def _():
        out = acc_sc[:] / l_sc[:]
        out_ref[:] = out.reshape(1, n_heads * head_dim).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "n_kv_heads",
                                             "head_dim", "page_size",
                                             "interpret"))
def paged_flash_attention(q, pk, pv, table, positions, *,
                          n_heads, n_kv_heads, head_dim, page_size,
                          interpret=False):
    """q [B, H*D]; pk/pv [n_pages, P, Hkv, D]; table [B, pps] int32;
    positions [B] int32 (row `positions[b]` must already be written).
    Returns attention output [B, H*D] (q's dtype)."""
    B, pps = table.shape
    n_pages = pk.shape[0]
    kvl = n_kv_heads * head_dim
    pk3 = pk.reshape(n_pages, page_size, kvl)
    pv3 = pv.reshape(n_pages, page_size, kvl)

    def page_of(b, j, tbl, pos):
        # live-page clamp: dead pages are never fetched
        jc = jnp.minimum(j, pos[b] // page_size)
        return (tbl[b, jc], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, pps),
        in_specs=[
            pl.BlockSpec((1, n_heads * head_dim), lambda b, j, t, p: (b, 0)),
            pl.BlockSpec((1, page_size, kvl), page_of),
            pl.BlockSpec((1, page_size, kvl), page_of),
        ],
        out_specs=pl.BlockSpec((1, n_heads * head_dim),
                               lambda b, j, t, p: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_heads, head_dim), jnp.float32),
            pltpu.VMEM((n_heads, head_dim), jnp.float32),
            pltpu.VMEM((n_heads, head_dim), jnp.float32),
        ],
    )

    kern = functools.partial(
        _kernel, n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        page_size=page_size, pps=pps,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_heads * head_dim), q.dtype),
        interpret=interpret,
    )(table.astype(jnp.int32), positions.astype(jnp.int32), q, pk3, pv3)
