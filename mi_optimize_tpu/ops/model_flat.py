"""FLAT whole-model decode megakernel: all layers + lm_head + argmax in ONE
Pallas launch (round 4, VERDICT item 1).

ops/model_fused.py runs the decoder stack in one launch but leaves the final
rms_norm + packed-unembed matmul + argmax as XLA glue (measured 0.33-0.43
ms/token on v5e — the unembed streams its 74MB/token at only ~170-220 GB/s
there) and pays a fixed ~1.3us per grid step across ~960 steps/token. This
kernel attacks both named levers of BENCH r3's decomposition:

1. TERMINAL LM_HEAD ROWS. The grid stays 2-D (L_rows, spl) — keeping index
   maps free of div/mod on the scalar core — but gains ceil((nv+1)/spl)
   extra layer rows after the last decoder layer. Step (L, 0) applies the
   final rms_norm and pre-permutes the hidden row; steps (L, 1..nv) stream
   the packed unembed in `tv`-lane tiles at megakernel bandwidth, write the
   logits tile, and fold a running (max, argmax) in SMEM; the last tile
   writes the decoded token id. No (L-1)*nv wasted steps — the phases exist
   only on the terminal rows. The decode loop then needs no out-of-kernel
   lm_head at all (just the embed-row gather for the next token).

2. FEWER OPERANDS, SWEPT TILES. The K and V caches merge into one
   [L,T,2,Hkv,D] array (+ merged scales), gate/up tiles interleave into one
   fetch, the four KV row/scale outputs merge to two, and — in the
   symmetric-grid case this fast path requires — the four dequant-bias
   tables are DROPPED entirely (bias = -zc*scale computed in-kernel from
   the streamed scales). Tile structure supports fetch-width multiples of
   the 512 compute subtile (MI_TKF/MI_TOF) and alternate MLP/lm tiles
   (MI_TIF/MI_TV), but the r4 on-chip sweep (exp_flat_sweep.py) showed
   SMALLER tiles win — grid-step count varied 2x across configs for <2%
   time change (the per-step fixed cost hypothesis is dead; the kernel is
   dequant-compute / pipeline-granularity bound), and oversized blocks
   (tkf=2048, tv=6400) collapse the VMEM pipeline (58-62 tok/s). Defaults:
   single-width fetch, ti=1024, tv=3200, flash block 256.

Scope: B=1 S=1 greedy decode, symmetric per-group packed int4/int8 weights
(all-layer-constant zero), packed lm_head, int8 KV cache. Anything else
falls back to model_fused + XLA lm_head. Numerics match the unfused path to
f32 tolerance; the argmax tie-break is first-index, matching jnp.argmax.

Role in the reference's terms: this is the decode inner loop MI-optimize
delegates to fastllm's C++ engine (/root/reference/examples/llama/
llama2_to_flm.py); the packed-unembed phase replaces the role of
QLinear.forward on the lm_head (/root/reference/mi_optimize/export/
qnn.py:123-157), fused TPU-native instead of dequantize-then-GEMM.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_fused import (
    CH,
    _onehot_rows,
    _perm_row,
    _planar_mat,
    _qdot,
    _rope_rows,
    _select_s,
)


def _pick_cn(n: int, cap: int = 1024) -> int:
    """Largest 128-aligned divisor of n that is <= cap (N-chunk width used to
    bound the f32 unpack transient of one _qdot call)."""
    best = 0
    for c in range(128, cap + 1, 128):
        if n % c == 0:
            best = c
    return best or n


def _pick_sub(n: int) -> int:
    """Compute-subtile width: largest of {512, 256, 128} dividing n."""
    for c in (512, 256, 128):
        if n % c == 0:
            return c
    return 0


def _pick_ti(inter: int) -> int:
    """MLP tile: the base stack's TIM tiling (1024), unless MI_TIF overrides
    with a tile reproducing the same padded width.

    The flat kernel reuses model_fused's stacked gate/up/down arrays, so its
    padded intermediate must equal the base stack's (TIM rule, MI_TIM env).
    Swept on-chip (r4, exp_flat_sweep.py): ti=1408 (8 steps/layer) measured
    150.0 vs ti=1024 (11 steps/layer) 153.1 tok/s — fewer, larger MLP steps
    LOSE; per-grid-step fixed cost is not the lever, pipeline granularity
    is. So the default stays 1024."""
    from .model_fused import TIM

    ti_base = int(os.environ.get("MI_TIM", 0)) or TIM
    base_ip = -(-inter // ti_base) * ti_base
    v = int(os.environ.get("MI_TIF", 0))
    if v and -(-inter // v) * v == base_ip and base_ip % v == 0:
        return v
    return ti_base


def _pick_tv(vocab: int, cap: int = 3328) -> int:
    """Largest 128-aligned divisor of the vocab <= cap (lm_head tile)."""
    v = int(os.environ.get("MI_TV", 0))
    if v and vocab % v == 0 and v % 128 == 0:
        return v
    best = 0
    for c in range(128, cap + 1, 128):
        if vocab % c == 0:
            best = c
    return best


def flat_tiles(cfg, vocab: int):
    """(tkf, tkc, tof, toc, ti, inter_p, tv) or None if shapes don't fit.

    tkf/tof are FETCH tiles (doubled when shapes allow), tkc/toc the compute
    subtiles the kernel loops inside one grid step. MI_TKF/MI_TOF/MI_TIF/
    MI_TV override (read at trace time — sweeps need a fresh process)."""
    h = cfg.hidden_size
    q_dim = cfg.num_heads * cfg.head_dim
    tkc, toc = _pick_sub(h), _pick_sub(q_dim)
    if not tkc or not toc:
        return None

    # swept on-chip (r4): double-width fetch (tkf=2c) measured 150.0 vs
    # single-width 151.6-153.1; quad-width (2048) thrashes the VMEM pipeline
    # catastrophically (57.5). Single-width is the default.
    def fetch(env, n, c):
        v = int(os.environ.get(env, 0))
        if v and n % v == 0 and v % c == 0:
            return v
        return c

    tkf = fetch("MI_TKF", h, tkc)
    tof = fetch("MI_TOF", q_dim, toc)
    ti = _pick_ti(cfg.intermediate_size)
    inter_p = -(-cfg.intermediate_size // ti) * ti
    tv = _pick_tv(vocab)
    if not tv:
        return None
    return tkf, tkc, tof, toc, ti, inter_p, tv


def _kernel_flat(
    # scalar prefetch
    pos_ref,
    # inputs
    x_ref, n1_ref, n2_ref,
    qkv_ref, qs_ref,
    cos_ref, sin_ref,
    ckv_ref, kvs_ref,
    o_ref_w, os_ref,
    gu_ref, gus_ref,
    d_ref, ds_ref,
    ue_ref, ues_ref, fn_ref,
    # outputs
    tok_ref, logit_ref, kvrow_ref, kvsc_ref,
    # scratch
    x_sc, qkv_acc, attn_sc, oacc_sc, xmid_sc, h2_sc, mlp_acc,
    q_sc, m_sc, l_sc, fa_sc, am_val, am_idx,
    *,
    bits, hidden, q_dim, kv_dim, inter,
    n_heads, n_kv_heads, head_dim, vocab,
    g_qkv, g_o, g_gu, g_d, g_ue,
    zc_qkv, zc_o, zc_gu, zc_d, zc_ue,
    nqf, nof, ni, nt, nv, tb, spl, n_layers,
    tkf, tkc, tof, toc, ti, tv,
    out_dtype, rms_eps,
):
    l = pl.program_id(0)
    jl = pl.program_id(1)
    L = n_layers
    vpw = 32 // bits
    n_qkv = q_dim + 2 * kv_dim
    reps = n_heads // n_kv_heads
    scale = 1.0 / float(np.sqrt(head_dim))
    subq, subo = tkf // tkc, tof // toc
    on_layer = l < L

    @pl.when((l == 0) & (jl == 0))
    def _():
        x_sc[:] = x_ref[:].astype(jnp.float32)

    # ---------------- phase 1: qkv_acc += h_subtile @ Wqkv_subtile
    @pl.when(on_layer & (jl < nqf))
    def _qkv():
        @pl.when(jl == 0)
        def _():
            qkv_acc[:] = jnp.zeros_like(qkv_acc)

        xf = x_sc[:]
        rstd = jax.lax.rsqrt(jnp.mean(xf * xf) + rms_eps)
        xr = xf.reshape(hidden // tkc, tkc)
        nr = n1_ref[:].reshape(hidden // tkc, tkc)
        cn = _pick_cn(n_qkv)
        for s in range(subq):
            gt = jl * subq + s              # global compute-subtile index
            oh = _onehot_rows(gt, 1, hidden // tkc)
            xt = jax.lax.dot_general(oh, xr, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            n1t = jax.lax.dot_general(oh, nr, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ht = (xt * rstd).astype(out_dtype)
            ht = (ht * n1t.astype(out_dtype)).astype(jnp.float32)
            hp = _perm_row(ht, vpw)
            sw, ge = _select_s(qs_ref[:][0], gt, tkc, g_qkv)
            zw = sw * (-zc_qkv)
            wrows = slice(s * (tkc // vpw), (s + 1) * (tkc // vpw))
            for c in range(n_qkv // cn):
                sl = slice(c * cn, (c + 1) * cn)
                qkv_acc[:, sl] += _qdot(hp, qkv_ref[:][0][wrows, sl],
                                        sw[:, sl], zw[:, sl], bits, ge, cn)

    # ---------------- phase 2a: rope + int8 KV row + flash init
    @pl.when(on_layer & (jl == nqf))
    def _attn_init():
        cos = cos_ref[:].astype(jnp.float32)
        sin = sin_ref[:].astype(jnp.float32)
        qkv = qkv_acc[:]
        q = _rope_rows(qkv[:, :q_dim].reshape(n_heads, head_dim), cos, sin)
        k = _rope_rows(
            qkv[:, q_dim:q_dim + kv_dim].reshape(n_kv_heads, head_dim),
            cos, sin)
        v = qkv[:, q_dim + kv_dim:].reshape(n_kv_heads, head_dim)

        k_amax = jnp.clip(jnp.abs(k).max(axis=-1, keepdims=True), 1e-8, None)
        v_amax = jnp.clip(jnp.abs(v).max(axis=-1, keepdims=True), 1e-8, None)
        k_s = k_amax / 127.0
        v_s = v_amax / 127.0
        k_q = jnp.clip(jnp.round(k / k_s), -127, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(v / v_s), -127, 127).astype(jnp.int8)
        kvrow_ref[0, 0] = k_q
        kvrow_ref[0, 1] = v_q
        kvsc_ref[0, 0] = k_s.reshape(1, -1)
        kvsc_ref[0, 1] = v_s.reshape(1, -1)

        q_sc[:] = q
        for hk in range(n_kv_heads):
            rows = slice(hk * reps, (hk + 1) * reps)
            kd = k_q[hk].astype(jnp.float32) * k_s[hk]
            vd = v_q[hk].astype(jnp.float32) * v_s[hk]
            s_new = (q[rows] * kd[None, :]).sum(-1, keepdims=True) * scale
            m_sc[rows] = jnp.broadcast_to(s_new, (reps, head_dim))
            l_sc[rows] = jnp.ones((reps, head_dim), jnp.float32)
            fa_sc[rows] = jnp.broadcast_to(vd[None, :], (reps, head_dim))

    # ---------------- phase 2b: flash over history blocks (merged K|V)
    @pl.when(on_layer & (jl > nqf) & (jl <= nqf + nt))
    def _attn_flash():
        pos = pos_ref[0]
        t = jl - (nqf + 1)

        @pl.when(t * tb < pos)
        def _():
            kv_blk = ckv_ref[:][0]                         # [tb, 2, Hkv, D]
            sc_blk = kvs_ref[:][0]                         # [tb, 2, Hkv]
            k_blk = kv_blk[:, 0].astype(jnp.float32) * sc_blk[:, 0][..., None]
            v_blk = kv_blk[:, 1].astype(jnp.float32) * sc_blk[:, 1][..., None]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
            hist = t * tb + lanes < pos
            for hk in range(n_kv_heads):
                rows = slice(hk * reps, (hk + 1) * reps)
                kh = k_blk[:, hk, :]
                vh = v_blk[:, hk, :]
                s = jax.lax.dot_general(q_sc[rows], kh,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ) * scale
                s = jnp.where(hist, s, jnp.finfo(jnp.float32).min)
                m_old = m_sc[rows][:, :1]
                m_new = jnp.maximum(m_old, s.max(axis=-1, keepdims=True))
                corr = jnp.exp(m_old - m_new)
                p = jnp.exp(s - m_new)
                pv = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                fa_sc[rows] = fa_sc[rows] * corr + pv
                l_sc[rows] = l_sc[rows] * corr + p.sum(axis=-1, keepdims=True)
                m_sc[rows] = jnp.broadcast_to(m_new, (reps, head_dim))

    # ---------------- phase 3: o_acc += attn_subtile @ Wo_subtile
    @pl.when(on_layer & (jl > nqf + nt) & (jl <= nqf + nt + nof))
    def _oproj():
        kt = jl - (nqf + nt + 1)

        @pl.when(kt == 0)
        def _():
            oacc_sc[:] = jnp.zeros_like(oacc_sc)
            out = fa_sc[:] / l_sc[:]
            flat = out.reshape(1, q_dim)
            pm = _planar_mat(toc, vpw)
            for r in range(q_dim // toc):
                attn_sc[r:r + 1, :] = jax.lax.dot_general(
                    flat[:, r * toc:(r + 1) * toc], pm,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        cn = _pick_cn(hidden)
        for s in range(subo):
            gt = kt * subo + s
            ap = jax.lax.dot_general(
                _onehot_rows(gt, 1, attn_sc.shape[0]), attn_sc[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            sw, ge = _select_s(os_ref[:][0], gt, toc, g_o)
            zw = sw * (-zc_o)
            wrows = slice(s * (toc // vpw), (s + 1) * (toc // vpw))
            for c in range(hidden // cn):
                sl = slice(c * cn, (c + 1) * cn)
                oacc_sc[:, sl] += _qdot(ap, o_ref_w[:][0][wrows, sl],
                                        sw[:, sl], zw[:, sl], bits, ge, cn)

    # ---------------- phase 4: MLP tiles; last one updates the residual
    @pl.when(on_layer & (jl > nqf + nt + nof) & (jl <= nqf + nt + nof + ni))
    def _mlp():
        m = jl - (nqf + nt + nof + 1)

        @pl.when(m == 0)
        def _():
            xmid = x_sc[:] + oacc_sc[:]
            xmid_sc[:] = xmid
            rstd2 = jax.lax.rsqrt(jnp.mean(xmid * xmid) + rms_eps)
            h2 = (xmid * rstd2).astype(out_dtype)
            n2 = n2_ref[:].reshape(1, hidden)
            h2 = (h2 * n2.astype(out_dtype)).astype(jnp.float32)
            pm = _planar_mat(CH, vpw)
            for r in range(hidden // CH):
                h2_sc[:, r * CH:(r + 1) * CH] = jax.lax.dot_general(
                    h2[:, r * CH:(r + 1) * CH], pm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            mlp_acc[:] = jnp.zeros_like(mlp_acc)

        # gate/up tiles are INTERLEAVED in one fetch: lanes [0,ti) gate,
        # [ti,2ti) up of this MLP tile
        g_eff = min(g_gu, CH)
        ngc = max(CH // g_gu, 1)
        chw = CH // vpw
        ngh = gus_ref.shape[1] // 2
        gate = jnp.zeros((1, ti), jnp.float32)
        up = jnp.zeros((1, ti), jnp.float32)
        for r in range(hidden // CH):
            hp_r = h2_sc[:, r * CH:(r + 1) * CH]
            rs = (r * CH) // g_gu
            rows = slice(r * chw, (r + 1) * chw)
            sg = gus_ref[:][0][rs:rs + ngc, :]
            gate += _qdot(hp_r, gu_ref[:][0][rows, :ti], sg,
                          sg * (-zc_gu), bits, g_eff, ti)
            su = gus_ref[:][0][ngh + rs:ngh + rs + ngc, :]
            up += _qdot(hp_r, gu_ref[:][0][rows, ti:], su,
                        su * (-zc_gu), bits, g_eff, ti)
        act = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

        ap = _perm_row(act, vpw)
        sd, ged = _select_s(ds_ref[:][0], m, ti, g_d)
        zd = sd * (-zc_d)
        cn = _pick_cn(hidden)
        for c in range(hidden // cn):
            sl = slice(c * cn, (c + 1) * cn)
            mlp_acc[:, sl] += _qdot(ap, d_ref[:][0][:, sl],
                                    sd[:, sl], zd[:, sl], bits, ged, cn)

        @pl.when(m == ni - 1)
        def _():
            x_sc[:] = xmid_sc[:] + mlp_acc[:]

    # ---------------- terminal rows: final rms_norm + lm_head + argmax
    lm_step = (l - L) * spl + jl

    @pl.when((l >= L) & (lm_step == 0))
    def _lm_prep():
        xf = x_sc[:]
        rstd = jax.lax.rsqrt(jnp.mean(xf * xf) + rms_eps)
        hh = (xf * rstd).astype(out_dtype)
        hh = (hh * fn_ref[:].astype(out_dtype)).astype(jnp.float32)
        pm = _planar_mat(CH, vpw)
        for r in range(hidden // CH):
            h2_sc[:, r * CH:(r + 1) * CH] = jax.lax.dot_general(
                hh[:, r * CH:(r + 1) * CH], pm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        am_val[0] = jnp.finfo(jnp.float32).min
        am_idx[0] = 0

    @pl.when((l >= L) & (lm_step >= 1) & (lm_step <= nv))
    def _lm_tile():
        t = lm_step - 1
        g_eff = min(g_ue, CH)
        ngc = max(CH // g_ue, 1)
        chw = CH // vpw
        cn = _pick_cn(tv)
        parts = []
        for c in range(tv // cn):
            sl = slice(c * cn, (c + 1) * cn)
            chunk = jnp.zeros((1, cn), jnp.float32)
            for r in range(hidden // CH):
                hp_r = h2_sc[:, r * CH:(r + 1) * CH]
                rs = (r * CH) // g_ue
                su = ues_ref[:][rs:rs + ngc, sl]
                rows = slice(r * chw, (r + 1) * chw)
                chunk += _qdot(hp_r, ue_ref[:][rows, sl], su,
                               su * (-zc_ue), bits, g_eff, cn)
            parts.append(chunk)
        acc = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        logit_ref[:] = acc

        lmax = jnp.max(acc)
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, tv), 1)
        lidx = jnp.min(jnp.where(acc == lmax, iot, vocab))
        better = lmax > am_val[0]
        am_val[0] = jnp.where(better, lmax, am_val[0])
        am_idx[0] = jnp.where(better, t * tv + lidx, am_idx[0])

        @pl.when(lm_step == nv)
        def _():
            tok_ref[:] = (jnp.zeros((1, 128), jnp.int32) + am_idx[0])


# ---------------------------------------------------------------------------
# stack / wrapper
# ---------------------------------------------------------------------------

def stack_flat_params(model, base_stack, base_meta):
    """Extend a model_fused stack for the flat kernel, or None.

    Requires every linear (incl. lm_head) on a symmetric grid (all-layer
    constant zero -> in-kernel bias, no streamed zero tables) and a packed
    lm_head. Returns (stack, meta) with meta = base bits/groups + the five
    zero consts + (g_ue, zc_ue) + vocab."""
    bits, g_qkv, g_o, g_gu, g_d, zc_qkv, zc_o, zc_gu, zc_d = base_meta
    if None in (zc_qkv, zc_o, zc_gu, zc_d):
        return None
    lm = model.params.get("lm_head")
    cfg = model.config
    if lm is None or getattr(lm, "packed", None) is None:
        return None
    s = lm.spec
    if s.wbit != bits or s.abit is not None or lm.bias is not None \
            or lm.smooth_factor is not None or lm.perm is not None:
        return None
    if s.w_qtype not in ("per_group", "per_channel"):
        return None
    g_ue = (s.w_groupsize if s.w_qtype == "per_group" and s.w_groupsize > 0
            else lm.in_features)
    vpw = 32 // bits
    if g_ue % vpw:
        return None
    tiles = flat_tiles(cfg, lm.out_features)
    if tiles is None:
        return None
    tkf, tkc, tof, toc, ti, inter_p, tv = tiles
    if inter_p != base_stack["gu"].shape[2] // 2:
        return None                      # padding mismatch with base stack
    for tile, g in ((tkc, g_qkv), (toc, g_o), (ti, g_d)):
        if not (tile % g == 0 or g % tile == 0):
            return None
    if cfg.hidden_size % g_gu or cfg.hidden_size % g_ue:
        return None

    # lm_head zero must be one constant (symmetric grid)
    from ..core.qparams import qrange

    from .block_fused import _pad_rows8, _scales_t

    z = np.asarray(jax.device_get(jnp.reshape(lm.w_zero, (-1,))[:1])[0])
    zall = bool(jax.device_get(jnp.all(jnp.reshape(lm.w_zero, (-1,))
                                       == jnp.reshape(lm.w_zero, (-1,))[0])))
    if not zall:
        return None
    zc_ue = float(z) - float(qrange(s.wbit, s.w_unsigned).qmin)

    ues, _, _ = _scales_t(lm)

    L = base_stack["n1"].shape[0]
    W = base_stack["gu"].shape[1]
    nmt = inter_p // ti
    gu_i = (base_stack["gu"].reshape(L, W, 2, nmt, ti)
            .transpose(0, 1, 3, 2, 4).reshape(L, W, 2 * inter_p))
    stack = {
        "qkv": base_stack["qkv"], "qs": base_stack["qs"],
        "o": base_stack["o"], "os": base_stack["os"],
        "gu": gu_i, "gus": base_stack["gus"],
        "d": base_stack["d"], "ds": base_stack["ds"],
        "n1": base_stack["n1"], "n2": base_stack["n2"],
        "ue": lm.packed,
        "ues": _pad_rows8(ues),
        "fnorm": jnp.reshape(model.params["final_norm"], (1, -1)),
    }
    meta = (bits, g_qkv, g_o, g_gu, g_d, zc_qkv, zc_o, zc_gu, zc_d,
            g_ue, zc_ue, lm.out_features)
    return stack, meta


@functools.partial(jax.jit, static_argnames=("cfg", "meta", "interpret"))
def model_decode_flat(stack, x, cossin, cache, pos, cfg, meta, interpret=False):
    """One decoded token, one launch: x [1,1,H] (embed row) ->
    (token [1,128] i32 — lane 0 is the greedy argmax, logits [1, V] f32,
    kvrows [L,2,Hkv,D] i8, kvscales [L,2,1,Hkv] f32).

    cache: merged dict {"kv": [L,T,2,Hkv,D] int8, "kv_scale": [L,T,2,Hkv]}.
    The caller scatters the rows (one dynamic_update_slice per field)."""
    (bits, g_qkv, g_o, g_gu, g_d, zc_qkv, zc_o, zc_gu, zc_d,
     g_ue, zc_ue, vocab) = meta
    h = cfg.hidden_size
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    vpw = 32 // bits
    L = cfg.num_layers
    Hkv, D = cfg.num_kv_heads, cfg.head_dim

    tkf, tkc, tof, toc, ti, inter_p, tv = flat_tiles(cfg, vocab)
    nqf, nof, ni, nv = h // tkf, q_dim // tof, inter_p // ti, vocab // tv
    max_len = cache["kv"].shape[1]
    tb = 256 if max_len % 256 == 0 else 128
    assert max_len % tb == 0
    nt = max_len // tb
    spl = nqf + 1 + nt + nof + ni
    Lx = -(-(nv + 1) // spl)            # terminal rows for lm_head phases
    grid = (L + Lx, spl)

    kern = functools.partial(
        _kernel_flat, bits=bits, hidden=h, q_dim=q_dim, kv_dim=kv_dim,
        inter=inter_p, n_heads=cfg.num_heads, n_kv_heads=Hkv, head_dim=D,
        vocab=vocab,
        g_qkv=g_qkv, g_o=g_o, g_gu=g_gu, g_d=g_d, g_ue=g_ue,
        zc_qkv=zc_qkv, zc_o=zc_o, zc_gu=zc_gu, zc_d=zc_d, zc_ue=zc_ue,
        nqf=nqf, nof=nof, ni=ni, nt=nt, nv=nv, tb=tb, spl=spl, n_layers=L,
        tkf=tkf, tkc=tkc, tof=tof, toc=toc, ti=ti, tv=tv,
        out_dtype=x.dtype, rms_eps=cfg.rms_eps,
    )

    # layer coordinate clamped to the last layer on terminal rows; tile
    # coordinates FREEZE at their end-of-layer value there so the terminal
    # rows trigger no weight refetches
    lc = lambda l: jnp.minimum(l, L - 1)
    t_qkv = lambda l, j, p: jnp.where(l < L, jnp.minimum(j, nqf - 1), nqf - 1)
    t_o = lambda l, j, p: jnp.where(
        l < L, jnp.clip(j - (nqf + nt + 1), 0, nof - 1), nof - 1)
    t_mlp = lambda l, j, p: jnp.where(
        l < L, jnp.clip(j - (nqf + nt + nof + 1), 0, ni - 1), ni - 1)
    last_kv = lambda p: jnp.minimum(p[0] // tb, nt - 1)
    t_kv = lambda l, j, p: jnp.where(
        l < L, jnp.minimum(jnp.clip(j - (nqf + 1), 0, nt - 1), p[0] // tb),
        last_kv(p))
    t_lm = lambda l, j, p: jnp.clip((l - L) * spl + j - 1, 0, nv - 1)

    def sspec(arr, tkfetch, tilef, g):
        n = max(tkfetch // g, 1)
        if n >= 8 and n % 8 == 0 and arr.shape[1] % n == 0:
            return pl.BlockSpec((1, n, arr.shape[2]),
                                lambda l, j, p: (lc(l), tilef(l, j, p), 0))
        if n < 8:
            return pl.BlockSpec(
                (1, 8, arr.shape[2]),
                lambda l, j, p: (lc(l), ((tilef(l, j, p) * tkfetch) // g) // 8,
                                 0))
        # tile rows not 8-aligned (e.g. ti=1408/g=128 -> 11): stream the
        # whole per-layer table once (identical bytes — every scale row is
        # read exactly once per token either way); _select_s's one-hot picks
        # the tile's rows in-kernel
        return pl.BlockSpec((1, arr.shape[1], arr.shape[2]),
                            lambda l, j, p: (lc(l), 0, 0))

    n_qkv = q_dim + 2 * kv_dim
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h), lambda l, j, p: (0, 0)),                 # x
            pl.BlockSpec((1, 1, h), lambda l, j, p: (lc(l), 0, 0)),       # n1
            pl.BlockSpec((1, 1, h), lambda l, j, p: (lc(l), 0, 0)),       # n2
            pl.BlockSpec((1, tkf // vpw, n_qkv),
                         lambda l, j, p: (lc(l), t_qkv(l, j, p), 0)),     # qkv
            sspec(stack["qs"], tkf, t_qkv, g_qkv),
            pl.BlockSpec((1, D), lambda l, j, p: (0, 0)),                 # cos
            pl.BlockSpec((1, D), lambda l, j, p: (0, 0)),                 # sin
            pl.BlockSpec((1, tb, 2, Hkv, D),
                         lambda l, j, p: (lc(l), t_kv(l, j, p), 0, 0, 0)),
            pl.BlockSpec((1, tb, 2, Hkv),
                         lambda l, j, p: (lc(l), t_kv(l, j, p), 0, 0)),
            pl.BlockSpec((1, tof // vpw, h),
                         lambda l, j, p: (lc(l), t_o(l, j, p), 0)),       # o
            sspec(stack["os"], tof, t_o, g_o),
            pl.BlockSpec((1, h // vpw, 2 * ti),
                         lambda l, j, p: (lc(l), 0, t_mlp(l, j, p))),     # gu
            pl.BlockSpec((1, stack["gus"].shape[1], ti),
                         lambda l, j, p: (lc(l), 0, t_mlp(l, j, p))),
            pl.BlockSpec((1, ti // vpw, h),
                         lambda l, j, p: (lc(l), t_mlp(l, j, p), 0)),     # down
            sspec(stack["ds"], ti, t_mlp, g_d),
            pl.BlockSpec((h // vpw, tv),
                         lambda l, j, p: (0, t_lm(l, j, p))),             # ue
            pl.BlockSpec((stack["ues"].shape[0], tv),
                         lambda l, j, p: (0, t_lm(l, j, p))),
            pl.BlockSpec((1, h), lambda l, j, p: (0, 0)),                 # fnorm
        ],
        out_specs=[
            pl.BlockSpec((1, 128), lambda l, j, p: (0, 0)),               # token
            pl.BlockSpec((1, tv), lambda l, j, p: (0, t_lm(l, j, p))),    # logits
            pl.BlockSpec((1, 2, Hkv, D), lambda l, j, p: (lc(l), 0, 0, 0)),
            pl.BlockSpec((1, 2, 1, Hkv), lambda l, j, p: (lc(l), 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),             # residual stream
            pltpu.VMEM((1, n_qkv), jnp.float32),
            pltpu.VMEM((q_dim // toc, toc), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((cfg.num_heads, D), jnp.float32),
            pltpu.VMEM((cfg.num_heads, D), jnp.float32),
            pltpu.VMEM((cfg.num_heads, D), jnp.float32),
            pltpu.VMEM((cfg.num_heads, D), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),               # running max
            pltpu.SMEM((1,), jnp.int32),                 # running argmax
        ],
    )

    pos_arr = jnp.reshape(pos, (1,)).astype(jnp.int32)
    tok, logits, kvrows, kvsc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, vocab), jnp.float32),
            jax.ShapeDtypeStruct((L, 2, Hkv, D), jnp.int8),
            jax.ShapeDtypeStruct((L, 2, 1, Hkv), jnp.float32),
        ],
        interpret=interpret,
        # double-width fetch blocks + the resident lm_head tile buffers need
        # more scoped VMEM than model_fused's 64MB (v5e has 128MB/core)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
    )(
        pos_arr,
        x.reshape(1, h), stack["n1"], stack["n2"],
        stack["qkv"], stack["qs"],
        cossin.reshape(1, 2 * D)[:, :D], cossin.reshape(1, 2 * D)[:, D:],
        cache["kv"], cache["kv_scale"],
        stack["o"], stack["os"],
        stack["gu"], stack["gus"],
        stack["d"], stack["ds"],
        stack["ue"], stack["ues"], stack["fnorm"],
    )
    return tok, logits, kvrows, kvsc
