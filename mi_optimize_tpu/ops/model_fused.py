"""Whole-model decode megakernel: ALL decoder layers in ONE Pallas launch.

ops/block_fused.py cut per-token launches from ~4/layer to 1/layer (24 ->
~100 tok/s measured). The remaining fixed cost is 32 kernel launches +
inter-kernel XLA glue per token. Here the per-layer weights are stacked along
a leading [L, ...] axis and the grid becomes L x steps-per-layer: the layer
index is `j // SPL`, every BlockSpec gains a leading layer coordinate, and
the residual stream lives in VMEM scratch across all layers — one
`pallas_call` per decoded token (plus the lm_head).

Phase structure per layer (identical math to block_fused._kernel, which
remains the reference implementation for tests and the per-layer fallback):

    jl in [0, nq)            K-tiled  h = rmsnorm(x); qkv_acc += h_t @ Wqkv_t
    jl == nq                 rope -> int8 KV row out -> flash-state init
    jl in (nq, nq+nt]        flash attention over [tb]-token history blocks
                             (live-prefix clamp: dead blocks are never fetched)
    jl in (nq+nt, +no]       K-tiled o_acc += attn_t @ Wo_t (finalize at kt==0)
    jl in (nq+nt+no, +ni]    x_mid = x + o_acc; tiled SwiGLU; last: x updated

The KV caches are consumed read-only as [L, T, H, D] stacks; the kernel
emits [L, H, D] new-row stacks which the caller scatters in one
dynamic_update_slice per field. Scope: B=1 S=1 decode, int8 cache, packed
int4/int8 per-group/per-channel weights, homogeneous layer shapes.

Role in the reference's terms: this kernel IS the serving engine's decoder —
what MI-optimize delegates to fastllm's C++ runtime via .flm export
(/root/reference/examples/llama/llama2_to_flm.py), built TPU-native instead.
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
    _planar_mat,
    _perm_row,
    _qdot,
    _rope_rows,
    _select_s,
    _select_sz,
    block_mega_supported,
    prepare_block,
)

# The whole-model kernel picks its own (larger) tiles than block_fused: with
# every layer in one launch, total grid steps = L * steps-per-layer and the
# fixed ~1.3us/step cost dominates — fewer, bigger tiles win as long as the
# double-buffered blocks fit the (raised) scoped-VMEM budget. The MLP
# intermediate dim is zero-PADDED to a TIM multiple (gate/up scale lanes
# padded with 0 -> act==0 there -> padded down-proj rows contribute nothing),
# trading ~2% extra weight traffic for ~2x fewer MLP grid steps.
TIM = 1024  # model-kernel MLP intermediate tile
# On-chip sweep (7B int4, v5e, tok/s): (tka,to,ti)=(512,512,256) 109.4;
# (1024,1024,512) 97.6; (512,512,512) 113.6; (512,512,1024) 117.5.


def _pick_tile(n: int) -> int:
    """Largest lane-aligned tile in {512,256,128} dividing n (0 if none).

    1024 measured SLOWER on v5e despite halving grid steps (97.6 vs 113.6
    tok/s on 7B int4): the [1024,1024] f32 unpack/permute transients in the
    qkv/o phases blow past the VPU-friendly working set."""
    for c in (512, 256, 128):
        if n % c == 0:
            return c
    return 0


def _model_tiles(cfg):
    """(tka, to, ti, inter_padded) for the whole-model kernel.

    MI_TKA/MI_TO/MI_TIM env vars override the defaults (on-chip sweeps)."""
    import os

    h = cfg.hidden_size
    q_dim = cfg.num_heads * cfg.head_dim

    def pick(env, n, default):
        v = int(os.environ.get(env, 0))
        return v if v and n % v == 0 else default

    tka = pick("MI_TKA", h, _pick_tile(h))
    to = pick("MI_TO", q_dim, _pick_tile(q_dim))
    ti = int(os.environ.get("MI_TIM", 0)) or TIM
    inter_p = -(-cfg.intermediate_size // ti) * ti
    return tka, to, ti, inter_p


def _kernel(
    # scalar prefetch
    pos_ref,
    # inputs (stacked along L where per-layer)
    x_ref, n1_ref,
    qkv_ref, qs_ref, qz_ref,
    cos_ref, sin_ref,
    ck_ref, cv_ref, ks_ref, vs_ref,
    o_ref_w, os_ref, oz_ref,
    n2_ref,
    g_ref, u_ref, gus_ref, guz_ref,
    d_ref, ds_ref, dz_ref,
    # outputs
    xo_ref, krow_ref, vrow_ref, ksrow_ref, vsrow_ref,
    # scratch
    x_sc, qkv_acc, attn_sc, oacc_sc, xmid_sc, h2_sc, mlp_acc,
    q_sc, m_sc, l_sc, fa_sc,
    *,
    bits, hidden, q_dim, kv_dim, inter,
    n_heads, n_kv_heads, head_dim,
    g_qkv, g_o, g_gu, g_d, nq, no, ni, nt, tb, spl, n_layers,
    tka, to_, ti,
    out_dtype, rms_eps,
    zc_qkv, zc_o, zc_gu, zc_d,
):
    l = pl.program_id(0)
    jl = pl.program_id(1)   # step within the current layer (2-D grid: no
    vpw = 32 // bits        # div/mod on the scalar core per index map)
    n_qkv = q_dim + 2 * kv_dim
    reps = n_heads // n_kv_heads
    scale = 1.0 / float(np.sqrt(head_dim))

    # ---------------- residual stream init (once per token)
    @pl.when((l == 0) & (jl == 0))
    def _():
        x_sc[:] = x_ref[:].astype(jnp.float32)

    # ---------------- phase 1: qkv_acc += h_tile @ Wqkv_tile
    @pl.when(jl < nq)
    def _qkv():
        @pl.when(jl == 0)
        def _():
            qkv_acc[:] = jnp.zeros_like(qkv_acc)

        xf = x_sc[:]
        rstd = jax.lax.rsqrt(jnp.mean(xf * xf) + rms_eps)
        # tile jl of x / norm weights via row-fold + one-hot (no lane slicing)
        xr = xf.reshape(hidden // tka, tka)
        nr = n1_ref[:].reshape(hidden // tka, tka)
        oh = _onehot_rows(jl, 1, hidden // tka)
        xt = jax.lax.dot_general(oh, xr, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        n1t = jax.lax.dot_general(oh, nr, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ht = (xt * rstd).astype(out_dtype)
        ht = (ht * n1t.astype(out_dtype)).astype(jnp.float32)   # [1, tka]
        hp = _perm_row(ht, vpw)
        # constant-zero grids (symmetric quant) skip the bias-table read: the
        # dequant bias is -(zero-qmin)*scale with a compile-time zero
        if zc_qkv is None:
            s, z, ge = _select_sz(qs_ref[:][0], qz_ref[:][0], jl, tka, g_qkv)
        else:
            s, ge = _select_s(qs_ref[:][0], jl, tka, g_qkv)
            z = s * (-zc_qkv)
        cn = 1024 if n_qkv % 1024 == 0 else n_qkv
        for c in range(n_qkv // cn):
            sl = slice(c * cn, (c + 1) * cn)
            qkv_acc[:, sl] += _qdot(hp, qkv_ref[:][0][:, sl],
                                    s[:, sl], z[:, sl], bits, ge, cn)

    # ---------------- phase 2a: rope + int8 KV row + flash init
    @pl.when(jl == nq)
    def _attn_init():
        cos = cos_ref[:].astype(jnp.float32)
        sin = sin_ref[:].astype(jnp.float32)
        qkv = qkv_acc[:]
        q = _rope_rows(qkv[:, :q_dim].reshape(n_heads, head_dim), cos, sin)
        k = _rope_rows(qkv[:, q_dim:q_dim + kv_dim].reshape(n_kv_heads, head_dim),
                       cos, sin)
        v = qkv[:, q_dim + kv_dim:].reshape(n_kv_heads, head_dim)

        k_amax = jnp.clip(jnp.abs(k).max(axis=-1, keepdims=True), 1e-8, None)
        v_amax = jnp.clip(jnp.abs(v).max(axis=-1, keepdims=True), 1e-8, None)
        k_s = k_amax / 127.0
        v_s = v_amax / 127.0
        k_q = jnp.clip(jnp.round(k / k_s), -127, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(v / v_s), -127, 127).astype(jnp.int8)
        krow_ref[:] = k_q[None]
        vrow_ref[:] = v_q[None]
        ksrow_ref[:] = k_s.reshape(1, 1, -1)
        vsrow_ref[:] = v_s.reshape(1, 1, -1)

        q_sc[:] = q
        for hk in range(n_kv_heads):
            rows = slice(hk * reps, (hk + 1) * reps)
            kd = k_q[hk].astype(jnp.float32) * k_s[hk]
            vd = v_q[hk].astype(jnp.float32) * v_s[hk]
            s_new = (q[rows] * kd[None, :]).sum(-1, keepdims=True) * scale
            m_sc[rows] = jnp.broadcast_to(s_new, (reps, head_dim))
            l_sc[rows] = jnp.ones((reps, head_dim), jnp.float32)
            fa_sc[rows] = jnp.broadcast_to(vd[None, :], (reps, head_dim))

    # ---------------- phase 2b: flash over history blocks
    @pl.when((jl > nq) & (jl <= nq + nt))
    def _attn_flash():
        pos = pos_ref[0]
        t = jl - (nq + 1)

        @pl.when(t * tb < pos)
        def _():
            k_blk = ck_ref[:][0].astype(jnp.float32) * ks_ref[:][0][..., None]
            v_blk = cv_ref[:][0].astype(jnp.float32) * vs_ref[:][0][..., None]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
            hist = t * tb + lanes < pos
            for hk in range(n_kv_heads):
                rows = slice(hk * reps, (hk + 1) * reps)
                kh = k_blk[:, hk, :]
                vh = v_blk[:, hk, :]
                s = jax.lax.dot_general(q_sc[rows], kh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
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

    # ---------------- phase 3: o_acc += attn_t @ Wo_t
    @pl.when((jl > nq + nt) & (jl <= nq + nt + no))
    def _oproj():
        kt = jl - (nq + nt + 1)

        @pl.when(kt == 0)
        def _():
            oacc_sc[:] = jnp.zeros_like(oacc_sc)
            out = fa_sc[:] / l_sc[:]
            flat = out.reshape(1, q_dim)
            pm = _planar_mat(to_, vpw)
            for r in range(q_dim // to_):
                attn_sc[r:r + 1, :] = jax.lax.dot_general(
                    flat[:, r * to_:(r + 1) * to_], pm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        ap = jax.lax.dot_general(_onehot_rows(kt, 1, attn_sc.shape[0]), attn_sc[:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if zc_o is None:
            s, z, ge = _select_sz(os_ref[:][0], oz_ref[:][0], kt, to_, g_o)
        else:
            s, ge = _select_s(os_ref[:][0], kt, to_, g_o)
            z = s * (-zc_o)
        cn = 1024 if hidden % 1024 == 0 else hidden
        for c in range(hidden // cn):
            sl = slice(c * cn, (c + 1) * cn)
            oacc_sc[:, sl] += _qdot(ap, o_ref_w[:][0][:, sl],
                                    s[:, sl], z[:, sl], bits, ge, cn)

    # ---------------- phase 4: MLP tiles; last step updates the residual
    @pl.when(jl > nq + nt + no)
    def _mlp():
        m = jl - (nq + nt + no + 1)

        @pl.when(m == 0)
        def _():
            xmid = x_sc[:] + oacc_sc[:]
            xmid_sc[:] = xmid
            rstd2 = jax.lax.rsqrt(jnp.mean(xmid * xmid) + rms_eps)
            h2 = (xmid * rstd2).astype(out_dtype)
            h2 = (h2 * n2_ref[:].reshape(1, hidden).astype(out_dtype)).astype(jnp.float32)
            pm = _planar_mat(CH, vpw)
            for r in range(hidden // CH):
                h2_sc[:, r * CH:(r + 1) * CH] = jax.lax.dot_general(
                    h2[:, r * CH:(r + 1) * CH], pm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            mlp_acc[:] = jnp.zeros_like(mlp_acc)

        ngh = max(hidden // g_gu, 1)
        g_eff = min(g_gu, CH)
        ngc = max(CH // g_gu, 1)
        chw = CH // vpw
        gate = jnp.zeros((1, ti), jnp.float32)
        up = jnp.zeros((1, ti), jnp.float32)
        def gu_sb(rows):
            s_ = gus_ref[:][0][rows, :]
            if zc_gu is None:
                return s_, guz_ref[:][0][rows, :]
            return s_, s_ * (-zc_gu)

        for r in range(hidden // CH):
            hp_r = h2_sc[:, r * CH:(r + 1) * CH]
            rs = (r * CH) // g_gu
            rows = slice(r * chw, (r + 1) * chw)
            sg, bg = gu_sb(slice(rs, rs + ngc))
            gate += _qdot(hp_r, g_ref[:][0][rows, :], sg, bg, bits, g_eff, ti)
            su, bu = gu_sb(slice(ngh + rs, ngh + rs + ngc))
            up += _qdot(hp_r, u_ref[:][0][rows, :], su, bu, bits, g_eff, ti)
        act = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

        ap = _perm_row(act, vpw)
        if zc_d is None:
            sd, zd, ged = _select_sz(ds_ref[:][0], dz_ref[:][0], m, ti, g_d)
        else:
            sd, ged = _select_s(ds_ref[:][0], m, ti, g_d)
            zd = sd * (-zc_d)
        cn = 1024 if hidden % 1024 == 0 else hidden
        for c in range(hidden // cn):
            sl = slice(c * cn, (c + 1) * cn)
            mlp_acc[:, sl] += _qdot(ap, d_ref[:][0][:, sl],
                                    sd[:, sl], zd[:, sl], bits, ged, cn)

        @pl.when(m == ni - 1)
        def _():
            x_new = xmid_sc[:] + mlp_acc[:]
            x_sc[:] = x_new

            @pl.when(l == n_layers - 1)
            def _():
                xo_ref[:] = x_new.astype(xo_ref.dtype)


# ---------------------------------------------------------------------------
# preparation / wrapper
# ---------------------------------------------------------------------------

def stack_decode_params(model) -> Dict[str, Any]:
    """Stack per-layer serving params (fuse_for_serving output with
    blk["mega"] prepared) into [L, ...] arrays for the whole-model kernel.

    Homogeneous layer shapes/specs required (true for the llama family).
    The MLP intermediate axis is padded from `inter` to a TIM multiple:
    gate/up packed lanes and their scale lanes are zero-padded (zero scale
    -> act == 0 there), down-proj packed rows are zero-padded, and the
    down scale rows are extended by replication (their values are masked
    by act == 0)."""
    layers = model.params["layers"]
    if not layers or any("mega" not in b for b in layers):
        return None
    cfg = model.config
    if len({b["qkv_proj"].spec.wbit for b in layers}) != 1:
        return None
    tka, to, ti, inter_p = _model_tiles(cfg)
    if not tka or not to:
        return None
    inter = cfg.intermediate_size
    vpw = 32 // layers[0]["qkv_proj"].spec.wbit

    def pad_gu_packed(p):  # [h//vpw, 2*inter] -> [h//vpw, 2*inter_p]
        if inter_p == inter:
            return p
        z = jnp.zeros((p.shape[0], inter_p - inter), p.dtype)
        return jnp.concatenate([p[:, :inter], z, p[:, inter:], z], axis=1)

    def pad_gu_scale(a):  # [2*ngh rows, inter] (gate rows over up rows) -> lanes inter_p
        if inter_p == inter:
            return a
        return jnp.pad(a, ((0, 0), (0, inter_p - inter)))

    def pad_d_packed(p):  # [inter//vpw, h] -> [inter_p//vpw, h]
        if inter_p == inter:
            return p
        return jnp.pad(p, ((0, (inter_p - inter) // vpw), (0, 0)))

    def pad_d_scale(a):  # rows must cover inter_p//g (values masked by act==0)
        need = -(-(inter_p // max(_grp_of(layers[0]["down_proj"]), 1)) // 8) * 8
        if a.shape[0] >= need:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (need - a.shape[0],) + a.shape[1:])], 0)

    def stk(fn):
        return jnp.stack([fn(b) for b in layers])

    try:
        return {
            "n1": stk(lambda b: b["input_norm"].reshape(1, -1)),
            "n2": stk(lambda b: b["post_norm"].reshape(1, -1)),
            "qkv": stk(lambda b: b["qkv_proj"].packed),
            "qs": stk(lambda b: b["mega"]["qs"]),
            "qz": stk(lambda b: b["mega"]["qz"]),
            "o": stk(lambda b: b["o_proj"].packed),
            "os": stk(lambda b: b["mega"]["os"]),
            "oz": stk(lambda b: b["mega"]["oz"]),
            "gu": stk(lambda b: pad_gu_packed(b["gateup_proj"].packed)),
            "gus": stk(lambda b: pad_gu_scale(b["mega"]["gus"])),
            "guz": stk(lambda b: pad_gu_scale(b["mega"]["guz"])),
            "d": stk(lambda b: pad_d_packed(b["down_proj"].packed)),
            "ds": stk(lambda b: pad_d_scale(b["mega"]["ds"])),
            "dz": stk(lambda b: pad_d_scale(b["mega"]["dz"])),
        }
    except (KeyError, TypeError):
        return None


def _grp_of(lin):
    s = lin.spec
    return s.w_groupsize if s.w_qtype == "per_group" and s.w_groupsize > 0 else lin.in_features


@functools.partial(jax.jit, static_argnames=("cfg", "meta", "interpret"))
def model_decode_mega(stack, x, cos, sin, cache, pos, cfg, meta, interpret=False):
    """All layers, one Pallas launch. x [1,1,H] -> (x_out [1,1,H], kv rows).

    cache: stacked dict {"k": [L,T,Hkv,D] int8, "v": ..., "k_scale": [L,T,Hkv],
    "v_scale": ...}. Returns (x_out, krows [L,Hkv,D], vrows, ksr [L,Hkv], vsr);
    the caller scatters the rows (one dynamic_update_slice per field).
    meta: hashable tuple (bits, g_qkv, g_o, g_gu, g_d, zc_qkv, zc_o, zc_gu,
    zc_d); each zc is the constant (zero - qmin) of a symmetric grid, or None.
    A non-None zc freezes that bias table's index map — its ~weights/groupsize
    f32 lanes (≈200MB/token on 7B g128) are never streamed.
    """
    bits, g_qkv, g_o, g_gu, g_d, zc_qkv, zc_o, zc_gu, zc_d = meta
    h = cfg.hidden_size
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    vpw = 32 // bits
    L = cfg.num_layers

    tka, to_, ti, inter_p = _model_tiles(cfg)
    nq, no, ni = h // tka, q_dim // to_, inter_p // ti
    max_len = cache["k"].shape[1]
    # adaptive flash block (see block_fused.block_decode_mega)
    tb = 256 if (max_len % 256 == 0 and max_len >= 1024) else 128
    assert max_len % tb == 0
    nt = max_len // tb
    spl = nq + 1 + nt + no + ni
    grid = (L, spl)

    x_row = x.reshape(1, h)

    kern = functools.partial(
        _kernel, bits=bits, hidden=h, q_dim=q_dim, kv_dim=kv_dim, inter=inter_p,
        n_heads=cfg.num_heads, n_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        g_qkv=g_qkv, g_o=g_o, g_gu=g_gu, g_d=g_d,
        nq=nq, no=no, ni=ni, nt=nt, tb=tb, spl=spl, n_layers=L,
        tka=tka, to_=to_, ti=ti,
        out_dtype=x.dtype, rms_eps=cfg.rms_eps,
        zc_qkv=zc_qkv, zc_o=zc_o, zc_gu=zc_gu, zc_d=zc_d,
    )

    t_qkv = lambda l, j, p: jnp.minimum(j, nq - 1)
    t_o = lambda l, j, p: jnp.clip(j - (nq + nt + 1), 0, no - 1)
    t_mlp = lambda l, j, p: jnp.clip(j - (nq + nt + no + 1), 0, ni - 1)
    t_kv = lambda l, j, p: jnp.minimum(jnp.clip(j - (nq + 1), 0, nt - 1),
                                       p[0] // tb)

    def sspec(arr, tk, g, tile_of, frozen=False):
        n = max(tk // g, 1)
        rows = n if n >= 8 else 8
        if frozen:  # constant-zero: one block fetched once, never re-read
            return pl.BlockSpec((1, rows, arr.shape[2]),
                                lambda l, j, p: (0, 0, 0))
        if n >= 8:
            return pl.BlockSpec((1, rows, arr.shape[2]),
                                lambda l, j, p: (l, tile_of(l, j, p), 0))
        return pl.BlockSpec(
            (1, rows, arr.shape[2]),
            lambda l, j, p: (l, ((tile_of(l, j, p) * tk) // g) // 8, 0))

    n_qkv = q_dim + 2 * kv_dim
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h), lambda l, j, p: (0, 0)),                  # x
            pl.BlockSpec((1, 1, h), lambda l, j, p: (l, 0, 0)),            # n1
            pl.BlockSpec((1, tka // vpw, n_qkv),
                         lambda l, j, p: (l, t_qkv(l, j, p), 0)),          # qkv
            sspec(stack["qs"], tka, g_qkv, t_qkv),
            sspec(stack["qz"], tka, g_qkv, t_qkv, frozen=zc_qkv is not None),
            pl.BlockSpec((1, cfg.head_dim), lambda l, j, p: (0, 0)),       # cos
            pl.BlockSpec((1, cfg.head_dim), lambda l, j, p: (0, 0)),       # sin
            pl.BlockSpec((1, tb, cfg.num_kv_heads, cfg.head_dim),
                         lambda l, j, p: (l, t_kv(l, j, p), 0, 0)),        # ck
            pl.BlockSpec((1, tb, cfg.num_kv_heads, cfg.head_dim),
                         lambda l, j, p: (l, t_kv(l, j, p), 0, 0)),        # cv
            pl.BlockSpec((1, tb, cfg.num_kv_heads),
                         lambda l, j, p: (l, t_kv(l, j, p), 0)),
            pl.BlockSpec((1, tb, cfg.num_kv_heads),
                         lambda l, j, p: (l, t_kv(l, j, p), 0)),
            pl.BlockSpec((1, to_ // vpw, h),
                         lambda l, j, p: (l, t_o(l, j, p), 0)),            # o
            sspec(stack["os"], to_, g_o, t_o),
            sspec(stack["oz"], to_, g_o, t_o, frozen=zc_o is not None),
            pl.BlockSpec((1, 1, h), lambda l, j, p: (l, 0, 0)),            # n2
            pl.BlockSpec((1, h // vpw, ti),
                         lambda l, j, p: (l, 0, t_mlp(l, j, p))),          # gate
            pl.BlockSpec((1, h // vpw, ti),
                         lambda l, j, p: (l, 0, ni + t_mlp(l, j, p))),     # up
            pl.BlockSpec((1, stack["gus"].shape[1], ti),
                         lambda l, j, p: (l, 0, t_mlp(l, j, p))),
            pl.BlockSpec((1, stack["guz"].shape[1], ti),
                         (lambda l, j, p: (0, 0, 0)) if zc_gu is not None
                         else (lambda l, j, p: (l, 0, t_mlp(l, j, p)))),
            pl.BlockSpec((1, ti // vpw, h),
                         lambda l, j, p: (l, t_mlp(l, j, p), 0)),          # down
            sspec(stack["ds"], ti, g_d, t_mlp),
            sspec(stack["dz"], ti, g_d, t_mlp, frozen=zc_d is not None),
        ],
        out_specs=[
            pl.BlockSpec((1, h), lambda l, j, p: (0, 0)),                  # x_out
            pl.BlockSpec((1, cfg.num_kv_heads, cfg.head_dim),
                         lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, cfg.num_kv_heads, cfg.head_dim),
                         lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, 1, cfg.num_kv_heads), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, 1, cfg.num_kv_heads), lambda l, j, p: (l, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),             # residual stream
            pltpu.VMEM((1, n_qkv), jnp.float32),
            pltpu.VMEM((q_dim // to_, to_), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((cfg.num_heads, cfg.head_dim), jnp.float32),
            pltpu.VMEM((cfg.num_heads, cfg.head_dim), jnp.float32),
            pltpu.VMEM((cfg.num_heads, cfg.head_dim), jnp.float32),
            pltpu.VMEM((cfg.num_heads, cfg.head_dim), jnp.float32),
        ],
    )

    pos_arr = jnp.reshape(pos, (1,)).astype(jnp.int32)
    x_out, krows, vrows, ksr, vsr = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, h), x.dtype),
            jax.ShapeDtypeStruct((L, cfg.num_kv_heads, cfg.head_dim), jnp.int8),
            jax.ShapeDtypeStruct((L, cfg.num_kv_heads, cfg.head_dim), jnp.int8),
            jax.ShapeDtypeStruct((L, 1, cfg.num_kv_heads), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, cfg.num_kv_heads), jnp.float32),
        ],
        interpret=interpret,
        # the retuned tiles (tka/to up to 1024) need >16MB of scoped VMEM for
        # the double-buffered streamed blocks; the 16MB default is just a
        # compiler guard rail (v5e has 128MB VMEM/core)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(
        pos_arr,
        x_row, stack["n1"],
        stack["qkv"], stack["qs"], stack["qz"],
        cos.reshape(1, cfg.head_dim), sin.reshape(1, cfg.head_dim),
        cache["k"], cache["v"], cache["k_scale"], cache["v_scale"],
        stack["o"], stack["os"], stack["oz"],
        stack["n2"],
        stack["gu"], stack["gu"], stack["gus"], stack["guz"],
        stack["d"], stack["ds"], stack["dz"],
    )
    return x_out.reshape(x.shape), krows, vrows, ksr[:, 0], vsr[:, 0]


# ---------------------------------------------------------------------------
# batched (B-slot) whole-model decode kernel — continuous batching fast path
# ---------------------------------------------------------------------------
#
# The B=1 kernel above is the single-stream headline path; this variant decodes
# B slots (one token each, independent positions) in the SAME launch, streaming
# every weight block ONCE for all slots — the weight traffic that bounds decode
# is amortized B-fold, so aggregate tokens/s approaches B x single-stream until
# attention (per-slot KV reads) takes over.
#
# Differences from the B=1 kernel:
#   * x / residual / accumulators carry B rows; matmul phases are unchanged
#     dots with B-row lhs (the MXU is happier, if anything)
#   * the flash phase is SLOT-MAJOR: B*nt grid steps, step -> (slot, t-block);
#     per-slot live-prefix clamping via the prefetched positions vector
#   * the KV cache is stored HEAD-TRANSPOSED [L, B, Hkv, T, D] so the per-slot
#     block arrives as [Hkv, tb, D] and attention runs as ONE kv-head-batched
#     dot_general instead of a python loop over heads
#   * rope/init/softmax state updates are head-vectorized per slot (the
#     kv->q head expansion rides an iota one-hot matmul)


def _expand_mat(n_heads, n_kv_heads):
    """[Hq, Hkv] 0/1 matrix with E[i, j] = (j == i // reps): E @ kv rows
    repeats each kv head's row across its query-head group."""
    reps = n_heads // n_kv_heads
    r = jax.lax.broadcasted_iota(jnp.int32, (n_heads, n_kv_heads), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_heads, n_kv_heads), 1)
    return (c == r // reps).astype(jnp.float32)


def _slot_rows(jl, bsz, per, total):
    """[bsz, total] one-hot selecting rows b*per + jl for each slot b."""
    r = jax.lax.broadcasted_iota(jnp.int32, (bsz, total), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bsz, total), 1)
    return (c == r * per + jl).astype(jnp.float32)


def _kernel_b(
    # scalar prefetch: positions [B]
    pos_ref,
    # inputs (stacked along L where per-layer)
    x_ref, n1_ref,
    qkv_ref, qs_ref, qz_ref,
    cos_ref, sin_ref,
    ck_ref, cv_ref, ks_ref, vs_ref,
    o_ref_w, os_ref, oz_ref,
    n2_ref,
    g_ref, u_ref, gus_ref, guz_ref,
    d_ref, ds_ref, dz_ref,
    # outputs
    xo_ref, krow_ref, vrow_ref, ksrow_ref, vsrow_ref,
    # scratch
    x_sc, qkv_acc, attn_sc, oacc_sc, xmid_sc, h2_sc, mlp_acc,
    q_sc, m_sc, l_sc, fa_sc,
    # TP one-shot-exchange scratch (dummies when tp == 1)
    tp_recv, tp_send_sem, tp_recv_sem,
    *,
    bsz, bits, hidden, q_dim, kv_dim, inter,
    n_heads, n_kv_heads, head_dim,
    g_qkv, g_o, g_gu, g_d, nq, no, ni, nt, tb, spl, n_layers,
    tka, to_, ti,
    out_dtype, rms_eps,
    zc_qkv, zc_o, zc_gu, zc_d,
    tp=1, tp_axis=None, chunk=1,
    lm_refs=None, lm_meta=None,
):
    l = pl.program_id(0)
    jl = pl.program_id(1)
    vpw = 32 // bits
    n_qkv = q_dim + 2 * kv_dim
    reps = n_heads // n_kv_heads
    scale = 1.0 / float(np.sqrt(head_dim))
    C = chunk              # tokens per slot: 1 = batched decode; >1 = each
    nslots = bsz // C      # slot contributes C consecutive chunk rows
    ntB = nslots * nt      # chunk mode: one flash step per (slot, block)

    # --- overlapped TP all-reduce of the o/down row-parallel partials -------
    # (round 3, VERDICT item 3). The two reduce points are no longer blocking
    # ring loops; instead, as each COLUMN CHUNK of the partial sum receives
    # its final accumulation in the last K-tile step's inner loop, it is sent
    # DIRECTLY to every peer (one-shot all-to-all: 1 latency hop instead of
    # tp-1 serialized pass-and-add hops), overlapping each chunk's flight
    # with the next chunk's dequant-matmul. The consume point waits + adds
    # the tp-1 received mirrors. The consume CANNOT move any earlier: the
    # next phase starts with a GLOBAL rmsnorm over the reduced vector, so
    # only the last chunk's single hop remains exposed.
    #
    # Slot-reuse safety across layers (no credits needed): parity 0 (o) and
    # parity 1 (down) alternate, and a device can only reach its layer-(l+1)
    # o-sends after consuming every peer's layer-l down chunks, which peers
    # send only after consuming layer-l o chunks — the alternating dependency
    # chain orders every overwrite after the matching consume.
    def _reduce_send(buf_ref, cslice, parity, chunk):
        """Send buf[:, cslice] (final partial for this column chunk) to all
        tp-1 peers' tp_recv[parity, slot] mirrors."""
        me = jax.lax.axis_index(tp_axis)
        for j in range(tp - 1):
            pe = jax.lax.rem(me + 1 + j, tp)
            slot = tp - 2 - j  # (me - pe) mod tp - 1 from the receiver's view
            pltpu.make_async_remote_copy(
                src_ref=buf_ref.at[:, cslice],
                dst_ref=tp_recv.at[parity, slot, :, cslice],
                send_sem=tp_send_sem.at[parity, chunk, j],
                recv_sem=tp_recv_sem.at[parity, chunk, slot],
                device_id={tp_axis: pe},
                device_id_type=pltpu.DeviceIdType.MESH,
            ).start()

    def _reduce_consume(buf_ref, parity, ncol, cn):
        """Wait all chunk recvs (+ own sends, so buf may be reused) and
        return buf + sum of peer mirrors."""
        for c in range(ncol):
            sl = pl.ds(c * cn, cn)
            for s in range(tp - 1):
                pltpu.make_async_copy(tp_recv.at[parity, s, :, sl],
                                      tp_recv.at[parity, s, :, sl],
                                      tp_recv_sem.at[parity, c, s]).wait()
            for j in range(tp - 1):
                pltpu.make_async_copy(buf_ref.at[:, sl], buf_ref.at[:, sl],
                                      tp_send_sem.at[parity, c, j]).wait()
        value = buf_ref[:]
        for s in range(tp - 1):
            value = value + tp_recv[parity, s]
        return value

    @pl.when((l == 0) & (jl == 0))
    def _():
        x_sc[:] = x_ref[:].astype(jnp.float32)
        if tp > 1:
            # all-peer barrier before any remote DMA can land (pallas guide)
            me = jax.lax.axis_index(tp_axis)
            barrier = pltpu.get_barrier_semaphore()
            for j in range(tp - 1):
                pltpu.semaphore_signal(
                    barrier, inc=1,
                    device_id={tp_axis: jax.lax.rem(me + 1 + j, tp)},
                    device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_wait(barrier, tp - 1)

    # on terminal lm rows (lm_refs mode) every decoder phase is off
    onl = (l < n_layers) if lm_refs is not None else (l < n_layers) | True

    # ---------------- phase 1: qkv_acc += h_tile @ Wqkv_tile  (B rows)
    @pl.when(onl & (jl < nq))
    def _qkv():
        @pl.when(jl == 0)
        def _():
            qkv_acc[:] = jnp.zeros_like(qkv_acc)

        xf = x_sc[:]                                     # [B, h]
        rstd = jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + rms_eps)  # [B, 1]
        xr = xf.reshape(bsz * (hidden // tka), tka)
        nr = n1_ref[:].reshape(hidden // tka, tka)
        xt = jax.lax.dot_general(_slot_rows(jl, bsz, hidden // tka,
                                            bsz * (hidden // tka)), xr,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [B, tka]
        n1t = jax.lax.dot_general(_onehot_rows(jl, 1, hidden // tka), nr,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ht = (xt * rstd).astype(out_dtype)
        ht = (ht * n1t.astype(out_dtype)).astype(jnp.float32)
        hp = _perm_row(ht, vpw)                          # [B, tka] planar
        if zc_qkv is None:
            s, z, ge = _select_sz(qs_ref[:][0], qz_ref[:][0], jl, tka, g_qkv)
        else:
            s, ge = _select_s(qs_ref[:][0], jl, tka, g_qkv)
            z = s * (-zc_qkv)
        cn = 1024 if n_qkv % 1024 == 0 else n_qkv
        for c in range(n_qkv // cn):
            sl = slice(c * cn, (c + 1) * cn)
            qkv_acc[:, sl] += _qdot(hp, qkv_ref[:][0][:, sl],
                                    s[:, sl], z[:, sl], bits, ge, cn)

    # ---------------- phase 2a: rope + int8 KV rows + flash init (per slot,
    # head-vectorized)
    @pl.when(onl & (jl == nq))
    def _attn_init():
        E = _expand_mat(n_heads, n_kv_heads)
        qkv = qkv_acc[:]                                  # [B, n_qkv]
        qs, kds, vds = [], [], []
        for b in range(bsz):
            cos = cos_ref[b:b + 1].astype(jnp.float32)    # [1, D]
            sin = sin_ref[b:b + 1].astype(jnp.float32)
            q = _rope_rows(qkv[b:b + 1, :q_dim].reshape(n_heads, head_dim),
                           cos, sin)
            k = _rope_rows(
                qkv[b:b + 1, q_dim:q_dim + kv_dim].reshape(n_kv_heads, head_dim),
                cos, sin)
            v = qkv[b:b + 1, q_dim + kv_dim:].reshape(n_kv_heads, head_dim)

            k_amax = jnp.clip(jnp.abs(k).max(axis=-1, keepdims=True), 1e-8, None)
            v_amax = jnp.clip(jnp.abs(v).max(axis=-1, keepdims=True), 1e-8, None)
            k_s = k_amax / 127.0
            v_s = v_amax / 127.0
            k_q = jnp.clip(jnp.round(k / k_s), -127, 127).astype(jnp.int8)
            v_q = jnp.clip(jnp.round(v / v_s), -127, 127).astype(jnp.int8)
            krow_ref[0, b] = k_q
            vrow_ref[0, b] = v_q
            ksrow_ref[0, b] = k_s.reshape(1, -1)
            vsrow_ref[0, b] = v_s.reshape(1, -1)

            rows = slice(b * n_heads, (b + 1) * n_heads)
            q_sc[rows] = q
            kd = jax.lax.dot_general(E, k_q.astype(jnp.float32) * k_s,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            vd = jax.lax.dot_general(E, v_q.astype(jnp.float32) * v_s,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            s_new = (q * kd).sum(-1, keepdims=True) * scale   # [Hq, 1]
            m_sc[rows] = jnp.broadcast_to(s_new, (n_heads, head_dim))
            l_sc[rows] = jnp.ones((n_heads, head_dim), jnp.float32)
            fa_sc[rows] = vd
            if C > 1:
                qs.append(q); kds.append(kd); vds.append(vd)

        if C > 1 and os.environ.get("MI_CHUNK_NO_INTRA") != "1":
            # intra-chunk causal attention (chunk mode: each slot's C rows
            # are consecutive tokens of ONE sequence at positions prefix..
            # prefix+C-1). Row i additionally attends its slot's rows j<i —
            # their K/V exist only here (the cache holds rows < prefix,
            # covered by phase 2b; the flash mask there stops at prefix).
            # Static O(C^2) unrolled online-softmax updates; C is small.
            # r5 NEGATIVE RESULT: a vectorized per-row formulation (one
            # kd_flat@q^T MXU dot + grouped sel^T reductions per row) was
            # built and measured EQUAL-OR-WORSE at every C (C=5: 8.8 vs
            # 8.0 ms, C=9: 11.2 vs 10.4, C=13: 42.3 vs 41.5) — this pass
            # is NOT the chunk-C cliff (MI_CHUNK_NO_INTRA=1 attribution:
            # C=13 is 39.5 ms with the pass removed entirely). The cliff
            # is a bsz-scaled VMEM/pipeline interaction in the weight
            # phases (tile-dependent, non-monotonic — exp_chunk_c_sweep,
            # ROADMAP item 3); callers stay below it via C<=8 quanta.
            # (MI_CHUNK_NO_INTRA=1 skips the pass — WRONG RESULTS, cost
            # attribution only.)
            for s0 in range(nslots):
                for i in range(1, C):
                    r = s0 * C + i
                    rows = slice(r * n_heads, (r + 1) * n_heads)
                    for j in range(i):
                        rj = s0 * C + j
                        s = (qs[r] * kds[rj]).sum(-1, keepdims=True) * scale
                        m_old = m_sc[rows][:, :1]
                        m_new = jnp.maximum(m_old, s)
                        corr = jnp.exp(m_old - m_new)
                        p_ = jnp.exp(s - m_new)
                        fa_sc[rows] = fa_sc[rows] * corr + p_ * vds[rj]
                        l_sc[rows] = l_sc[rows] * corr + p_
                        m_sc[rows] = jnp.broadcast_to(m_new,
                                                      (n_heads, head_dim))

    # ---------------- phase 2b: flash over (slot, t-block). Slot-major for
    # the batched decode (each slot has its own cache rows); in chunk mode
    # ONE grid step per (slot, block) serves ALL C rows — the slot's rows
    # share the cache AND the shared-prefix history mask, so the block is
    # dequantized once and the C per-row state updates reuse it (r4: the
    # per-C-row step layout dequantized each block C times, making a 16-token
    # suffix chunk COST MORE than a full 1024-token prefill — 308 vs 274 ms).
    # Chunk history stops at the shared prefix (rows >= prefix live in the
    # intra-chunk pass of phase 2a).
    @pl.when(onl & (jl > nq) & (jl <= nq + ntB))
    def _attn_flash():
        t_all = jl - (nq + 1)
        if C > 1:
            s0 = t_all // nt
            t = t_all % nt
            pos_b = pos_ref[s0 * C]  # the slot's shared prefix
        else:
            b = t_all // nt
            t = t_all % nt
            pos_b = pos_ref[b]

        @pl.when(t * tb < pos_b)
        def _():
            # head-transposed cache block: [Hkv, tb, D] — dequantized ONCE
            k_blk = (ck_ref[:][0, 0].astype(jnp.float32)
                     * ks_ref[:][0, 0][:, :, None])
            v_blk = (cv_ref[:][0, 0].astype(jnp.float32)
                     * vs_ref[:][0, 0][:, :, None])
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tb), 2)
            hist = t * tb + lanes < pos_b                 # [1, 1, tb]

            def one_row(b_row):
                boff = pl.multiple_of(b_row * n_heads, n_heads)
                q_b = q_sc[pl.ds(boff, n_heads)]          # [Hq, D]
                q_r = q_b.reshape(n_kv_heads, reps, head_dim)
                s = jax.lax.dot_general(
                    q_r, k_blk, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale  # [Hkv,reps,tb]
                s = jnp.where(hist, s, jnp.finfo(jnp.float32).min)
                m_b = m_sc[pl.ds(boff, n_heads)]          # [Hq, D]
                m_old = m_b.reshape(n_kv_heads, reps, head_dim)[..., :1]
                m_new = jnp.maximum(m_old, s.max(axis=-1, keepdims=True))
                corr_r = jnp.exp(m_old - m_new)           # [Hkv, reps, 1]
                p = jnp.exp(s - m_new)
                pv = jax.lax.dot_general(
                    p, v_blk, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [Hkv, reps, D]
                corr = jnp.broadcast_to(corr_r, (n_kv_heads, reps, head_dim)
                                        ).reshape(n_heads, head_dim)
                fa_sc[pl.ds(boff, n_heads)] = (
                    fa_sc[pl.ds(boff, n_heads)] * corr
                    + pv.reshape(n_heads, head_dim))
                psum = jnp.broadcast_to(p.sum(axis=-1, keepdims=True),
                                        (n_kv_heads, reps, head_dim)
                                        ).reshape(n_heads, head_dim)
                l_sc[pl.ds(boff, n_heads)] = (
                    l_sc[pl.ds(boff, n_heads)] * corr + psum)
                m_sc[pl.ds(boff, n_heads)] = jnp.broadcast_to(
                    m_new, (n_kv_heads, reps, head_dim)
                ).reshape(n_heads, head_dim)

            if C > 1:
                for r in range(C):
                    one_row(s0 * C + r)
            else:
                one_row(b)

    # ---------------- phase 3: o_acc += attn_t @ Wo_t  (B rows)
    @pl.when(onl & (jl > nq + ntB) & (jl <= nq + ntB + no))
    def _oproj():
        kt = jl - (nq + ntB + 1)

        @pl.when(kt == 0)
        def _():
            oacc_sc[:] = jnp.zeros_like(oacc_sc)
            out = fa_sc[:] / l_sc[:]                      # [B*Hq, D]
            pm = _planar_mat(to_, vpw)
            nchunk = q_dim // to_
            for b in range(bsz):
                flat = out[b * n_heads:(b + 1) * n_heads].reshape(1, q_dim)
                for r in range(nchunk):
                    attn_sc[b * nchunk + r:b * nchunk + r + 1, :] = \
                        jax.lax.dot_general(
                            flat[:, r * to_:(r + 1) * to_], pm,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

        nchunk = q_dim // to_
        ap = jax.lax.dot_general(
            _slot_rows(kt, bsz, nchunk, bsz * nchunk), attn_sc[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if zc_o is None:
            s, z, ge = _select_sz(os_ref[:][0], oz_ref[:][0], kt, to_, g_o)
        else:
            s, ge = _select_s(os_ref[:][0], kt, to_, g_o)
            z = s * (-zc_o)
        cn = 1024 if hidden % 1024 == 0 else hidden
        for c in range(hidden // cn):
            sl = slice(c * cn, (c + 1) * cn)
            oacc_sc[:, sl] += _qdot(ap, o_ref_w[:][0][:, sl],
                                    s[:, sl], z[:, sl], bits, ge, cn)
            if tp > 1:
                # chunk is final on the last K-tile: ship it now — its hop
                # flies while the next chunk's dequant-matmul computes
                @pl.when(kt == no - 1)
                def _(c=c, sl=sl):
                    _reduce_send(oacc_sc, sl, 0, c)

    # ---------------- phase 4: MLP tiles (B rows); last step updates residual
    @pl.when(onl & (jl > nq + ntB + no))
    def _mlp():
        m = jl - (nq + ntB + no + 1)

        @pl.when(m == 0)
        def _():
            oacc = oacc_sc[:]
            if tp > 1:
                # o-proj is row-parallel (local q heads): sum partials.
                # chunks were sent during the o phase; only the last chunk's
                # hop is still in flight here
                cno = 1024 if hidden % 1024 == 0 else hidden
                oacc = _reduce_consume(oacc_sc, 0, hidden // cno, cno)
            xmid = x_sc[:] + oacc
            xmid_sc[:] = xmid
            rstd2 = jax.lax.rsqrt(
                jnp.mean(xmid * xmid, axis=-1, keepdims=True) + rms_eps)
            h2 = (xmid * rstd2).astype(out_dtype)
            h2 = (h2 * n2_ref[:].reshape(1, hidden).astype(out_dtype)
                  ).astype(jnp.float32)
            pm = _planar_mat(CH, vpw)
            for r in range(hidden // CH):
                h2_sc[:, r * CH:(r + 1) * CH] = jax.lax.dot_general(
                    h2[:, r * CH:(r + 1) * CH], pm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            mlp_acc[:] = jnp.zeros_like(mlp_acc)

        ngh = max(hidden // g_gu, 1)
        g_eff = min(g_gu, CH)
        ngc = max(CH // g_gu, 1)
        chw = CH // vpw
        gate = jnp.zeros((bsz, ti), jnp.float32)
        up = jnp.zeros((bsz, ti), jnp.float32)

        def gu_sb(rows):
            s_ = gus_ref[:][0][rows, :]
            if zc_gu is None:
                return s_, guz_ref[:][0][rows, :]
            return s_, s_ * (-zc_gu)

        for r in range(hidden // CH):
            hp_r = h2_sc[:, r * CH:(r + 1) * CH]
            rs = (r * CH) // g_gu
            rows = slice(r * chw, (r + 1) * chw)
            sg, bg = gu_sb(slice(rs, rs + ngc))
            gate += _qdot(hp_r, g_ref[:][0][rows, :], sg, bg, bits, g_eff, ti)
            su, bu = gu_sb(slice(ngh + rs, ngh + rs + ngc))
            up += _qdot(hp_r, u_ref[:][0][rows, :], su, bu, bits, g_eff, ti)
        act = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up

        ap = _perm_row(act, vpw)
        if zc_d is None:
            sd, zd, ged = _select_sz(ds_ref[:][0], dz_ref[:][0], m, ti, g_d)
        else:
            sd, ged = _select_s(ds_ref[:][0], m, ti, g_d)
            zd = sd * (-zc_d)
        cn = 1024 if hidden % 1024 == 0 else hidden
        for c in range(hidden // cn):
            sl = slice(c * cn, (c + 1) * cn)
            mlp_acc[:, sl] += _qdot(ap, d_ref[:][0][:, sl],
                                    sd[:, sl], zd[:, sl], bits, ged, cn)
            if tp > 1:
                @pl.when(m == ni - 1)
                def _(c=c, sl=sl):
                    _reduce_send(mlp_acc, sl, 1, c)

        @pl.when(m == ni - 1)
        def _():
            mlp = mlp_acc[:]
            if tp > 1:
                # down-proj is row-parallel (local intermediate): sum the
                # chunk mirrors sent above; parity 1 alternates with the
                # o reduce (see _reduce_send docstring for reuse safety)
                mlp = _reduce_consume(mlp_acc, 1, hidden // cn, cn)
            x_new = xmid_sc[:] + mlp
            x_sc[:] = x_new

            @pl.when(l == n_layers - 1)
            def _():
                xo_ref[:] = x_new.astype(xo_ref.dtype)

    # ---------------- terminal rows (r5): final rms_norm + packed lm_head
    # + per-row argmax for ALL B rows, flat-kernel style — removes the XLA
    # rms/unembed/argmax glue from the batched AND chunk step (measured
    # 2.3 ms at B=8; the C-row chunk verify paid the same per call).
    if lm_refs is not None:
        ue_ref, ues_ref, fn_ref, logit_ref, tok_ref, amv_sc, ami_sc = lm_refs
        g_ue, zc_ue, vocab, tv, nv = lm_meta
        L = n_layers
        lm_step = (l - L) * spl + jl

        @pl.when((l >= L) & (lm_step == 0))
        def _lm_prep():
            xf = x_sc[:]                                  # [B, h] final res
            rstd = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + rms_eps)
            hh = (xf * rstd).astype(out_dtype)
            hh = (hh * fn_ref[:].reshape(1, hidden).astype(out_dtype)
                  ).astype(jnp.float32)
            pm = _planar_mat(CH, vpw)
            for r in range(hidden // CH):
                h2_sc[:, r * CH:(r + 1) * CH] = jax.lax.dot_general(
                    hh[:, r * CH:(r + 1) * CH], pm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            amv_sc[:] = jnp.full_like(amv_sc, jnp.finfo(jnp.float32).min)
            ami_sc[:] = jnp.zeros_like(ami_sc)

        @pl.when((l >= L) & (lm_step >= 1) & (lm_step <= nv))
        def _lm_tile():
            t = lm_step - 1
            g_eff = min(g_ue, CH)
            ngc = max(CH // g_ue, 1)
            chw = CH // vpw
            cn = 1024 if tv % 1024 == 0 else tv
            parts = []
            for c in range(tv // cn):
                sl = slice(c * cn, (c + 1) * cn)
                chunk_acc = jnp.zeros((bsz, cn), jnp.float32)
                for r in range(hidden // CH):
                    hp_r = h2_sc[:, r * CH:(r + 1) * CH]
                    rs = (r * CH) // g_ue
                    su = ues_ref[:][rs:rs + ngc, sl]
                    rows = slice(r * chw, (r + 1) * chw)
                    chunk_acc += _qdot(hp_r, ue_ref[:][rows, sl], su,
                                       su * (-zc_ue), bits, g_eff, cn)
                parts.append(chunk_acc)
            acc = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                   else parts[0])                          # [B, tv]
            logit_ref[:] = acc

            lmax = jnp.max(acc, axis=-1, keepdims=True)    # [B, 1]
            iot = jax.lax.broadcasted_iota(jnp.int32, (bsz, tv), 1)
            lidx = jnp.min(jnp.where(acc == lmax, iot, vocab), axis=-1,
                           keepdims=True)                  # [B, 1]
            better = lmax > amv_sc[:, :1]
            bw = jnp.broadcast_to(better, amv_sc.shape)
            amv_sc[:] = jnp.where(bw, jnp.broadcast_to(lmax, amv_sc.shape),
                                  amv_sc[:])
            ami_sc[:] = jnp.where(
                bw, jnp.broadcast_to(t * tv + lidx, ami_sc.shape),
                ami_sc[:])

            @pl.when(lm_step == nv)
            def _():
                tok_ref[:] = ami_sc[:]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "meta", "interpret", "tp", "tp_axis",
                                    "chunk", "lm_meta"))
def model_decode_mega_batch(stack, x, cos, sin, cache, positions, cfg, meta,
                            interpret=False, tp=1, tp_axis=None, table=None,
                            chunk=1, lm=None, lm_meta=None):
    """B-slot whole-model decode: x [B,1,H], per-slot positions [B].

    chunk=C>1 (round 3): the rows are B/C slots x C CONSECUTIVE tokens each —
    slot s's rows sit at positions prefix_s..prefix_s+C-1 against its own
    cache (cache B-dim = B/C) — the whole-model CHUNK kernel for speculative-
    decoding verify (all slots' chunks in one launch) and short prefill
    ingest. Adds the per-slot intra-chunk causal attention pass; the flash
    phase runs t-major within each slot so shared history blocks stream
    once; per-row logits come from x_out's rows. One weight stream scores
    every chunk. chunk=1 is the plain batched decode.

    cache: HEAD-TRANSPOSED stacked dict {"k": [L,B,Hkv,T,D] int8, "v": ...,
    "k_scale": [L,B,Hkv,T], "v_scale": ...} (see stack_cache_batched).
    Returns (x_out [B,1,H], krows [L,B,Hkv,D], vrows, ksr [L,B,Hkv],
    vsr) — the caller scatters rows at each slot's position.

    table (optional): PAGED mode (round 3, VERDICT item 8) — cache arrays are
    a shared page POOL {"k": [L, n_pages, Hkv, P, D] int8, ...} and
    table [B//chunk, pps] int32 maps each slot's t-th flash block to its pool
    page (page size P = the flash block). Composes with chunk>1: paged chunk
    verify, i.e. speculative decoding under page-pool memory management
    (serving/paged.PagedSpeculativeBatcher). The table rides scalar prefetch
    next to
    positions; the ONLY change vs dense is the KV BlockSpec index maps
    looking up `table[b, t]` — the kernel body is identical, and the
    live-prefix clamp keeps unallocated pages from ever being fetched
    (slots with stale table rows must have position 0 so they read page 0,
    the pool's scratch page). vLLM-style memory: pool pages scale with
    actual tokens in flight, not B × max_len.

    Head/intermediate dimensions come from the ARRAY shapes, not cfg: under
    tensor parallelism (tp>1, called per-shard inside shard_map — see
    serving/megadecode.model_step_batch_tp) the q/kv heads and the MLP
    intermediate are the LOCAL shards, the residual stays full-width and
    replicated, and the two row-parallel partial sums (o-proj, down-proj) are
    ring-all-reduced IN-kernel over async remote DMAs.
    """
    bits, g_qkv, g_o, g_gu, g_d, zc_qkv, zc_o, zc_gu, zc_d = meta
    h = cfg.hidden_size
    vpw = 32 // bits
    L = cfg.num_layers
    B = x.shape[0]
    # local (per-shard) dims from the operands
    Hkv = cache["k"].shape[2]
    kv_dim = Hkv * cfg.head_dim
    q_dim = stack["qkv"].shape[2] - 2 * kv_dim  # n_qkv(local) - 2*kv(local)
    n_heads = q_dim // cfg.head_dim
    inter_p = stack["d"].shape[1] * vpw

    tka, to_, ti, _ = _model_tiles(cfg)
    to_ = _pick_tile(q_dim) or q_dim
    nq, no, ni = h // tka, q_dim // to_, inter_p // ti
    if chunk > 1:
        assert tp == 1
        assert B % chunk == 0
        if table is None:
            assert cache["k"].shape[1] == B // chunk, \
                "chunk mode: one cache slot per C rows"
        else:
            assert table.shape[0] == B // chunk, \
                "paged chunk mode: one table row per C rows"
    if table is not None:
        # composes with in-kernel TP (the table only redirects KV BlockSpec
        # fetches; the ring reduces touch o/down partials, not the cache) —
        # the pool shards on its Hkv axis like the dense cache. chunk+tp
        # remains excluded (asserted above via chunk>1 => tp==1).
        tb = cache["k"].shape[3]            # page size == flash block
        assert tb % 128 == 0
        nt = table.shape[1]                 # pages per slot (logical capacity)
    else:
        max_len = cache["k"].shape[3]
        tb = 256 if (max_len % 256 == 0 and max_len >= 1024) else 128
        assert max_len % tb == 0
        nt = max_len // tb
    # chunk mode: one flash step per (slot, block) — NOT per (row, block);
    # the C rows of a slot share the block's single dequant in-kernel
    ntB = (B // chunk) * nt
    spl = nq + 1 + ntB + no + ni
    # terminal lm_head rows (r5): fuse rms_norm + packed unembed + per-row
    # argmax for all B rows after the last layer (lm = {"ue","ues","fnorm"},
    # lm_meta = (g_ue, zc_ue, vocab, tv)); tp>1 keeps the XLA lm_head
    if lm is not None:
        assert tp == 1, "terminal lm rows are single-shard only"
        g_ue, zc_ue, vocab, tv = lm_meta
        nv = vocab // tv
        Lx = -(-(nv + 1) // spl)
        grid = (L + Lx, spl)
    else:
        grid = (L, spl)

    x_rows = x.reshape(B, h)

    kern = functools.partial(
        _kernel_b, bsz=B, bits=bits, hidden=h, q_dim=q_dim, kv_dim=kv_dim,
        inter=inter_p,
        n_heads=n_heads, n_kv_heads=Hkv,
        head_dim=cfg.head_dim,
        g_qkv=g_qkv, g_o=g_o, g_gu=g_gu, g_d=g_d,
        nq=nq, no=no, ni=ni, nt=nt, tb=tb, spl=spl, n_layers=L,
        tka=tka, to_=to_, ti=ti,
        out_dtype=x.dtype, rms_eps=cfg.rms_eps,
        zc_qkv=zc_qkv, zc_o=zc_o, zc_gu=zc_gu, zc_d=zc_d,
        tp=tp, tp_axis=tp_axis, chunk=chunk,
        lm_meta=(None if lm is None
                 else (g_ue, zc_ue, vocab, tv, nv)),
    )

    # paged mode adds the page table as a SECOND scalar-prefetch operand, so
    # every index map gains a trailing arg; A() adapts the dense-signature
    # maps, and the kv maps get true paged variants below
    A = ((lambda f: f) if table is None
         else (lambda f: (lambda l, j, p, t, _f=f: _f(l, j, p))))

    if lm is not None:
        # terminal rows: clamp the layer coordinate and FREEZE tile
        # coordinates at their end-of-layer values (no weight refetches
        # there — only the lm tiles walk); kv maps keep walking (their
        # terminal-row refetches are bounded by the live prefix, <1% of a
        # step) — same structure as ops/model_flat.py
        lc = lambda l: jnp.minimum(l, L - 1)
        fz = lambda f, last: (lambda l, j, p:
                              jnp.where(l < L, f(l, j, p), last))
    else:
        lc = lambda l: l
        fz = lambda f, last: f
    t_qkv = fz(lambda l, j, p: jnp.minimum(j, nq - 1), nq - 1)
    t_o = fz(lambda l, j, p: jnp.clip(j - (nq + ntB + 1), 0, no - 1),
             no - 1)
    t_mlp = fz(lambda l, j, p: jnp.clip(j - (nq + ntB + no + 1), 0, ni - 1),
               ni - 1)

    def bt(j):
        t_all = jnp.clip(j - (nq + 1), 0, ntB - 1)
        return t_all // nt, t_all % nt

    if chunk > 1:
        # per-slot caches: one (slot, block) step serves all C rows,
        # clamped to the slot's prefix
        C = chunk

        def _st(j):
            t_all = jnp.clip(j - (nq + 1), 0, ntB - 1)
            return t_all // nt, t_all % nt

        if table is None:
            def kv_map(l, j, p):
                s0, t = _st(j)
                return (lc(l), s0, 0, jnp.minimum(t, p[s0 * C] // tb), 0)

            def kvs_map(l, j, p):
                s0, t = _st(j)
                return (lc(l), s0, 0, jnp.minimum(t, p[s0 * C] // tb))
        else:
            # paged chunk verify (round 3 "serving composition leftovers"):
            # slot s0's t-th shared-history block lives in pool page
            # table[s0, t]; same live-prefix clamp as the dense chunk mode
            def kv_map(l, j, p, tbl):
                s0, t = _st(j)
                return (lc(l), tbl[s0, jnp.minimum(t, p[s0 * C] // tb)], 0, 0, 0)

            def kvs_map(l, j, p, tbl):
                s0, t = _st(j)
                return (lc(l), tbl[s0, jnp.minimum(t, p[s0 * C] // tb)], 0, 0)
    elif table is None:
        def kv_map(l, j, p):
            b, t = bt(j)
            return (lc(l), b, 0, jnp.minimum(t, p[b] // tb), 0)

        def kvs_map(l, j, p):
            b, t = bt(j)
            return (lc(l), b, 0, jnp.minimum(t, p[b] // tb))
    else:
        def kv_map(l, j, p, tbl):
            b, t = bt(j)
            return (lc(l), tbl[b, jnp.minimum(t, p[b] // tb)], 0, 0, 0)

        def kvs_map(l, j, p, tbl):
            b, t = bt(j)
            return (lc(l), tbl[b, jnp.minimum(t, p[b] // tb)], 0, 0)

    def sspec(arr, tk, g, tile_of, frozen=False):
        n = max(tk // g, 1)
        rows = n if n >= 8 else 8
        if frozen:
            return pl.BlockSpec((1, rows, arr.shape[2]),
                                A(lambda l, j, p: (0, 0, 0)))
        if n >= 8:
            return pl.BlockSpec((1, rows, arr.shape[2]),
                                A(lambda l, j, p: (lc(l), tile_of(l, j, p),
                                                   0)))
        return pl.BlockSpec(
            (1, rows, arr.shape[2]),
            A(lambda l, j, p: (lc(l), ((tile_of(l, j, p) * tk) // g) // 8,
                               0)))

    n_qkv = q_dim + 2 * kv_dim
    D = cfg.head_dim
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if table is None else 2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, h), A(lambda l, j, p: (0, 0))),               # x
            pl.BlockSpec((1, 1, h), A(lambda l, j, p: (lc(l), 0, 0))),     # n1
            pl.BlockSpec((1, tka // vpw, n_qkv),
                         A(lambda l, j, p: (lc(l), t_qkv(l, j, p), 0))),   # qkv
            sspec(stack["qs"], tka, g_qkv, t_qkv),
            sspec(stack["qz"], tka, g_qkv, t_qkv, frozen=zc_qkv is not None),
            pl.BlockSpec((B, cfg.head_dim), A(lambda l, j, p: (0, 0))),    # cos
            pl.BlockSpec((B, cfg.head_dim), A(lambda l, j, p: (0, 0))),    # sin
            pl.BlockSpec((1, 1, Hkv, tb, D), kv_map),                      # ck
            pl.BlockSpec((1, 1, Hkv, tb, D), kv_map),                      # cv
            pl.BlockSpec((1, 1, Hkv, tb), kvs_map),
            pl.BlockSpec((1, 1, Hkv, tb), kvs_map),
            pl.BlockSpec((1, to_ // vpw, h),
                         A(lambda l, j, p: (lc(l), t_o(l, j, p), 0))),     # o
            sspec(stack["os"], to_, g_o, t_o),
            sspec(stack["oz"], to_, g_o, t_o, frozen=zc_o is not None),
            pl.BlockSpec((1, 1, h), A(lambda l, j, p: (lc(l), 0, 0))),     # n2
            pl.BlockSpec((1, h // vpw, ti),
                         A(lambda l, j, p: (lc(l), 0, t_mlp(l, j, p)))),   # gate
            pl.BlockSpec((1, h // vpw, ti),
                         A(lambda l, j, p: (lc(l), 0,
                                            ni + t_mlp(l, j, p)))),        # up
            pl.BlockSpec((1, stack["gus"].shape[1], ti),
                         A(lambda l, j, p: (lc(l), 0, t_mlp(l, j, p)))),
            pl.BlockSpec((1, stack["guz"].shape[1], ti),
                         A((lambda l, j, p: (0, 0, 0)) if zc_gu is not None
                           else (lambda l, j, p: (lc(l), 0,
                                                  t_mlp(l, j, p))))),
            pl.BlockSpec((1, ti // vpw, h),
                         A(lambda l, j, p: (lc(l), t_mlp(l, j, p), 0))),   # down
            sspec(stack["ds"], ti, g_d, t_mlp),
            sspec(stack["dz"], ti, g_d, t_mlp, frozen=zc_d is not None),
        ] + ([] if lm is None else [
            pl.BlockSpec((h // vpw, tv),
                         A(lambda l, j, p: (0, jnp.clip(
                             (l - L) * spl + j - 1, 0, nv - 1)))),      # ue
            pl.BlockSpec((lm["ues"].shape[0], tv),
                         A(lambda l, j, p: (0, jnp.clip(
                             (l - L) * spl + j - 1, 0, nv - 1)))),
            pl.BlockSpec((1, h), A(lambda l, j, p: (0, 0))),         # fnorm
        ]),
        out_specs=[
            pl.BlockSpec((B, h), A(lambda l, j, p: (0, 0))),               # x_out
            pl.BlockSpec((1, B, Hkv, D),
                         A(lambda l, j, p: (lc(l), 0, 0, 0))),
            pl.BlockSpec((1, B, Hkv, D),
                         A(lambda l, j, p: (lc(l), 0, 0, 0))),
            pl.BlockSpec((1, B, 1, Hkv),
                         A(lambda l, j, p: (lc(l), 0, 0, 0))),
            pl.BlockSpec((1, B, 1, Hkv),
                         A(lambda l, j, p: (lc(l), 0, 0, 0))),
        ] + ([] if lm is None else [
            pl.BlockSpec((B, tv),
                         A(lambda l, j, p: (0, jnp.clip(
                             (l - L) * spl + j - 1, 0, nv - 1)))),  # logits
            pl.BlockSpec((B, 128), A(lambda l, j, p: (0, 0))),      # argmax
        ]),
        scratch_shapes=[
            pltpu.VMEM((B, h), jnp.float32),              # residual stream
            pltpu.VMEM((B, n_qkv), jnp.float32),
            pltpu.VMEM((B * (q_dim // to_), to_), jnp.float32),
            pltpu.VMEM((B, h), jnp.float32),
            pltpu.VMEM((B, h), jnp.float32),
            pltpu.VMEM((B, h), jnp.float32),
            pltpu.VMEM((B, h), jnp.float32),
            pltpu.VMEM((B * n_heads, D), jnp.float32),
            pltpu.VMEM((B * n_heads, D), jnp.float32),
            pltpu.VMEM((B * n_heads, D), jnp.float32),
            pltpu.VMEM((B * n_heads, D), jnp.float32),
            # TP one-shot-exchange mirrors + per-(parity, chunk, peer)
            # semaphores (tiny dummies when tp == 1)
            pltpu.VMEM((2, max(tp - 1, 1), B, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2, h // (1024 if h % 1024 == 0 else h),
                                     max(tp - 1, 1))),
            pltpu.SemaphoreType.DMA((2, h // (1024 if h % 1024 == 0 else h),
                                     max(tp - 1, 1))),
        ] + ([] if lm is None else [
            pltpu.VMEM((B, 128), jnp.float32),           # running max
            pltpu.VMEM((B, 128), jnp.int32),             # running argmax
        ]),
    )

    if lm is not None:
        # positional adapter: pallas appends the lm inputs/outputs/scratch
        # after the base lists; route them into _kernel_b's lm_refs
        kern_core = kern

        def kern(pos_ref, x_r, n1_r, qkv_r, qs_r, qz_r, cos_r, sin_r,
                 ck_r, cv_r, ks_r, vs_r, o_r, os_r, oz_r, n2_r,
                 g_r, u_r, gus_r, guz_r, d_r, ds_r, dz_r,
                 ue_r, ues_r, fn_r,
                 xo_r, kr_r, vr_r, ksr_r, vsr_r, logit_r, tok_r,
                 s1, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11,
                 tpr, tps, tprs, amv, ami):
            kern_core(pos_ref, x_r, n1_r, qkv_r, qs_r, qz_r, cos_r, sin_r,
                      ck_r, cv_r, ks_r, vs_r, o_r, os_r, oz_r, n2_r,
                      g_r, u_r, gus_r, guz_r, d_r, ds_r, dz_r,
                      xo_r, kr_r, vr_r, ksr_r, vsr_r,
                      s1, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11,
                      tpr, tps, tprs,
                      lm_refs=(ue_r, ues_r, fn_r, logit_r, tok_r, amv, ami))

    pos_arr = jnp.reshape(positions, (B,)).astype(jnp.int32)
    if table is None:
        scalars = (pos_arr,)
    else:
        scalars = (pos_arr, table.astype(jnp.int32))
        kern_body = kern

        def kern(pos_ref, table_ref, *rest):
            # the table is consumed only by the BlockSpec index maps
            kern_body(pos_ref, *rest)

    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, h), x.dtype),
            jax.ShapeDtypeStruct((L, B, Hkv, D), jnp.int8),
            jax.ShapeDtypeStruct((L, B, Hkv, D), jnp.int8),
            jax.ShapeDtypeStruct((L, B, 1, Hkv), jnp.float32),
            jax.ShapeDtypeStruct((L, B, 1, Hkv), jnp.float32),
        ] + ([] if lm is None else [
            jax.ShapeDtypeStruct((B, vocab), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ]),
        interpret=(pltpu.InterpretParams() if (interpret and tp > 1)
                   else interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(80 if lm is not None else 64) * 1024 * 1024,
            **({"collective_id": 3} if tp > 1 else {})),
    )(
        *scalars,
        x_rows, stack["n1"],
        stack["qkv"], stack["qs"], stack["qz"],
        cos.reshape(B, cfg.head_dim), sin.reshape(B, cfg.head_dim),
        cache["k"], cache["v"], cache["k_scale"], cache["v_scale"],
        stack["o"], stack["os"], stack["oz"],
        stack["n2"],
        stack["gu"], stack["gu"], stack["gus"], stack["guz"],
        stack["d"], stack["ds"], stack["dz"],
        *(() if lm is None else (lm["ue"], lm["ues"], lm["fnorm"])),
    )
    x_out, krows, vrows, ksr, vsr = outs[:5]
    base = (x_out.reshape(x.shape), krows, vrows, ksr[:, :, 0], vsr[:, :, 0])
    if lm is None:
        return base
    return base + (outs[5], outs[6][:, 0])
