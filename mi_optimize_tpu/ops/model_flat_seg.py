"""Multi-token FLAT decode: k greedy tokens in ONE Pallas launch (round 5,
VERDICT item 2 / ROADMAP item 3).

ops/model_flat.py decodes one token per launch; for a SMALL model (a
spec-dec draft, or any few-layer checkpoint) the per-launch dispatch floors
dominate: a 2-layer 7B-shaped draft step measured 3.58 ms against a 0.4 ms
weight stream (r4, scripts/exp_spec_roundcost.py). Sequential decode cannot
share weight streams across tokens (token t+1's layer 0 depends on token
t's layer L), so the win here is purely structural: ONE launch runs k
full forwards back-to-back with zero out-of-kernel glue between tokens:

  * grid (k, L+Lx, spl): outer axis = segment token index. Weight-tile
    index maps ignore t, so each token's pass re-streams the weights (the
    unavoidable cost); terminal rows still freeze tile coordinates.
  * in-kernel NEXT-TOKEN EMBED: after token t's terminal argmax, extra
    terminal steps stream the embedding table through the regular block
    pipeline ((tv, hb) tiles — index maps cannot see the in-kernel argmax,
    so ALL tiles stream) and a one-hot MXU dot gathers the winning row
    into a VMEM scratch; token t+1's first step starts from it. This
    replaces the XLA embed-gather glue between launches at the cost of one
    embed-table pass per token (skipped for the segment's last token).
    An HBM->VMEM async-copy gather (zero extra traffic) would be better,
    but this environment's AOT compile helper crashes on ANY-memory-space
    DMA (r5 probe: static or dynamic index, any size — all HTTP 500).
  * SEGMENT ATTENTION: the cache in HBM only holds rows < pos0 (the caller
    scatters after the launch). Rows decoded within the segment live in a
    VMEM scratch [L, k, 2, Hkv, D] (f32, dequantized); token t's attention
    = own-row seed + masked pass over segment rows < t + the usual flash
    over history blocks clamped at pos0.
  * all k int8 KV rows + scales come out stacked; the caller scatters the
    whole segment with ONE dynamic_update_slice per field.

Scope: B=1 greedy, same weight contract as the flat kernel (symmetric
per-group packed int4/int8, packed lm_head). kseg is static; spec-dec uses
kseg = k+1 (propose k, ingest k+1 rows — serving/speculative.py).

Role in the reference's terms: the multi-token inner loop the reference
delegates to fastllm's C++ engine (/root/reference/examples/llama/
llama2_to_flm.py:152-425, role); there is no reference counterpart for
draft decoding — spec-dec is beyond-reference serving scope.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_fused import CH, _onehot_rows, _perm_row, _planar_mat, _qdot, \
    _rope_rows, _select_s
from .model_flat import _pick_cn, flat_tiles


def _kernel_flat_seg(
    # scalar prefetch
    pos_ref,
    # inputs
    x_ref, embt_ref, n1_ref, n2_ref,
    qkv_ref, qs_ref,
    cos_ref, sin_ref,
    ckv_ref, kvs_ref,
    o_ref_w, os_ref,
    gu_ref, gus_ref,
    d_ref, ds_ref,
    ue_ref, ues_ref, fn_ref,
    # outputs
    tok_ref, kvrow_ref, kvsc_ref,
    # scratch
    x_sc, xemb_sc, seg_kv, qkv_acc, attn_sc, oacc_sc, xmid_sc, h2_sc,
    mlp_acc, q_sc, m_sc, l_sc, fa_sc, am_val, am_idx,
    *,
    bits, hidden, q_dim, kv_dim, inter,
    n_heads, n_kv_heads, head_dim, vocab,
    g_qkv, g_o, g_gu, g_d, g_ue,
    zc_qkv, zc_o, zc_gu, zc_d, zc_ue,
    nqf, nof, ni, nt, nv, nh, hb, tb, spl, n_layers, kseg,
    tkf, tkc, tof, toc, ti, tv,
    out_dtype, rms_eps,
):
    t = pl.program_id(0)
    l = pl.program_id(1)
    jl = pl.program_id(2)
    L = n_layers
    vpw = 32 // bits
    n_qkv = q_dim + 2 * kv_dim
    reps = n_heads // n_kv_heads
    scale = 1.0 / float(np.sqrt(head_dim))
    subq, subo = tkf // tkc, tof // toc
    on_layer = l < L

    # ---------------- segment entry: load this token's embedding row
    @pl.when((l == 0) & (jl == 0))
    def _():
        @pl.when(t == 0)
        def _():
            x_sc[:] = x_ref[:].astype(jnp.float32)
            # zero the segment KV scratch: rows beyond the tokens decoded so
            # far are read by the masked segment pass (scores are replaced by
            # -inf, but pv = p @ vh still multiplies p=0 against them, and
            # 0 * garbage-NaN = NaN — caught by the kseg>=3 interpret test)
            seg_kv[...] = jnp.zeros_like(seg_kv)

        @pl.when(t > 0)
        def _():
            # DMA'd at the end of token t-1's terminal rows
            x_sc[:] = xemb_sc[:].astype(jnp.float32)

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
            gt = jl * subq + s
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

    # ---------------- phase 2a: rope + KV row/scratch + seed + SEGMENT pass
    @pl.when(on_layer & (jl == nqf))
    def _attn_init():
        # cos/sin carry ALL kseg rows (a (1, D) block of a [kseg, D] array
        # violates Mosaic's 8-divisible sublane rule when kseg % 8 != 0);
        # row t is selected with a one-hot MXU dot
        oh_t = _onehot_rows(t, 1, kseg)
        cos = jax.lax.dot_general(oh_t, cos_ref[:].astype(jnp.float32),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        sin = jax.lax.dot_general(oh_t, sin_ref[:].astype(jnp.float32),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
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
        kvrow_ref[0, 0, 0] = k_q
        kvrow_ref[0, 0, 1] = v_q
        kvsc_ref[0, 0, 0] = k_s.reshape(1, -1)
        kvsc_ref[0, 0, 1] = v_s.reshape(1, -1)

        # the segment scratch keeps the int8-rounded values (exactly what
        # the cache will hold) so in-segment and post-scatter attention agree
        kd_all = k_q.astype(jnp.float32) * k_s
        vd_all = v_q.astype(jnp.float32) * v_s
        seg_kv[l, t, 0] = kd_all
        seg_kv[l, t, 1] = vd_all

        q_sc[:] = q
        for hk in range(n_kv_heads):
            rows = slice(hk * reps, (hk + 1) * reps)
            kd = kd_all[hk]
            vd = vd_all[hk]
            s_new = (q[rows] * kd[None, :]).sum(-1, keepdims=True) * scale
            m_sc[rows] = jnp.broadcast_to(s_new, (reps, head_dim))
            l_sc[rows] = jnp.ones((reps, head_dim), jnp.float32)
            fa_sc[rows] = jnp.broadcast_to(vd[None, :], (reps, head_dim))

        # segment attention: rows decoded earlier in this launch (< t).
        # kseg is small (<= ~16); masked flash-merge over all kseg rows.
        @pl.when(t > 0)
        def _():
            ks_all = seg_kv[l, :, 0]                 # [kseg, Hkv, D]
            vs_all = seg_kv[l, :, 1]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, kseg), 1)
            live = lanes < t
            for hk in range(n_kv_heads):
                rows = slice(hk * reps, (hk + 1) * reps)
                kh = ks_all[:, hk, :]                    # [kseg, D]
                vh = vs_all[:, hk, :]
                s = jax.lax.dot_general(q[rows], kh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ) * scale        # [reps, kseg]
                s = jnp.where(live, s, jnp.finfo(jnp.float32).min)
                m_old = m_sc[rows][:, :1]
                m_new = jnp.maximum(m_old, s.max(axis=-1, keepdims=True))
                corr = jnp.exp(m_old - m_new)
                p = jnp.exp(s - m_new)
                pv = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                fa_sc[rows] = fa_sc[rows] * corr + pv
                l_sc[rows] = l_sc[rows] * corr + p.sum(axis=-1, keepdims=True)
                m_sc[rows] = jnp.broadcast_to(m_new, (reps, head_dim))

    # ---------------- phase 2b: flash over history blocks (rows < pos0)
    @pl.when(on_layer & (jl > nqf) & (jl <= nqf + nt))
    def _attn_flash():
        pos = pos_ref[0]                                # segment START
        tblk = jl - (nqf + 1)

        @pl.when(tblk * tb < pos)
        def _():
            kv_blk = ckv_ref[:][0]
            sc_blk = kvs_ref[:][0]
            k_blk = kv_blk[:, 0].astype(jnp.float32) * sc_blk[:, 0][..., None]
            v_blk = kv_blk[:, 1].astype(jnp.float32) * sc_blk[:, 1][..., None]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
            hist = tblk * tb + lanes < pos
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
        tt = lm_step - 1
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

        lmax = jnp.max(acc)
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, tv), 1)
        lidx = jnp.min(jnp.where(acc == lmax, iot, vocab))
        better = lmax > am_val[0]
        am_val[0] = jnp.where(better, lmax, am_val[0])
        am_idx[0] = jnp.where(better, tt * tv + lidx, am_idx[0])

        @pl.when(lm_step == nv)
        def _():
            tok_ref[:] = (jnp.zeros((1, 8, 128), jnp.int32) + am_idx[0])

    # ---------------- embed-gather steps: stream the table, keep the
    # winner's row. Step g covers vocab tile t2 = g//nh, column chunk
    # c = g%nh; only the tile containing am_idx contributes (one-hot dot).
    # The last segment token needs no next-embed (the caller embeds the
    # next launch's input) — its fetches are clamped by the index map.
    g_step = lm_step - (nv + 1)

    @pl.when((l >= L) & (g_step >= 0) & (g_step < nv * nh)
             & (t < kseg - 1))
    def _emb_gather():
        t2 = g_step // nh
        c = g_step % nh

        @pl.when(am_idx[0] // tv == t2)
        def _():
            oh = _onehot_rows(am_idx[0] - t2 * tv, 1, tv)
            row = jax.lax.dot_general(
                oh, embt_ref[:].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [1, hb]
            xemb_sc[:, pl.ds(pl.multiple_of(c * hb, hb), hb)] = \
                row.astype(xemb_sc.dtype)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "meta", "kseg", "interpret"))
def model_decode_flat_seg(stack, emb, x, cossin, cache, pos0, cfg, meta,
                          kseg, interpret=False):
    """Decode `kseg` greedy tokens in one launch. x [1,1,H] = embedding of
    the first token; emb [V, H] = embedding table (stays in HBM); cossin
    [kseg, 2D] = rope rows for positions pos0..pos0+kseg-1.

    Returns (tokens [kseg, 8, 128] i32 — [:, 0, 0] per row, kvrows
    [kseg, L, 2, Hkv, D] i8, kvscales [kseg, L, 2, 1, Hkv] f32). The caller
    scatters the kseg cache rows with one dynamic_update_slice per field.
    """
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
    # embed-gather tiling: (tv, hb) blocks of the [V, H] table, capped at
    # ~7MB per block — fetch blocks >= ~13MB/operand collapse the scoped-
    # VMEM pipeline 2.6x (r4 sweep; re-hit r5: the f32 13MB gather block
    # made a kseg=9 launch cost as much as 9 per-token launches)
    cap = (7 * 1024 * 1024) // (tv * emb.dtype.itemsize)
    hb = 0
    for c in (1024, 512, 256, 128):
        if h % c == 0 and c <= cap:
            hb = c
            break
    assert hb and vocab % tv == 0
    nh = h // hb
    spl = nqf + 1 + nt + nof + ni
    Lx = -(-(nv + 1 + nv * nh) // spl)
    grid = (kseg, L + Lx, spl)

    kern = functools.partial(
        _kernel_flat_seg, bits=bits, hidden=h, q_dim=q_dim, kv_dim=kv_dim,
        inter=inter_p, n_heads=cfg.num_heads, n_kv_heads=Hkv, head_dim=D,
        vocab=vocab,
        g_qkv=g_qkv, g_o=g_o, g_gu=g_gu, g_d=g_d, g_ue=g_ue,
        zc_qkv=zc_qkv, zc_o=zc_o, zc_gu=zc_gu, zc_d=zc_d, zc_ue=zc_ue,
        nqf=nqf, nof=nof, ni=ni, nt=nt, nv=nv, nh=nh, hb=hb, tb=tb,
        spl=spl, n_layers=L, kseg=kseg,
        tkf=tkf, tkc=tkc, tof=tof, toc=toc, ti=ti, tv=tv,
        out_dtype=x.dtype, rms_eps=cfg.rms_eps,
    )

    lc = lambda l: jnp.minimum(l, L - 1)
    t_qkv = lambda t, l, j, p: jnp.where(l < L, jnp.minimum(j, nqf - 1),
                                         nqf - 1)
    t_o = lambda t, l, j, p: jnp.where(
        l < L, jnp.clip(j - (nqf + nt + 1), 0, nof - 1), nof - 1)
    t_mlp = lambda t, l, j, p: jnp.where(
        l < L, jnp.clip(j - (nqf + nt + nof + 1), 0, ni - 1), ni - 1)
    last_kv = lambda p: jnp.minimum(p[0] // tb, nt - 1)
    t_kv = lambda t, l, j, p: jnp.where(
        l < L, jnp.minimum(jnp.clip(j - (nqf + 1), 0, nt - 1), p[0] // tb),
        last_kv(p))
    t_lm = lambda t, l, j, p: jnp.clip((l - L) * spl + j - 1, 0, nv - 1)
    # embed-gather fetch coordinates: during gather steps walk (t2, c);
    # outside them (and for the last segment token) pin to the last block
    def t_emb(t, l, j, p):
        g = (l - L) * spl + j - (nv + 1)
        g = jnp.clip(g, 0, nv * nh - 1)
        live = (l >= L) & (t < kseg - 1)
        return jnp.where(live, g // nh, 0), jnp.where(live, g % nh, 0)

    def sspec(arr, tkfetch, tilef, g):
        n = max(tkfetch // g, 1)
        if n >= 8 and n % 8 == 0 and arr.shape[1] % n == 0:
            return pl.BlockSpec((1, n, arr.shape[2]),
                                lambda t, l, j, p: (lc(l), tilef(t, l, j, p),
                                                    0))
        if n < 8:
            return pl.BlockSpec(
                (1, 8, arr.shape[2]),
                lambda t, l, j, p: (
                    lc(l), ((tilef(t, l, j, p) * tkfetch) // g) // 8, 0))
        return pl.BlockSpec((1, arr.shape[1], arr.shape[2]),
                            lambda t, l, j, p: (lc(l), 0, 0))

    n_qkv = q_dim + 2 * kv_dim
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h), lambda t, l, j, p: (0, 0)),              # x
            pl.BlockSpec((tv, hb),
                         lambda t, l, j, p: t_emb(t, l, j, p)),         # emb
            pl.BlockSpec((1, 1, h), lambda t, l, j, p: (lc(l), 0, 0)),   # n1
            pl.BlockSpec((1, 1, h), lambda t, l, j, p: (lc(l), 0, 0)),   # n2
            pl.BlockSpec((1, tkf // vpw, n_qkv),
                         lambda t, l, j, p: (lc(l), t_qkv(t, l, j, p), 0)),
            sspec(stack["qs"], tkf, t_qkv, g_qkv),
            pl.BlockSpec((kseg, D), lambda t, l, j, p: (0, 0)),         # cos
            pl.BlockSpec((kseg, D), lambda t, l, j, p: (0, 0)),         # sin
            pl.BlockSpec((1, tb, 2, Hkv, D),
                         lambda t, l, j, p: (lc(l), t_kv(t, l, j, p),
                                             0, 0, 0)),
            pl.BlockSpec((1, tb, 2, Hkv),
                         lambda t, l, j, p: (lc(l), t_kv(t, l, j, p), 0, 0)),
            pl.BlockSpec((1, tof // vpw, h),
                         lambda t, l, j, p: (lc(l), t_o(t, l, j, p), 0)),
            sspec(stack["os"], tof, t_o, g_o),
            pl.BlockSpec((1, h // vpw, 2 * ti),
                         lambda t, l, j, p: (lc(l), 0, t_mlp(t, l, j, p))),
            pl.BlockSpec((1, stack["gus"].shape[1], ti),
                         lambda t, l, j, p: (lc(l), 0, t_mlp(t, l, j, p))),
            pl.BlockSpec((1, ti // vpw, h),
                         lambda t, l, j, p: (lc(l), t_mlp(t, l, j, p), 0)),
            sspec(stack["ds"], ti, t_mlp, g_d),
            pl.BlockSpec((h // vpw, tv),
                         lambda t, l, j, p: (0, t_lm(t, l, j, p))),      # ue
            pl.BlockSpec((stack["ues"].shape[0], tv),
                         lambda t, l, j, p: (0, t_lm(t, l, j, p))),
            pl.BlockSpec((1, h), lambda t, l, j, p: (0, 0)),          # fnorm
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, l, j, p: (t, 0, 0)),  # token
            pl.BlockSpec((1, 1, 2, Hkv, D),
                         lambda t, l, j, p: (t, lc(l), 0, 0, 0)),
            pl.BlockSpec((1, 1, 2, 1, Hkv),
                         lambda t, l, j, p: (t, lc(l), 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),             # residual stream
            pltpu.VMEM((1, h), emb.dtype),               # next-token embed
            pltpu.VMEM((L, kseg, 2, Hkv, D), jnp.float32),  # segment KV
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

    pos_arr = jnp.reshape(pos0, (1,)).astype(jnp.int32)
    cs = cossin.reshape(kseg, 2 * D)
    tok, kvrows, kvsc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((kseg, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((kseg, L, 2, Hkv, D), jnp.int8),
            jax.ShapeDtypeStruct((kseg, L, 2, 1, Hkv), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
    )(
        pos_arr,
        x.reshape(1, h), emb, stack["n1"], stack["n2"],
        stack["qkv"], stack["qs"],
        cs[:, :D], cs[:, D:],
        cache["kv"], cache["kv_scale"],
        stack["o"], stack["os"],
        stack["gu"], stack["gus"],
        stack["d"], stack["ds"],
        stack["ue"], stack["ues"], stack["fnorm"],
    )
    return tok, kvrows, kvsc
