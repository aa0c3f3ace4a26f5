"""Decode block megakernel: ONE Pallas launch per transformer layer per token.

Single-stream decode on TPU is launch-bound (BENCH_DETAILS.md: ~100-150us
residual per-pallas-call overhead in-program): the previous fast path spent 4
launches per layer (fused QKV matmul, fused attention, o_proj, fused MLP).
This kernel executes the ENTIRE decoder block in one `pallas_call` by phasing
a 1-D grid:

    j in [0, NQ)              K-tiled  h = rmsnorm(x); qkv_acc += h_t @ Wqkv_t
    j == NQ                   rope -> int8 KV append -> masked attention
    j in (NQ, NQ+NO]          K-tiled  o_acc += attn_t @ Wo_t
    j in (NQ+NO, NQ+NO+NI]    x_mid = x + o_acc; per-intermediate-tile SwiGLU
                              (gate/up dequant-matmul, silu*mul, down acc)
    last step                 x_out = x_mid + mlp_acc

Design notes (all measured/validated in this environment — see
BENCH_DETAILS.md and scripts/exp_planar_unpack.py):
  * planar unpack: nibble planes are concatenated along rows (a free
    placement) instead of interleave-reshaped (a cross-sublane relayout);
    the matching activation permutation is applied to the tiny [1, TK]
    activation row in-kernel (~13% faster weight streaming).
  * scales/zeros stay in their logical [ngroups, N] layout and are selected
    per tile with a one-hot matmul — no 8-row-aligned pre-expansion buffers
    (the expansion cost 11MB/layer of extra HBM traffic in the MLP).
  * the KV cache is an aliased *input* only; the kernel emits just the NEW
    int8 row + scales, and the caller scatters them (dynamic_update_slice on
    a donated buffer) — halving the previous kernel's cache traffic, which
    wrote the full [T,H,D] buffers back every step.

Fills the role the reference delegates to fastllm's C++ fused CUDA inference
(/root/reference/examples/llama/llama2_to_flm.py) — here the native engine is
this Mosaic kernel.

Scope: B=1, S=1 decode, int8 KV cache, packed int4/int8 weights per
`core/packing.py`, per_group or per_channel scales, no biases / smooth
factors / act quant (the RTN/GPTQ serving configuration). Everything else
falls back to the 4-launch path.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TKA = 512  # streamed contraction tile (hidden axis) for the qkv phase
TO = 512   # streamed contraction tile (q_dim axis) for the o phase
CH = 512   # static MLP contraction chunk (h2 slices; not a streamed block)
TI = 256   # intermediate tile for MLP phases
# Tile sizing balances two costs measured on-chip: fixed ~1.3us/grid-step
# (fewer, larger tiles win) vs the 16MB scoped-vmem budget for the
# double-buffered streamed blocks (smaller tiles win).


def _unpack_planar(w, bits):
    """uint32 [W, N] -> f32 [W*vpw, N], plane-major rows (r = i*W + w).

    The decode megakernel is VPU-unpack-bound (~740 Gvalues/s measured =
    whole-token time), so every per-value op counts: plane 0 needs no shift
    and the top plane needs no mask (logical shift on uint32 already zero-
    fills), saving 2 of the 2*vpw shift/mask ops per word."""
    vpw = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)

    def field(i):
        if i == 0:
            return w & mask
        if i == vpw - 1:
            return w >> jnp.uint32(bits * i)
        return (w >> jnp.uint32(bits * i)) & mask

    parts = [jax.lax.bitcast_convert_type(field(i), jnp.int32)
             for i in range(vpw)]
    return jnp.concatenate(parts, axis=0).astype(jnp.float32)


def _unpack_planar_i(w, bits):
    """`_unpack_planar` without the final f32 convert: raw unsigned fields
    as int32 (MI_DEQ_CENTER=0 grouped path converts at its dot dtype)."""
    vpw = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)

    def field(i):
        if i == 0:
            return w & mask
        if i == vpw - 1:
            return w >> jnp.uint32(bits * i)
        return (w >> jnp.uint32(bits * i)) & mask

    return jnp.concatenate([jax.lax.bitcast_convert_type(field(i), jnp.int32)
                            for i in range(vpw)], axis=0)


def _planar_mat(tk, vpw):
    """[tk, tk] f32 permutation matrix: (row @ P)[l] = row[sigma(l)] with
    sigma(l) = (l % tkw)*vpw + l//tkw — i.e. the plane-major activation order
    matching `_unpack_planar`. Built from iota compares (Mosaic rejects
    1-row reshapes like [1,512]->[1,64,8], so the permutation rides the MXU
    as a tiny dot instead)."""
    tkw = tk // vpw
    a = jax.lax.broadcasted_iota(jnp.int32, (tk, tk), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (tk, tk), 1)
    return (a == (l % tkw) * vpw + l // tkw).astype(jnp.float32)


def _perm_row(row, vpw):
    """[1, tk] activation row -> plane-major order (one MXU dot)."""
    return jax.lax.dot_general(row, _planar_mat(row.shape[1], vpw),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dequant_planar(wq, s, b, bits, group, tn):
    """Planar-rows dequant: wq [vpw*W, tn]; s/b [ng, tn] for this tile.

    Orig k of planar row i*W+w is w*vpw+i, so the group index is
    w // (group/vpw) — independent of the plane i (requires group % vpw == 0).

    b is the precomputed dequant BIAS -(zero - qmin) * scale (see _scales_t),
    so the per-value work is ONE fused multiply-add `q*s + b` instead of the
    two-op `(q - z)*s` — ~20% of the VPU budget of this unpack-bound kernel.
    """
    vpw = 32 // bits
    ng = wq.shape[0] // group
    gw = group // vpw
    wv = wq.reshape(vpw, ng, gw, tn)
    return (wv * s[None, :, None, :] + b[None, :, None, :]).reshape(wq.shape)


def _unpack_planar_centered(w, bits):
    """uint32 [W, N] -> f32 [W*vpw, N] plane-major CENTERED codes q - 2^(b-1).

    Centering the codes before the MXU halves the bf16-pass product rounding
    noise of the grouped-rescale dot (raw codes 0..2^b-1 carry the storage
    offset into every product; measured 1.35e-2 vs 1.09e-2 rel logit noise
    on-chip). Done with NO per-value subtract: one XOR per WORD flips each
    field's MSB, then a left+arithmetic-right shift pair sign-extends the
    field — sign_extend(q XOR 2^(b-1)) == q - 2^(b-1) exactly. ~3 ops/value
    vs the uncentered unpack's ~2.75 (the shift pair replaces shift+mask)."""
    return _unpack_planar_centered_i(w, bits).astype(jnp.float32)


def _unpack_planar_centered_i(w, bits):
    """`_unpack_planar_centered` without the final f32 convert: int32 codes
    (the MI_DEQ_DOT=bf16/i8 paths convert straight to their dot dtype)."""
    vpw = 32 // bits
    msb = 1 << (bits - 1)
    pattern = sum(msb << (bits * i) for i in range(vpw))
    wx = jax.lax.bitcast_convert_type(w ^ jnp.uint32(pattern), jnp.int32)

    def field(i):
        hi = 32 - bits * (i + 1)
        t = wx if hi == 0 else wx << hi
        return t >> (32 - bits)

    return jnp.concatenate([field(i) for i in range(vpw)], axis=0)


def _group_mask(ng, tk, vpw, g):
    """[ng, tk] f32 constant: plane-major row r belongs to group
    (r % (tk//vpw)) // (g//vpw) (see _dequant_planar's index algebra)."""
    tkw = tk // vpw
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, tk), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (ng, tk), 1)
    return ((r % tkw) // (g // vpw) == gi).astype(jnp.float32)


def _qdot(hp, words, s, b, bits, g_eff, tn):
    """Fused dequant-matmul of one streamed tile: hp [B, tk] (plane-major
    permuted activation) x packed words [tk//vpw, tn] with scale/bias rows
    s/b [ng, tn] -> [B, tn].

    Two formulations, selected by MI_DEQ_GROUPED (default ON — measured
    6.37 vs 8.03 ms/token whole-model 7B int4 on v5e via bench.py A/B;
    see scripts/exp_dequant_variants.py + BENCH_DETAILS.md round 3):

    * classic: dequantize the whole tile (per-value FMA q*s+b, with the
      [ng, tn] rows broadcast to [tk, tn]) then one dot.
    * grouped rescale: never dequantize. One dot of the group-masked
      activation against the CENTERED raw codes gives per-group partial
      sums D[g] = sum_{k in g} x_k (q_k - 2^(b-1)); then
      y = sum_g s[g]*D[g] + (b[g] + 2^(b-1) s[g])*xs[g] applies scale/bias
      on [ng, tn] instead of [tk, tn] — removing the per-value FMA from
      this VPU-bound kernel. The extra MXU rows are free (8-row
      granularity), the centered codes are exact in the MXU's bf16 passes,
      and centering keeps product magnitudes at signal scale (uncentered
      codes measurably doubled the bf16-pass rounding noise on-chip).
    """
    import os

    vpw = 32 // bits
    tk = hp.shape[1]
    ng = max(tk // g_eff, 1)
    bsz = hp.shape[0]
    if os.environ.get("MI_DEQ_GROUPED", "1") == "0" or g_eff % vpw:
        wq = _unpack_planar(words, bits)          # [tk, tn]
        wd = _dequant_planar(wq, s, b, bits, g_eff, tn)
        return jax.lax.dot_general(hp, wd, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    # MI_DEQ_DOT selects the MXU pass structure of the grouped dot (r5):
    #   f32  : f32 x f32 dot — Mosaic lowers it as MULTI-pass bf16 products
    #          (the r4 default; accuracy anchor)
    #   bf16 : cast centered codes + masked activations to bf16, ONE MXU
    #          pass. The codes (|q|<=2^(b-1)) are exact in bf16; only the
    #          activation rounds (2^-9 rel), on top of an int4 grid.
    #   i8   : quantize the masked activation rows to int8 (per-row absmax)
    #          and dot int8 x int8 -> int32 in ONE pass at double MXU rate;
    #          rescale per group. W4A8-like numerics on the weight matmuls.
    # Dot-pass selection (r5 A/B, all measured end-to-end on v5e):
    #   bsz=1  f32 155.8 tok/s > i8 154.1 > bf16 146.4 (int32->bf16/int8
    #          repacks cost more VPU than any MXU-pass saving)
    #   bsz=8  batched kernel-only: f32 11.93 ms ~= bf16 12.48 — the
    #          hypothesized f32 multi-pass MXU cost is NOT binding at B=8
    #          either; see scripts/exp_batched_breakdown.py.
    # f32 stays the default everywhere; MI_DEQ_DOT / MI_DEQ_DOT_B keep the
    # variants A/B-able.
    if bsz > 1:
        dot_mode = os.environ.get("MI_DEQ_DOT_B", "f32")
    else:
        dot_mode = os.environ.get("MI_DEQ_DOT", "f32")
    # MI_DEQ_CENTER=0 (r5 A/B): unpack RAW unsigned fields — shift+and is
    # ~1.75 VPU ops/value vs the centered shift-pair's ~2.0 (the convert is
    # common), trading ~8% of the unpack budget for the uncentered codes'
    # larger bf16-pass product noise (measured r4: 1.35e-2 vs 1.09e-2 rel).
    centered = os.environ.get("MI_DEQ_CENTER", "1") != "0"
    if centered:
        wq32 = _unpack_planar_centered_i(words, bits)  # int32 codes - off
        off = float(1 << (bits - 1))              # fold the centering back
    else:
        wq32 = _unpack_planar_i(words, bits)      # raw unsigned fields
        off = 0.0
    mask = _group_mask(ng, tk, vpw, g_eff)
    xg = (hp[:, None, :] * mask[None]).reshape(bsz * ng, tk)
    if dot_mode == "i8":
        amax = jnp.clip(jnp.max(jnp.abs(xg), axis=1, keepdims=True),
                        1e-20, None)
        sx = amax / 127.0
        xq = jnp.round(xg / sx).astype(jnp.int8)
        d = jax.lax.dot_general(xq, wq32.astype(jnp.int8),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        d = d.astype(jnp.float32) * sx
    else:
        if dot_mode == "bf16":
            wq = wq32.astype(jnp.bfloat16)
            xc = xg.astype(jnp.bfloat16)
        else:
            wq = wq32.astype(jnp.float32)
            xc = xg
        d = jax.lax.dot_general(xc, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    xs = jnp.sum(xg, axis=1, keepdims=True)       # [B*ng, 1]
    y = (d.reshape(bsz, ng, tn) * s[None]
         + (b + off * s)[None] * xs.reshape(bsz, ng, 1))
    return jnp.sum(y, axis=1)


def _onehot_rows(start, n, total):
    """[n, total] f32 one-hot selecting rows [start, start+n) (traced start)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, total), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, total), 1)
    return (c == r + start).astype(jnp.float32)


def _scale_block_rows(tile_k, g):
    """Rows of the scale BLOCK streamed per tile (see _scale_spec)."""
    n = max(tile_k // g, 1)
    return max(n, 8)


def _scale_spec(nlanes, tk, g, tile_of_j):
    """BlockSpec walking the logical [ngroups, N] scale layout: the grid
    streams only the ~8 rows each tile needs instead of holding the whole
    (multi-MB, double-buffered) array in VMEM."""
    n = max(tk // g, 1)
    if n >= 8:
        return pl.BlockSpec((n, nlanes), lambda j, p: (tile_of_j(j, p), 0))
    return pl.BlockSpec(
        (8, nlanes), lambda j, p: (((tile_of_j(j, p) * tk) // g) // 8, 0))


def _select_sz(s_ref, z_ref, tile_idx, tile_k, g):
    """Select this K-tile's scale/zero rows from its streamed block (the
    block holds exactly the tile's rows when groups-per-tile >= 8; otherwise
    an 8-row window selected here by a one-hot matmul — Mosaic cannot prove
    alignment of dynamic row slices).

    Returns (s, z, g_eff) with g_eff the effective in-tile group size."""
    n = max(tile_k // g, 1)
    R = s_ref.shape[0]
    if n == R:
        return s_ref[:], z_ref[:], min(g, tile_k)
    lo = ((tile_idx * tile_k) // g) % R
    oh = _onehot_rows(lo, n, R)
    s = jax.lax.dot_general(oh, s_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = jax.lax.dot_general(oh, z_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s, z, min(g, tile_k)


def _select_s(s_ref, tile_idx, tile_k, g):
    """`_select_sz` for the scale table alone (constant-zero kernel variants
    skip the bias table read entirely; see model_fused)."""
    n = max(tile_k // g, 1)
    R = s_ref.shape[0]
    if n == R:
        return s_ref[:], min(g, tile_k)
    lo = ((tile_idx * tile_k) // g) % R
    oh = _onehot_rows(lo, n, R)
    s = jax.lax.dot_general(oh, s_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s, min(g, tile_k)


def _rope_rows(x, cos, sin):
    D = x.shape[-1]
    half = D // 2
    x1, x2 = x[:, :half], x[:, half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def _kernel(
    # scalar prefetch
    pos_ref,
    # inputs
    x_ref, n1t_ref, xt_ref,
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
    qkv_acc, attn_sc, oacc_sc, xmid_sc, h2_sc, mlp_acc,
    q_sc, m_sc, l_sc, fa_sc,
    *,
    bits, hidden, q_dim, kv_dim, inter,
    n_heads, n_kv_heads, head_dim, max_len,
    g_qkv, g_o, g_gu, g_d, nq, no, ni, nt, tb, out_dtype, rms_eps,
):
    j = pl.program_id(0)
    vpw = 32 // bits
    tkw = TKA // vpw
    eps = rms_eps
    n_qkv = q_dim + 2 * kv_dim

    # ---------------- phase 1: j in [0, nq) — qkv_acc += h_tile @ Wqkv_tile
    @pl.when(j < nq)
    def _qkv():
        @pl.when(j == 0)
        def _():
            qkv_acc[:] = jnp.zeros_like(qkv_acc)

        xf = x_ref[:].astype(jnp.float32)
        rstd = jax.lax.rsqrt(jnp.mean(xf * xf) + eps)
        ht = (xt_ref[:].astype(jnp.float32) * rstd).astype(x_ref.dtype)
        ht = (ht * n1t_ref[:]).astype(jnp.float32)          # [1, TKA]
        hp = _perm_row(ht, vpw)
        s, z, ge = _select_sz(qs_ref, qz_ref, j, TKA, g_qkv)
        # chunk the N axis to bound the unpacked f32 transient
        cn = 1024 if n_qkv % 1024 == 0 else n_qkv
        for c in range(n_qkv // cn):
            sl = slice(c * cn, (c + 1) * cn)
            qkv_acc[:, sl] += _qdot(hp, qkv_ref[:, sl], s[:, sl], z[:, sl],
                                    bits, ge, cn)

    reps = n_heads // n_kv_heads
    scale = 1.0 / float(np.sqrt(head_dim))

    # ---------------- phase 2a: j == nq — rope + int8 KV row + flash init
    # The new token seeds the flash state with its own (dequantized) k/v —
    # exactly what the cache will hold next step — so history blocks stream
    # afterwards without ever materializing full [T,·,·] buffers in VMEM.
    @pl.when(j == nq)
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
        ksrow_ref[:] = k_s.reshape(1, -1)
        vsrow_ref[:] = v_s.reshape(1, -1)

        q_sc[:] = q
        for hk in range(n_kv_heads):
            rows = slice(hk * reps, (hk + 1) * reps)
            kd = k_q[hk].astype(jnp.float32) * k_s[hk]
            vd = v_q[hk].astype(jnp.float32) * v_s[hk]
            s_new = (q[rows] * kd[None, :]).sum(-1, keepdims=True) * scale
            m_sc[rows] = jnp.broadcast_to(s_new, (reps, head_dim))
            l_sc[rows] = jnp.ones((reps, head_dim), jnp.float32)
            fa_sc[rows] = jnp.broadcast_to(vd[None, :], (reps, head_dim))

    # ---------------- phase 2b: j in (nq, nq+nt] — flash over history blocks
    # Blocks past the live prefix are skipped (their index maps clamp to the
    # last live block, so they cost no HBM traffic either).
    @pl.when((j > nq) & (j <= nq + nt))
    def _attn_flash():
        pos = pos_ref[0]
        t = j - (nq + 1)

        @pl.when(t * tb < pos)
        def _():
            k_blk = ck_ref[:].astype(jnp.float32) * ks_ref[:][..., None]  # [TB,Hkv,D]
            v_blk = cv_ref[:].astype(jnp.float32) * vs_ref[:][..., None]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
            hist = t * tb + lanes < pos  # strictly past; new row was seeded
            for hk in range(n_kv_heads):
                rows = slice(hk * reps, (hk + 1) * reps)
                kh = k_blk[:, hk, :]
                vh = v_blk[:, hk, :]
                s = jax.lax.dot_general(q_sc[rows], kh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                s = jnp.where(hist, s, jnp.finfo(jnp.float32).min)  # [reps, TB]
                m_old = m_sc[rows][:, :1]
                m_new = jnp.maximum(m_old, s.max(axis=-1, keepdims=True))
                corr = jnp.exp(m_old - m_new)
                p = jnp.exp(s - m_new)
                pv = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                fa_sc[rows] = fa_sc[rows] * corr + pv
                l_sc[rows] = l_sc[rows] * corr + p.sum(axis=-1, keepdims=True)
                m_sc[rows] = jnp.broadcast_to(m_new, (reps, head_dim))

    # ---------------- phase 3: j in (nq+nt, nq+nt+no] — o_acc += attn_t @ Wo_t
    @pl.when((j > nq + nt) & (j <= nq + nt + no))
    def _oproj():
        kt = j - (nq + nt + 1)

        @pl.when(kt == 0)
        def _():
            oacc_sc[:] = jnp.zeros_like(oacc_sc)
            # finalize flash attention; store per-TKA chunks pre-permuted into
            # plane-major order (static row writes; 1-row reshapes beyond
            # [1, n] are not Mosaic-legal)
            out = fa_sc[:] / l_sc[:]
            flat = out.reshape(1, q_dim)
            pm = _planar_mat(TO, vpw)
            for r in range(q_dim // TO):
                attn_sc[r:r + 1, :] = jax.lax.dot_general(
                    flat[:, r * TO:(r + 1) * TO], pm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        # attn_sc rows are already plane-major
        ap = jax.lax.dot_general(_onehot_rows(kt, 1, attn_sc.shape[0]), attn_sc[:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [1, TO]
        s, z, ge = _select_sz(os_ref, oz_ref, kt, TO, g_o)
        cn = 1024 if hidden % 1024 == 0 else hidden
        for c in range(hidden // cn):
            sl = slice(c * cn, (c + 1) * cn)
            oacc_sc[:, sl] += _qdot(ap, o_ref_w[:, sl], s[:, sl], z[:, sl],
                                    bits, ge, cn)

    # ---------------- phase 4: MLP tiles — j in (nq+nt+no, nq+nt+no+ni]
    @pl.when(j > nq + nt + no)
    def _mlp():
        m = j - (nq + nt + no + 1)

        @pl.when(m == 0)
        def _():
            xmid = x_ref[:].astype(jnp.float32) + oacc_sc[:]
            xmid_sc[:] = xmid
            rstd2 = jax.lax.rsqrt(jnp.mean(xmid * xmid) + eps)
            h2 = (xmid * rstd2).astype(out_dtype)
            h2 = (h2 * n2_ref[:]).astype(jnp.float32)
            # store h2 per-TK chunks pre-permuted (plane-major within chunk)
            pm = _planar_mat(CH, vpw)
            for r in range(hidden // CH):
                h2_sc[:, r * CH:(r + 1) * CH] = jax.lax.dot_general(
                    h2[:, r * CH:(r + 1) * CH], pm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            mlp_acc[:] = jnp.zeros_like(mlp_acc)

        # gate/up contract the full hidden axis per tile, in TK chunks with
        # chunk-local plane-major layout (all slices static: r is a python int)
        # gus/guz carry [2*ngh, TI] per tile: rows [0:ngh] gate, [ngh:] up
        ngh = max(hidden // g_gu, 1)
        g_eff = min(g_gu, CH)
        ngc = max(CH // g_gu, 1)
        chw = CH // vpw
        gate = jnp.zeros((1, TI), jnp.float32)
        up = jnp.zeros((1, TI), jnp.float32)
        for r in range(hidden // CH):
            hp_r = h2_sc[:, r * CH:(r + 1) * CH]
            rs = (r * CH) // g_gu
            rows = slice(r * chw, (r + 1) * chw)
            gate += _qdot(hp_r, g_ref[rows, :], gus_ref[rs:rs + ngc, :],
                          guz_ref[rs:rs + ngc, :], bits, g_eff, TI)
            up += _qdot(hp_r, u_ref[rows, :], gus_ref[ngh + rs:ngh + rs + ngc, :],
                        guz_ref[ngh + rs:ngh + rs + ngc, :], bits, g_eff, TI)
        act = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up  # [1, TI]

        ap = _perm_row(act, vpw)
        sd, zd, ged = _select_sz(ds_ref, dz_ref, m, TI, g_d)
        cn = 1024 if hidden % 1024 == 0 else hidden
        for c in range(hidden // cn):
            sl = slice(c * cn, (c + 1) * cn)
            mlp_acc[:, sl] += _qdot(ap, d_ref[:, sl], sd[:, sl], zd[:, sl],
                                    bits, ged, cn)

        @pl.when(m == ni - 1)
        def _():
            xo_ref[:] = (xmid_sc[:] + mlp_acc[:]).astype(xo_ref.dtype)


# ---------------------------------------------------------------------------
# wrapper / preparation
# ---------------------------------------------------------------------------

def _pad_rows8(a):
    r = a.shape[0]
    pad = (-r) % 8
    if pad:
        a = jnp.concatenate([a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], 0)
    return a


def _scales_t(lin) -> tuple:
    """Logical per-linear scales -> kernel layout [ngroups, out] f32.

    Returns (scale, bias, group) with bias = -(zero - qmin)*scale, so the
    kernel dequantizes unpacked unsigned fields q' with one FMA:
    (q' + qmin - zero)*scale == q'*scale + bias (see _dequant_planar)."""
    from ..core.qparams import qrange

    s = lin.spec
    g = s.w_groupsize if (s.w_qtype == "per_group" and s.w_groupsize > 0) else lin.in_features
    ng = lin.in_features // g
    n = lin.out_features
    rng = qrange(s.wbit, s.w_unsigned)
    st = jnp.broadcast_to(jnp.reshape(lin.w_scale, (-1, ng)).T, (ng, n)).astype(jnp.float32)
    zt = jnp.broadcast_to(jnp.reshape(lin.w_zero, (-1, ng)).T, (ng, n)).astype(jnp.float32)
    return st, -(zt - float(rng.qmin)) * st, g


def _lin_ok(lin, cfg) -> bool:
    if lin is None or lin.packed is None:
        return False
    if lin.bias is not None or lin.smooth_factor is not None:
        return False
    if lin.a_scale is not None or lin.perm is not None:
        return False
    s = lin.spec
    if s.wbit not in (2, 4, 8) or s.abit is not None:
        return False
    if s.w_qtype not in ("per_group", "per_channel"):
        return False
    g = s.w_groupsize if s.w_qtype == "per_group" else lin.in_features
    vpw = 32 // s.wbit
    if g % vpw:
        return False
    return True


def block_mega_supported(blk: Dict[str, Any], cfg) -> bool:
    """Whether the one-launch decode megakernel applies to this block."""
    if "qkv_proj" not in blk or "gateup_proj" not in blk:
        return False
    lins = [blk["qkv_proj"], blk["o_proj"], blk["gateup_proj"], blk["down_proj"]]
    if not all(_lin_ok(l, cfg) for l in lins):
        return False
    if len({l.spec.wbit for l in lins}) != 1:
        return False
    h, q_dim = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    inter = cfg.intermediate_size
    if h % CH or q_dim % TO or inter % TI:
        return False
    if cfg.rotary_dim not in (-1, cfg.head_dim) or cfg.rope_interleaved:
        return False

    def grp(lin):
        s = lin.spec
        return s.w_groupsize if s.w_qtype == "per_group" and s.w_groupsize > 0 else lin.in_features

    for lin, tile in ((blk["qkv_proj"], TKA), (blk["o_proj"], TO),
                      (blk["down_proj"], TI)):
        g = grp(lin)
        if not (tile % g == 0 or g % tile == 0):
            return False
    if h % grp(blk["gateup_proj"]):
        return False
    return True


def prepare_block(blk: Dict[str, Any], cfg) -> Dict[str, jnp.ndarray]:
    """Precompute kernel-layout scale/bias arrays for one block (fuse time).

    The *z keys hold the FMA dequant bias -(zero-qmin)*scale, not the zero."""
    qs, qz, _ = _scales_t(blk["qkv_proj"])
    os_, oz, _ = _scales_t(blk["o_proj"])
    gus, guz, _ = _scales_t(blk["gateup_proj"])
    ds, dz, _ = _scales_t(blk["down_proj"])
    inter = cfg.intermediate_size
    # gate rows stacked over up rows, per output tile: [2*ngh, inter]
    gus2 = jnp.concatenate([gus[:, :inter], gus[:, inter:]], axis=0)
    guz2 = jnp.concatenate([guz[:, :inter], guz[:, inter:]], axis=0)
    return {
        "qs": _pad_rows8(qs), "qz": _pad_rows8(qz),
        "os": _pad_rows8(os_), "oz": _pad_rows8(oz),
        "gus": _pad_rows8(gus2), "guz": _pad_rows8(guz2),
        "ds": _pad_rows8(ds), "dz": _pad_rows8(dz),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def block_decode_mega(blk, mega, x, cos, sin, cache, pos, cfg, interpret=False):
    """One decoder block, one Pallas launch. x [1,1,H] -> (x_out, new_cache).

    The KV cache is consumed read-only; the kernel returns just the new int8
    row + scales and this wrapper scatters them (in-place on donated buffers
    under jit) — half the cache traffic of a full write-back.
    """
    h = cfg.hidden_size
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size
    qkv, o_l, gu, dn = blk["qkv_proj"], blk["o_proj"], blk["gateup_proj"], blk["down_proj"]
    bits = qkv.spec.wbit
    vpw = 32 // bits

    def grp(lin):
        s = lin.spec
        return s.w_groupsize if s.w_qtype == "per_group" and s.w_groupsize > 0 else lin.in_features

    nq, no, ni = h // TKA, q_dim // TO, inter // TI
    max_len = cache["k"].shape[1]
    # adaptive flash block: long caches take 256-token history blocks —
    # half the grid steps (the live-prefix clamp skips dead-block TRAFFIC
    # but each block is still a ~1.3us grid step)
    tb = 256 if (max_len % 256 == 0 and max_len >= 1024) else 128
    assert max_len % tb == 0, "cache length must be a multiple of 128"
    nt = max_len // tb
    grid = nq + 1 + nt + no + ni
    n_qkv = q_dim + 2 * kv_dim
    x_row = x.reshape(1, h)

    kern = functools.partial(
        _kernel, bits=bits, hidden=h, q_dim=q_dim, kv_dim=kv_dim, inter=inter,
        n_heads=cfg.num_heads, n_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, max_len=max_len,
        g_qkv=grp(qkv), g_o=grp(o_l), g_gu=grp(gu), g_d=grp(dn),
        nq=nq, no=no, ni=ni, nt=nt, tb=tb, out_dtype=x.dtype,
        rms_eps=cfg.rms_eps,
    )

    mlp0 = nq + nt + no + 1
    t_qkv = lambda j, p: jnp.minimum(j, nq - 1)
    t_o = lambda j, p: jnp.clip(j - (nq + nt + 1), 0, no - 1)
    t_mlp = lambda j, p: jnp.clip(j - mlp0, 0, ni - 1)
    # live-prefix clamp: history blocks beyond pos are never fetched (the
    # index pins at the last live block, so repeats cost no copies)
    t_kv = lambda j, p: jnp.minimum(jnp.clip(j - (nq + 1), 0, nt - 1),
                                    p[0] // tb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, h), lambda j, p: (0, 0)),                    # x full
            pl.BlockSpec((1, TKA), lambda j, p: (0, t_qkv(j, p))),        # n1 tile
            pl.BlockSpec((1, TKA), lambda j, p: (0, t_qkv(j, p))),        # x tile
            pl.BlockSpec((TKA // vpw, n_qkv),
                         lambda j, p: (t_qkv(j, p), 0)),                  # qkv packed
            _scale_spec(n_qkv, TKA, grp(qkv), t_qkv),
            _scale_spec(n_qkv, TKA, grp(qkv), t_qkv),
            pl.BlockSpec((1, cfg.head_dim), lambda j, p: (0, 0)),         # cos
            pl.BlockSpec((1, cfg.head_dim), lambda j, p: (0, 0)),         # sin
            pl.BlockSpec((tb,) + cache["k"].shape[2:],
                         lambda j, p: (t_kv(j, p), 0, 0)),                # ck
            pl.BlockSpec((tb,) + cache["v"].shape[2:],
                         lambda j, p: (t_kv(j, p), 0, 0)),                # cv
            pl.BlockSpec((tb, cfg.num_kv_heads), lambda j, p: (t_kv(j, p), 0)),
            pl.BlockSpec((tb, cfg.num_kv_heads), lambda j, p: (t_kv(j, p), 0)),
            pl.BlockSpec((TO // vpw, h), lambda j, p: (t_o(j, p), 0)),    # o packed
            _scale_spec(h, TO, grp(o_l), t_o),
            _scale_spec(h, TO, grp(o_l), t_o),
            pl.BlockSpec((1, h), lambda j, p: (0, 0)),                    # n2
            pl.BlockSpec((h // vpw, TI),
                         lambda j, p: (0, t_mlp(j, p))),                  # gate
            pl.BlockSpec((h // vpw, TI),
                         lambda j, p: (0, ni + t_mlp(j, p))),             # up
            pl.BlockSpec((mega["gus"].shape[0], TI),
                         lambda j, p: (0, t_mlp(j, p))),
            pl.BlockSpec((mega["guz"].shape[0], TI),
                         lambda j, p: (0, t_mlp(j, p))),
            pl.BlockSpec((TI // vpw, h), lambda j, p: (t_mlp(j, p), 0)),  # down
            _scale_spec(h, TI, grp(dn), t_mlp),
            _scale_spec(h, TI, grp(dn), t_mlp),
        ],
        out_specs=[
            pl.BlockSpec((1, h), lambda j, p: (0, 0)),                    # x_out
            pl.BlockSpec((1, cfg.num_kv_heads, cfg.head_dim), lambda j, p: (0, 0, 0)),
            pl.BlockSpec((1, cfg.num_kv_heads, cfg.head_dim), lambda j, p: (0, 0, 0)),
            pl.BlockSpec((1, cfg.num_kv_heads), lambda j, p: (0, 0)),
            pl.BlockSpec((1, cfg.num_kv_heads), lambda j, p: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n_qkv), jnp.float32),        # qkv_acc
            pltpu.VMEM((q_dim // TO, TO), jnp.float32),  # attn rows
            pltpu.VMEM((1, h), jnp.float32),            # o acc
            pltpu.VMEM((1, h), jnp.float32),            # x_mid
            pltpu.VMEM((1, h), jnp.float32),            # h2 (planar)
            pltpu.VMEM((1, h), jnp.float32),            # mlp acc
            pltpu.VMEM((cfg.num_heads, cfg.head_dim), jnp.float32),  # q
            pltpu.VMEM((cfg.num_heads, cfg.head_dim), jnp.float32),  # flash m
            pltpu.VMEM((cfg.num_heads, cfg.head_dim), jnp.float32),  # flash l
            pltpu.VMEM((cfg.num_heads, cfg.head_dim), jnp.float32),  # flash acc
        ],
    )

    pos_arr = jnp.reshape(pos, (1,)).astype(jnp.int32)
    x_out, krow, vrow, ksrow, vsrow = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, h), x.dtype),
            jax.ShapeDtypeStruct((1, cfg.num_kv_heads, cfg.head_dim), jnp.int8),
            jax.ShapeDtypeStruct((1, cfg.num_kv_heads, cfg.head_dim), jnp.int8),
            jax.ShapeDtypeStruct((1, cfg.num_kv_heads), jnp.float32),
            jax.ShapeDtypeStruct((1, cfg.num_kv_heads), jnp.float32),
        ],
        interpret=interpret,
        # retuned tiles need >16MB scoped VMEM (see model_fused.py)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(
        pos_arr,
        x_row, blk["input_norm"].reshape(1, h), x_row,
        qkv.packed, mega["qs"], mega["qz"],
        cos.reshape(1, cfg.head_dim), sin.reshape(1, cfg.head_dim),
        cache["k"][0], cache["v"][0], cache["k_scale"][0], cache["v_scale"][0],
        o_l.packed, mega["os"], mega["oz"],
        blk["post_norm"].reshape(1, h),
        gu.packed, gu.packed, mega["gus"], mega["guz"],
        dn.packed, mega["ds"], mega["dz"],
    )

    # keep the cache scatter OUT of the pallas fusion: fused, its outputs are
    # charged against XLA's 16MB scoped-vmem budget and the kernel overflows
    x_out, krow, vrow, ksrow, vsrow = jax.lax.optimization_barrier(
        (x_out, krow, vrow, ksrow, vsrow))
    upd = lambda buf, new: jax.lax.dynamic_update_slice(
        buf, new[None].astype(buf.dtype), (0, pos) + (0,) * (buf.ndim - 2))
    new_cache = {
        "k": upd(cache["k"], krow),
        "v": upd(cache["v"], vrow),
        "k_scale": upd(cache["k_scale"], ksrow),
        "v_scale": upd(cache["v_scale"], vsrow),
    }
    return x_out.reshape(x.shape), new_cache
