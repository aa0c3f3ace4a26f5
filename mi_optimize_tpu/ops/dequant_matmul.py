"""Fused dequantize+matmul Pallas kernels for packed-int weights (W4A16 / W8A16).

This replaces the reference's unpack→dequant→F.linear chain
(/root/reference/mi_optimize/export/qnn.py:82-157), which materializes the full
fp16 weight matrix in HBM on every call. Here the packed uint32 words stream
HBM→VMEM once; nibbles/bytes are unpacked and dequantized on the VPU inside the
tile, and the MXU consumes the dequantized tile directly — the fp weights never
touch HBM. For decode (HBM-bandwidth-bound) this is a ~4x (int4) / ~2x (int8)
traffic reduction versus bf16 weights, which sets the speed-of-light target.

Layout contract (core/packing.pack_weight): packed is words-major uint32
[K·bits/32, N] — word-row w holds in-features [w·vpw, (w+1)·vpw) of every
output channel, little-endian within the word. Trailing dim N is always
128-aligned for llama shapes, so Mosaic block constraints (last dim % 128)
hold for any K (including 11008, whose word count 1376 is not 128-divisible).
Scales/zeros are passed as [ngroups, N] with ngroups resident per tile
(ngroups ≤ K/128 — a few KB), sliced per K-step inside the kernel.

Grid: (M/TM, N/TN, K/TK), K innermost; f32 accumulation in VMEM scratch,
output written on the last K step (standard revisiting-accumulator pattern).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _unpack_words(w: jnp.ndarray, bits: int) -> jnp.ndarray:
    """uint32 [TKW, TN] -> unsigned grid values [TKW*vpw, TN] int32 (words-major).

    Masked values fit in [0, 2^bits), so the uint32->int32 bitcast is value-
    preserving (Mosaic has no direct uint32->f32 cast).
    """
    vpw = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    parts = [jax.lax.bitcast_convert_type((w >> jnp.uint32(bits * i)) & mask, jnp.int32)
             for i in range(vpw)]
    stacked = jnp.stack(parts, axis=1)  # [TKW, vpw, TN]
    return stacked.reshape(w.shape[0] * vpw, w.shape[1])


def _unpack_words_planar(w: jnp.ndarray, bits: int) -> jnp.ndarray:
    """uint32 [TKW, TN] -> f32 [TKW*vpw, TN] with PLANE-MAJOR rows.

    Row i*TKW + w holds value i of word w (orig in-feature w*vpw + i). Unlike
    `_unpack_words`, the planes are concatenated along rows — a free placement
    instead of a cross-sublane interleave relayout; measured ~13% faster
    weight streaming (scripts/exp_planar_unpack.py: 22.7 vs 26.2 us marginal
    per 4096x4096 int4 matmul). Requires the activation columns permuted to
    match (see `_planar_perm_x`).
    """
    vpw = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)

    def field(i):  # plane 0 needs no shift; the top plane needs no mask
        if i == 0:
            return w & mask
        if i == vpw - 1:
            return w >> jnp.uint32(bits * i)
        return (w >> jnp.uint32(bits * i)) & mask

    parts = [jax.lax.bitcast_convert_type(field(i), jnp.int32)
             for i in range(vpw)]
    return jnp.concatenate(parts, axis=0).astype(jnp.float32)


def _planar_perm_x(x: jnp.ndarray, tk: int, vpw: int) -> jnp.ndarray:
    """Permute x columns into per-K-tile plane-major order (once, outside the
    kernel — the relayout is M*K vs the kernel's K*N if done on weights)."""
    m, k = x.shape
    tkw = tk // vpw
    return (x.reshape(m, k // tk, tkw, vpw).transpose(0, 1, 3, 2)
            .reshape(m, k))


def _kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, bits, ng_tile, tk, nk,
            planar, grouped):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # scales arrive pre-expanded per K tile (rows 0:ng_tile of this block) —
    # static slicing only; Mosaic cannot prove alignment of dynamic row slices.
    # b is the precomputed dequant bias -(zero-qmin)*scale: one FMA per value
    # instead of the two-op (q - z)*s (this kernel is VPU-unpack-bound).
    s = s_ref[0:ng_tile, :]
    b = z_ref[0:ng_tile, :]
    vpw = 32 // bits
    group = tk // ng_tile
    if grouped:
        # grouped-rescale formulation (round 3, same as the megakernel's
        # block_fused._qdot): MXU dot on CENTERED raw codes + per-group
        # rescale on [ng, TN] — no per-value FMA. Only selected for small M
        # (decode): the masked activation costs M*ng MXU rows, a pure win
        # when the kernel is VPU-dequant-bound but a loss for MXU-bound
        # prefill tiles.
        from .block_fused import _qdot

        acc_ref[:] += _qdot(x_ref[:], w_ref[:], s, b, bits, group,
                            w_ref.shape[1])
    else:
        if planar:
            wq = _unpack_words_planar(w_ref[:], bits)  # [TK, TN] plane-major
            tn = wq.shape[1]
            # planar row i*TKW+w is orig k = w*vpw+i -> group w // (group/vpw),
            # independent of the plane i (planar requires group % vpw == 0)
            wv = wq.reshape(vpw, ng_tile, group // vpw, tn)
            wd = (wv * s[None, :, None, :] + b[None, :, None, :]).reshape(tk, tn)
        else:
            wq = _unpack_words(w_ref[:], bits).astype(jnp.float32)  # [TK, TN]
            tn = wq.shape[1]
            if ng_tile == 1:
                wd = wq * s + b
            else:
                wd = (wq.reshape(ng_tile, group, tn) * s[:, None, :]
                      + b[:, None, :]).reshape(tk, tn)

        x = x_ref[:]
        acc_ref[:] += jax.lax.dot_general(
            x, wd.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _packed_matmul_local(
    x: jnp.ndarray,
    packed_t: jnp.ndarray,
    scales_t: jnp.ndarray,
    zeros_t: jnp.ndarray,
    *,
    bits: int,
    groupsize: int,
    qmin: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[M,N] = x[M,K] @ dequant(packed)^T with fused in-VMEM dequantization.

    packed_t: uint32 [K·bits/32, N] (words-major); scales_t/zeros_t: [ngroups, N].
    groupsize <= 0 means per-channel (one group spanning K). `qmin` biases the
    stored unsigned field back onto the signed grid when w_unsign=False.

    Shapes here are LOCAL (per-shard) — under tensor parallelism this body runs
    inside `custom_partitioning`'s per-device lowering (see `packed_matmul`).
    """
    M, K = x.shape
    N = packed_t.shape[1]
    g = groupsize if groupsize > 0 else K
    # zero-point seen by the kernel absorbs the storage bias (stored = q - qmin);
    # folded with the scale into the FMA dequant bias -(zero-qmin)*scale
    s_t = scales_t.astype(jnp.float32)
    z_eff = -(zeros_t.astype(jnp.float32) - float(qmin)) * s_t
    ngroups = K // g
    assert s_t.shape == (ngroups, N) and z_eff.shape == (ngroups, N)

    vpw = 32 // bits
    TM = _pick_tile(M, (256, 128, 64, 32, 16, 8))
    TN = _pick_tile(N, (512, 256, 128))
    # K tile: word-rows must be sublane-aligned (mult of 8) => TK mult of 8*vpw;
    # also align to the group structure (TK%g==0 or g%TK==0)
    TK = None
    for cand in (512, 1024, 256, 2048):
        if K % cand or (cand // vpw) % 8:
            continue
        if cand % g == 0 or g % cand == 0:
            TK = cand
            break
    if TK is None:
        TK = K  # full-K tile: block covers the whole word axis (always legal)

    nk = K // TK
    ng_tile = max(TK // g, 1)
    # pre-expand scales per K tile into 8-row-aligned blocks: row r of tile k
    # holds group (k·TK)//g + r; unused pad rows are never read by the kernel
    R = max(8, -(-ng_tile // 8) * 8)
    # jnp.arange (lax.iota) rather than np: custom_partitioning's per-shard
    # trace rejects captured non-scalar constants (no jaxpr consts allowed)
    src = jnp.minimum(
        (jnp.arange(nk)[:, None] * TK) // g + jnp.arange(R)[None, :], ngroups - 1
    ).reshape(-1)
    s_exp = s_t[src]  # [nk*R, N]
    z_exp = z_eff[src]

    grid = (M // TM, N // TN, nk)

    planar = (TK // ng_tile) % vpw == 0
    if planar:
        x = _planar_perm_x(x, TK, vpw)
    # grouped rescale only where the kernel is VPU-dequant-bound (small M,
    # i.e. decode); prefill tiles stay on the classic dequant+dot
    grouped = planar and TM <= 16

    out = pl.pallas_call(
        functools.partial(_kernel, bits=bits, ng_tile=ng_tile, tk=TK, nk=nk,
                          planar=planar, grouped=grouped),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k)),
            pl.BlockSpec((TK // vpw, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((R, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((R, TN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        interpret=interpret,
    )(x, packed_t, s_exp, z_exp)
    return out


# ---------------------------------------------------------------------------
# GSPMD partitioning of the kernel (tensor parallelism of packed weights)
# ---------------------------------------------------------------------------
#
# `pl.pallas_call` is opaque to the SPMD partitioner: with plain NamedSharding
# annotations XLA would all-gather the packed operands around the kernel
# instead of partitioning it. `custom_partitioning` + a Shardy sharding rule
# teaches the partitioner the kernel's algebra so the per-device lowering runs
# `_packed_matmul_local` directly on the local shards:
#
#   column-parallel (out-features on 'model'):
#       packed [KW, N@model], scales/zeros [g, N@model], x replicated
#       -> y [M, N@model], no collective
#   row-parallel (in-features on 'model'):
#       packed [KW@model, N], scales/zeros [g@model, N], x [M, K@model]
#       -> local partial matmul + one psum over 'model'
#   data-parallel batch: x [M@data, K] -> y [M@data, N], no collective
#
# The compound factors tie the THREE views of the contraction axis together —
# x's K, packed's word axis KW = K·bits/32, and the scale group axis g = K/gs —
# so sharding any one of them shards all three consistently (always on whole
# 32-bit words and whole quant groups, per parallel/sharding.py's layout
# contract).


def _axes_of(spec_entry):
    if spec_entry is None:
        return ()
    return spec_entry if isinstance(spec_entry, tuple) else (spec_entry,)


@functools.lru_cache(maxsize=None)
def _partitioned_packed_matmul(bits: int, groupsize: int, qmin: int, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning

    vpw = 32 // bits

    @custom_partitioning
    def pm(x, packed_t, scales_t, zeros_t):
        return _packed_matmul_local(
            x, packed_t, scales_t, zeros_t,
            bits=bits, groupsize=groupsize, qmin=qmin, interpret=interpret,
        )

    def partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P

        x_s, p_s, s_s, _ = [a.sharding for a in arg_shapes]

        def spec2(s):
            sp = list(getattr(s, "spec", P()) or P())
            return sp + [None] * (2 - len(sp))

        xsp, psp, ssp = spec2(x_s), spec2(p_s), spec2(s_s)
        m_ax = xsp[0]
        # out-features axes: union of packed/scales dim-1 shardings
        n_axes = []
        for e in (psp[1], ssp[1]):
            for a in _axes_of(e):
                if a not in n_axes:
                    n_axes.append(a)
        # contraction axes: union over x dim-1, packed dim-0, scales dim-0
        k_axes = []
        for e in (xsp[1], psp[0], ssp[0]):
            for a in _axes_of(e):
                if a not in k_axes:
                    k_axes.append(a)
        n_ax = tuple(n_axes) or None
        k_ax = tuple(k_axes) or None

        nshard = int(np.prod([mesh.shape[a] for a in (k_axes or [])]))
        K = arg_shapes[0].shape[1]
        ngroups = arg_shapes[2].shape[0]
        if nshard > 1:
            k_local = K // nshard
            if (K % nshard or k_local % vpw
                    or (groupsize > 0 and k_local % groupsize)
                    or (ngroups > 1 and ngroups % nshard)):
                raise ValueError(
                    f"packed_matmul row-parallel shard of K={K} over {nshard} devices "
                    f"does not align to whole 32-bit words / quant groups "
                    f"(groupsize={groupsize}, ngroups={ngroups})")

        s_k_ax = k_ax if ngroups > 1 else None
        arg_shardings = (
            NamedSharding(mesh, P(m_ax, k_ax)),
            NamedSharding(mesh, P(k_ax, n_ax)),
            NamedSharding(mesh, P(s_k_ax, n_ax)),
            NamedSharding(mesh, P(s_k_ax, n_ax)),
        )
        out_sharding = NamedSharding(mesh, P(m_ax, n_ax))

        def lower_fn(x, packed_t, scales_t, zeros_t):
            y = _packed_matmul_local(
                x, packed_t, scales_t, zeros_t,
                bits=bits, groupsize=groupsize, qmin=qmin, interpret=interpret,
            )
            if k_ax is not None:
                y = jax.lax.psum(y, k_ax)
            return y

        return mesh, lower_fn, out_sharding, arg_shardings

    if groupsize > 0:
        wpg = groupsize * bits // 32  # words per quant group
        rule = "m (g wpg vpw), (g wpg) n, g n, g n -> m n"
        pm.def_partition(
            partition=partition,
            sharding_rule=rule,
            reduction_factors=("g", "wpg", "vpw"),
            wpg=wpg, vpw=vpw,
        )
    else:
        # per-channel/tensor: one group spans K; scales [1, N] replicate on K
        rule = "m (kw vpw), kw n, u n, u n -> m n"
        pm.def_partition(
            partition=partition,
            sharding_rule=rule,
            reduction_factors=("kw", "vpw"),
            need_replication_factors=("u",),
            vpw=vpw,
        )
    return pm


@functools.partial(
    jax.jit,
    static_argnames=("bits", "groupsize", "qmin", "out_features", "in_features", "interpret"),
)
def packed_matmul(
    x: jnp.ndarray,
    packed_t: jnp.ndarray,
    scales_t: jnp.ndarray,
    zeros_t: jnp.ndarray,
    *,
    bits: int,
    groupsize: int,
    qmin: int,
    out_features: int,
    in_features: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Partition-aware fused dequant-matmul (see `_packed_matmul_local`).

    Routed through `custom_partitioning` so tensor-parallel shardings of the
    packed operands partition the Pallas kernel instead of all-gathering
    around it; on a single device this lowers to the plain local kernel.
    """
    assert x.shape == (x.shape[0], in_features)
    assert packed_t.shape[1] == out_features
    return _partitioned_packed_matmul(bits, groupsize, qmin, interpret)(
        x, packed_t, scales_t, zeros_t)


def dequant_matmul(x: jnp.ndarray, qlin) -> jnp.ndarray:
    """Apply y = x @ dequant(qlin)^T for a packed QuantizedLinear; any batch dims."""
    s = qlin.spec
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    pad = (-M) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    from ..core.qparams import qrange

    rng = qrange(s.wbit, s.w_unsigned)
    g = s.w_groupsize if (s.w_qtype == "per_group" and s.w_groupsize > 0) else -1
    N = qlin.out_features
    ngroups = K // (g if g > 0 else K)
    # logical scales [N, ngroups] (or scalar) -> kernel layout [ngroups, N]
    scales_t = jnp.broadcast_to(jnp.reshape(qlin.w_scale, (-1, ngroups)).T, (ngroups, N))
    zeros_t = jnp.broadcast_to(jnp.reshape(qlin.w_zero, (-1, ngroups)).T, (ngroups, N))
    y = packed_matmul(
        x2, qlin.packed, scales_t, zeros_t,
        bits=s.wbit, groupsize=g, qmin=rng.qmin,
        out_features=N, in_features=K,
        interpret=not _on_tpu(),
    )
    if pad:
        y = y[:M]
    return y.reshape(*lead, N)
