#!/usr/bin/env python
"""A/B experiment: can the per-value dequant FMA be removed from the fused
dequant-matmul (round 3, VERDICT item 2)?

The decode megakernel is VPU-bound on unpack+dequant (~825 Gvalues/s measured
= whole-token time at 8.03 ms; scripts/exp_decode_breakdown.py). Per int4
value the kernel spends ~shift+mask (amortized ~1.75 ops), convert
int32->f32 (1), and the dequant FMA q*s+b (1). The FMA operates on the full
[TK,TN] tile with the [ng,TN] scale rows broadcast — removing it moves ~25%
of the VPU budget.

GROUPED-RESCALE variant: never dequantize the tile. Compute per-group raw
integer dots with a group-masked activation matrix

    Xg[g, r] = xp[r] * (group_of_planar_row(r) == g)        [ng, TK]
    D        = Xg @ Wq_raw                                   [ng, TN]  (MXU)
    y        = sum_g  s[g] * D[g] + b[g] * xs[g]             [1, TN]   (tiny)

moving the scale/bias application from TK*TN values to ng*TN — a G-fold
reduction — at the cost of ng-1 extra MXU rows (free: MXU granularity is 8).

Methodology: ONE pallas launch streams a tall [R*K/vpw, N] weight stack with
grid (R, nk) — the same launch/step structure as the whole-model megakernel —
so per-call dispatch noise (which drowned a chained-call version of this
experiment) divides by R*nk. Reported rate = packed bytes / best wall time.

Variants:
  A. current planar unpack + f32 dequant FMA + f32 dot    (megakernel's path)
  B. grouped rescale (above)
  C. bf16 dequant + bf16 dot (halved dequant operand width)
  D. no-dequant control: unpack+convert+dot only (isolates the FMA cost)
  E. word floor: bitcast whole words, dot [M, TKW] (DMA+dot floor)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mi_optimize_tpu.core import packing, qparams
from mi_optimize_tpu.core.qparams import qrange
from mi_optimize_tpu.ops.block_fused import _unpack_planar

BITS = 4
VPW = 32 // BITS
K = N = 4096
G = 128
M = 1
TN, TK = 1024, 512
TKW = TK // VPW
NG = TK // G   # groups per K-tile
R = 256        # stacked repeats: 256 * 8.4MB = 2.1GB streamed per launch


def _group_mask():
    """[NG, TK] f32: planar row r belongs to group (r % TKW) // (G // VPW)."""
    g = jax.lax.broadcasted_iota(jnp.int32, (NG, TK), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (NG, TK), 1)
    return ((r % TKW) // (G // VPW) == g).astype(jnp.float32)


def _tile_current(x, wq_words, s, b):
    wq = _unpack_planar(wq_words, BITS)  # [TK, TN] f32 plane-major
    wd = (wq.reshape(VPW, NG, G // VPW, TN) * s[None, :, None, :]
          + b[None, :, None, :]).reshape(TK, TN)
    return jax.lax.dot_general(x, wd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tile_grouped(x, wq_words, s, b):
    wq = _unpack_planar(wq_words, BITS)       # raw codes (f32)
    xg = x * _group_mask()                    # [NG, TK] group-masked row
    d = jax.lax.dot_general(xg, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [NG, TN]
    xs = jnp.sum(xg, axis=1, keepdims=True)   # [NG, 1]
    return jnp.sum(s * d + b * xs, axis=0, keepdims=True)


def _tile_bf16(x, wq_words, s, b):
    mask = jnp.uint32((1 << BITS) - 1)
    parts = [jax.lax.bitcast_convert_type(
        (wq_words >> jnp.uint32(BITS * i)) & mask if 0 < i < VPW - 1
        else (wq_words & mask if i == 0 else wq_words >> jnp.uint32(BITS * i)),
        jnp.int32) for i in range(VPW)]
    wq = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
    wd = (wq.reshape(VPW, NG, G // VPW, TN) * s[None, :, None, :].astype(jnp.bfloat16)
          + b[None, :, None, :].astype(jnp.bfloat16)).reshape(TK, TN)
    return jax.lax.dot_general(x.astype(jnp.bfloat16), wd,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tile_nodeq(x, wq_words, s, b):
    wq = _unpack_planar(wq_words, BITS)
    return jax.lax.dot_general(x, wq, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) * 1e-20


def _tile_floor(x, wq_words, s, b):
    w = jax.lax.bitcast_convert_type(wq_words, jnp.int32).astype(jnp.float32)
    return jax.lax.dot_general(x[:, :TKW], w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) * 1e-20


def make_call(tile_fn, r_reps, nj=None):
    nk = K // TK
    nj = nj or N // TN  # timing collapses all column tiles into one acc
                        # (garbage values, full traffic); nj=1 is exact

    def kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref):
        r, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when((r == 0) & (k == 0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += tile_fn(x_ref[:], w_ref[:], s_ref[0:NG, :], b_ref[0:NG, :])

        @pl.when((r == r_reps - 1) & (j == nj - 1) & (k == nk - 1))
        def _():
            o_ref[:] = acc_ref[:]

    return jax.jit(lambda x, p, s, b: pl.pallas_call(
        kernel,
        grid=(r_reps, nj, nk),
        in_specs=[
            pl.BlockSpec((M, TK), lambda r, j, k: (0, k)),
            pl.BlockSpec((TKW, TN), lambda r, j, k: (r * (K // TK) + k, j)),
            pl.BlockSpec((8, TN), lambda r, j, k: (k, j)),
            pl.BlockSpec((8, TN), lambda r, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda r, j, k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
    )(x, p, s, b))


def permute_x(x):
    return x.reshape(M, K // TK, TK // VPW, VPW).transpose(0, 1, 3, 2).reshape(M, K)


def main():
    rng = qrange(BITS, True)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (N, K), jnp.float32) * (K ** -0.5)
    fake, scale, zero = qparams.quantize_dequantize(w, BITS, "per_group", G)
    ints = qparams.quantize_to_int(fake, scale, zero, BITS, "per_group", G)
    packed_t = packing.pack_weight_device(ints, BITS, rng)  # [K/8, N]

    ngroups = K // G
    scales_t = jnp.reshape(scale, (N, ngroups)).T.astype(jnp.float32)
    bias_t = -(jnp.reshape(zero, (N, ngroups)).T.astype(jnp.float32)
               - rng.qmin) * scales_t

    nk = K // TK
    src = np.minimum((np.arange(nk)[:, None] * (TK // G) + np.arange(8)[None, :]),
                     ngroups - 1).reshape(-1)
    s_exp = scales_t[src]
    b_exp = bias_t[src]

    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
    xp = permute_x(x)

    tiles = {"A current": _tile_current, "B grouped": _tile_grouped,
             "C bf16": _tile_bf16, "D nodequant": _tile_nodeq,
             "E floor": _tile_floor}

    # correctness at R=1 (output = R * (x @ fake.T tile sums) when R>1):
    # dense reference in float64 on host (XLA's f32 TPU matmul is bf16-pass)
    ref = (np.asarray(x, np.float64) @ np.asarray(fake, np.float64).T)[:, :TN]
    sc = float(np.max(np.abs(ref)))
    for nm in ("A current", "B grouped", "C bf16"):
        y = make_call(tiles[nm], 1, nj=1)(xp, packed_t, s_exp, b_exp)
        err = float(np.max(np.abs(ref - np.asarray(y, np.float64)))) / sc
        print(f"rel err {nm} vs dense: {err:.2e}", flush=True)
        # the Mosaic f32 dot is itself ~bf16-pass precision (~2e-3 measured),
        # so even variant A (the production kernel's exact formulation) sits
        # ~2e-3 from the float64 dense reference
        assert err < (2e-2 if "bf16" in nm else 5e-3), nm

    # big streamed stack: R repeats of the packed weight
    packed_big = jnp.tile(packed_t, (R, 1))
    bytes_streamed = packed_big.size * 4

    for nm, tile in tiles.items():
        f = make_call(tile, R)
        y = f(xp, packed_big, s_exp, b_exp)
        _ = float(y[0, 0])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            y = f(xp, packed_big, s_exp, b_exp)
            _ = float(y[0, 0])
            best = min(best, time.perf_counter() - t0)
        gbps = bytes_streamed / best / 1e9
        gvals = bytes_streamed * 2 / best / 1e9
        print(f"{nm}: {best*1e3:8.2f} ms for {bytes_streamed/1e9:.2f} GB "
              f"({gbps:6.1f} GB/s, {gvals:7.1f} Gvalues/s)", flush=True)


if __name__ == "__main__":
    main()
