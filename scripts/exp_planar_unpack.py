#!/usr/bin/env python
"""A/B experiment: int4 unpack formulation inside the fused dequant-matmul.

Hypothesis: the current unpack (shift/mask per nibble -> jnp.stack(axis=1) ->
reshape) forces a cross-sublane interleave relayout in Mosaic, and that — not
arithmetic — is why the kernel streams at ~204 GB/s vs the chip's measured
~361 GB/s. A plane-major formulation (concat nibble planes along rows, with
the matching activation permutation precomputed OUTSIDE the kernel) needs no
interleave: rows of plane i land at offset i*TKW, a pure placement.

Variants (marginal cost per 4096x4096 int4 matmul, M=8):
  A. current packed_matmul (ops/dequant_matmul.py)
  B. planar kernel (x pre-permuted per K-tile outside the kernel)
  C. streaming-floor control: same word traffic, no unpack (bitcast+dot only)

Methodology per CLAUDE.md: chain calls inside one jit; marginal = (t_long -
t_short) / (n_long - n_short); force completion with a scalar pull.
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
from mi_optimize_tpu.ops.dequant_matmul import packed_matmul

BITS = 4
VPW = 32 // BITS
K = N = 4096
G = 128
M = 8
TM, TN, TK = 8, 512, 512
TKW = TK // VPW
NG_TILE = TK // G


def _kernel_planar(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    mask = jnp.uint32((1 << BITS) - 1)
    parts = [
        jax.lax.bitcast_convert_type((w >> jnp.uint32(BITS * i)) & mask, jnp.int32)
        for i in range(VPW)
    ]
    wq = jnp.concatenate(parts, axis=0).astype(jnp.float32)  # [TK, TN] plane-major
    s = s_ref[0:NG_TILE, :]
    z = z_ref[0:NG_TILE, :]
    # plane-major row r = i*TKW + w ; orig k = w*VPW + i ; group = (r % TKW)//(G/VPW)
    wd = ((wq.reshape(VPW, NG_TILE, G // VPW, TN) - z[None, :, None, :])
          * s[None, :, None, :]).reshape(TK, TN)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], wd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_floor(x_ref, w_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = jax.lax.bitcast_convert_type(w_ref[:], jnp.int32).astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, :TKW], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * 1e-20

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def planar_matmul(x_perm, packed_t, s_exp, z_exp):
    nk = K // TK
    return pl.pallas_call(
        functools.partial(_kernel_planar, nk=nk),
        grid=(M // TM, N // TN, nk),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k)),
            pl.BlockSpec((TKW, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((8, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((8, TN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x_perm.dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
    )(x_perm, packed_t, s_exp, z_exp)


def floor_matmul(x, packed_t):
    nk = K // TK
    return pl.pallas_call(
        functools.partial(_kernel_floor, nk=nk),
        grid=(M // TM, N // TN, nk),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k)),
            pl.BlockSpec((TKW, TN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
    )(x, packed_t)


def permute_x(x):
    # per-K-tile plane-major permutation: [.., nk, TKW, VPW] -> [.., nk, VPW, TKW]
    return x.reshape(M, K // TK, TKW, VPW).transpose(0, 1, 3, 2).reshape(M, K)


def main():
    rng = qrange(BITS, True)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (N, K), jnp.float32) * (K ** -0.5)
    fake, scale, zero = qparams.quantize_dequantize(w, BITS, "per_group", G)
    ints = qparams.quantize_to_int(fake, scale, zero, BITS, "per_group", G)
    packed_t = packing.pack_weight_device(ints, BITS, rng)  # [K/8, N]

    ngroups = K // G
    scales_t = jnp.reshape(scale, (N, ngroups)).T.astype(jnp.float32)
    zeros_t = jnp.reshape(zero, (N, ngroups)).T.astype(jnp.float32) - rng.qmin

    # pre-expanded per-tile scales, 8-row aligned (same as dequant_matmul.py)
    nk = K // TK
    src = np.minimum((np.arange(nk)[:, None] * TK) // G + np.arange(8)[None, :],
                     ngroups - 1).reshape(-1)
    s_exp = scales_t[src]
    z_exp = zeros_t[src]

    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)

    # correctness check (planar == current)
    ya = packed_matmul(x, packed_t, scales_t, zeros_t + rng.qmin, bits=BITS,
                       groupsize=G, qmin=rng.qmin, out_features=N, in_features=K)
    yb = planar_matmul(permute_x(x), packed_t, s_exp, z_exp)
    err = float(jnp.max(jnp.abs(ya - yb)))
    print(f"max |A - B| = {err:.3e}", flush=True)
    assert err < 1e-3 * float(jnp.max(jnp.abs(ya))), "planar kernel mismatch"

    def chain(fn, n):
        @jax.jit
        def run(x0):
            y = x0
            for _ in range(n):
                y = fn(y)[:, :K] * 1e-3  # keep magnitudes bounded, force dependency
            return y
        return run

    def timed(run, x0, reps=5):
        y = run(x0)
        _ = float(y[0, 0])  # warm/compile, scalar pull
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            y = run(x0)
            _ = float(y[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    fA = lambda y: packed_matmul(y, packed_t, scales_t, zeros_t + rng.qmin,
                                 bits=BITS, groupsize=G, qmin=rng.qmin,
                                 out_features=N, in_features=K)
    fB = lambda y: planar_matmul(permute_x(y), packed_t, s_exp, z_exp)
    fC = lambda y: floor_matmul(y, packed_t)

    n_short, n_long = 2, 66
    for name, fn in (("A current", fA), ("B planar", fB), ("C floor", fC)):
        ts = timed(chain(fn, n_short), x)
        tl = timed(chain(fn, n_long), x)
        marg = (tl - ts) / (n_long - n_short)
        gbps = packed_t.size * 4 / marg / 1e9
        print(f"{name}: short {ts*1e3:7.2f} ms  long {tl*1e3:7.2f} ms  "
              f"marginal {marg*1e6:8.1f} us  ({gbps:6.1f} GB/s effective)",
              flush=True)


if __name__ == "__main__":
    main()
