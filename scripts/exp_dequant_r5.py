#!/usr/bin/env python
"""Round-5 dequant-extraction probe: can the ~3 VPU ops/int4-value of the
flat megakernel's grouped-rescale path be cut further?

BENCH r4 attribution: the flat kernel runs 546 GB/s effective (66.7% of
nominal HBM) and the classic-vs-grouped A/B swings 19% end-to-end — the
binding constraint is per-value dequant COMPUTE (`_unpack_planar_centered`:
shift-pair sign-extend + int32->f32 convert per value).

Methodology (round-5 rewrite): a SINGLE streamed operand grid caps at
~47-75 GB/s on this chip regardless of compute (exp_stream_ceiling.py r2;
re-measured r5 — the first version of this probe showed every variant stuck
at the same ~75 GB/s wall), so per-variant differences only resolve with
MULTIPLE concurrently-streamed operands like the real megakernel. This
probe streams NOPS=5 weight operands per grid step (2.6 MB/step) and runs
the variant's unpack+dot per operand; n passes per dispatch amortize the
~30-40 ms dispatch+pull overhead.

Variants:
  A  grouped-centered  : production path (uint32 words, XOR + shl/sar
                         sign-extend + f32 convert, group-masked f32 dot)
  B  i8pair-f32        : int8 nibble-pair storage (pre-centered
                         two's-complement nibbles); extraction = SAR (high)
                         + SHL+SAR (low) ON INT8 LANES, then f32 convert +
                         masked f32 dot. 1.5 shift ops/value; int8 ALU ops
                         may pack 4-per-lane.
  C  i8pair-i8dot      : as B but NO convert — int8 codes dot int8
                         activations on the MXU, grouped rescale on int32
                         partials.
  E  i8pair-bf16       : as B but convert to bf16 + bf16 dot.
  F  floor             : stream words + bitcast-add only (no unpack).

Equal HBM bytes per variant; GB/s directly comparable.

Usage: python scripts/exp_dequant_r5.py [A B C E F]
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

BITS = 4
VPW = 32 // BITS
TK = 512            # K-values contracted per operand per step
COLS = 2048         # N lanes per operand
G = 128
NG = TK // G
NOPS = 5            # concurrently streamed weight operands
NSTEPS = 400        # grid steps per pass
NPASS = 3           # passes per dispatch (chained through a salt)
TKW = TK // VPW     # u32 rows per step
TKB = TK // 2       # i8 rows per step


def _mask8():
    g = jax.lax.broadcasted_iota(jnp.int32, (NG, TK), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (NG, TK), 1)
    return ((r % TKW) // (G // VPW) == g).astype(jnp.float32)


def _mask2():
    g = jax.lax.broadcasted_iota(jnp.int32, (NG, TK), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (NG, TK), 1)
    return ((r % TKB) // (G // 2) == g).astype(jnp.float32)


def _unpack_centered_words(w):
    msb = 1 << (BITS - 1)
    pattern = sum(msb << (BITS * i) for i in range(VPW))
    wx = jax.lax.bitcast_convert_type(w ^ jnp.uint32(pattern), jnp.int32)

    def field(i):
        hi = 32 - BITS * (i + 1)
        t = wx if hi == 0 else wx << hi
        return t >> (32 - BITS)

    return jnp.concatenate([field(i) for i in range(VPW)],
                           axis=0).astype(jnp.float32)


def _unpack_pair_i8(w8):
    hi = w8 >> 4
    lo = (w8 << 4) >> 4
    return jnp.concatenate([lo, hi], axis=0)


def _tile_A(x, w_ref, s):
    wq = _unpack_centered_words(w_ref[:])
    xg = x * _mask8()
    d = jax.lax.dot_general(xg, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.sum(s * d, axis=0, keepdims=True)


def _tile_B(x, w_ref, s):
    wq = _unpack_pair_i8(w_ref[:]).astype(jnp.float32)
    xg = x * _mask2()
    d = jax.lax.dot_general(xg, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.sum(s * d, axis=0, keepdims=True)


def _tile_C(x, w_ref, s):
    wq = _unpack_pair_i8(w_ref[:])
    xq = jnp.clip(jnp.round(x * _mask2() * 16.0), -127, 127).astype(jnp.int8)
    d = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return jnp.sum(s * d.astype(jnp.float32) * (1 / 16.0),
                   axis=0, keepdims=True)


def _tile_E(x, w_ref, s):
    wq = _unpack_pair_i8(w_ref[:]).astype(jnp.bfloat16)
    xg = (x * _mask2()).astype(jnp.bfloat16)
    d = jax.lax.dot_general(xg, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.sum(s * d, axis=0, keepdims=True)


def _tile_F(x, w_ref, s):
    w = jax.lax.bitcast_convert_type(w_ref[0:8, :], jnp.int32
                                     ).astype(jnp.float32)
    return w[0:1, :] * 1e-20


VARIANTS = {
    "A": ("grouped-centered u32", _tile_A, "u32"),
    "B": ("i8pair f32dot", _tile_B, "i8"),
    "C": ("i8pair i8dot", _tile_C, "i8"),
    "E": ("i8pair bf16dot", _tile_E, "i8"),
    "F": ("word floor", _tile_F, "u32"),
}


def make_stream(tile_fn, storage):
    trows = TKW if storage == "u32" else TKB

    def kernel(salt_ref, x_ref, *refs):
        w_refs, s_ref, o_ref, acc_ref = refs[:-3], refs[-3], refs[-2], refs[-1]
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = salt_ref[:]

        x = x_ref[:]
        for w_ref in w_refs:
            acc_ref[0:1, 0:COLS] += tile_fn(x, w_ref, s_ref[0:NG, :])

        @pl.when(j == NSTEPS - 1)
        def _():
            o_ref[:] = acc_ref[:]

    def once(salt, x, ws, s):
        return pl.pallas_call(
            kernel,
            grid=(NSTEPS,),
            in_specs=[pl.BlockSpec((8, COLS), lambda j: (0, 0)),
                      pl.BlockSpec((1, TK), lambda j: (0, 0))]
            + [pl.BlockSpec((trows, COLS), lambda j: (j, 0)) for _ in ws]
            + [pl.BlockSpec((8, COLS), lambda j: (0, 0))],
            out_specs=pl.BlockSpec((8, COLS), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, COLS), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, COLS), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(salt, x, *ws, s)

    @jax.jit
    def stream(x, ws, s):
        def body(salt, _):
            return once(salt, x, ws, s), None

        out, _ = jax.lax.scan(body, jnp.zeros((8, COLS), jnp.float32), None,
                              length=NPASS)
        return out

    return stream


def main():
    names = sys.argv[1:] or list(VARIANTS)
    key = jax.random.PRNGKey(0)

    # one [TK*NSTEPS, COLS] logical code block per operand
    rows = TK * NSTEPS
    codes = jax.random.randint(key, (rows, COLS), -8, 8, jnp.int32)

    u = (codes + 8).astype(jnp.uint32)
    uw = u.reshape(rows // VPW, VPW, COLS)
    packed_u32 = functools.reduce(
        lambda a, b: a | b,
        [uw[:, i, :] << jnp.uint32(BITS * i) for i in range(VPW)])
    cb = codes.reshape(rows // 2, 2, COLS)
    packed_i8 = ((cb[:, 1, :] << 4) | (cb[:, 0, :] & 0xF)).astype(jnp.int8)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, TK), jnp.float32)
    s = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (8, COLS),
                                  jnp.float32))
    per_pass = NOPS * rows * COLS // 2
    total = per_pass * NPASS

    for nm in names:
        label, tile, storage = VARIANTS[nm]
        p = packed_u32 if storage == "u32" else packed_i8
        ws = [p] * NOPS
        try:
            f = make_stream(tile, storage)
            y = f(x, ws, s)
            _ = float(y[0, 0])
        except Exception as e:
            msg = " | ".join(str(e).split("\n")[:3])[:300]
            print(f"{nm} {label}: FAIL {msg}", flush=True)
            continue
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            y = f(x, ws, s)
            _ = float(y[0, 0])
            best = min(best, time.perf_counter() - t0)
        gbps = total / best / 1e9
        print(f"{nm} {label}: {best*1e3:8.2f} ms for {total/1e9:.2f} GB "
              f"({gbps:6.1f} GB/s, {2*gbps:7.1f} Gvalues/s)", flush=True)


if __name__ == "__main__":
    main()
