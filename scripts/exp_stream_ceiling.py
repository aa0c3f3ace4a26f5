"""Measure the real weight-streaming ceiling of this chip.

Variants:
  A. single-operand pallas grid read (like one weight phase)
  B. k-operand pallas grid read (operands streamed concurrently)
  C. XLA elementwise reduce of the same buffer (non-pallas baseline)

First run (single operand, 1.6GB uint32): flat ~47 GB/s regardless of block
size 3-25MB — far below both the 361 GB/s XLA elementwise stream and the
~400 GB/s the decode megakernel demonstrably sustains in aggregate. This
script exists to pin down whether per-operand DMA streams are the limiter.

Usage: python scripts/exp_stream_ceiling.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def read_kernel_multi(*refs, nsteps, unpack):
    salt_ref, w_refs, o_ref, acc_ref = refs[0], refs[1:-2], refs[-2], refs[-1]
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = salt_ref[:]

    for w_ref in w_refs:
        if unpack:
            # int4 unpack + FMA dequant like the decode megakernel's weight
            # phases (isolates the VPU cost at zero other overhead)
            from mi_optimize_tpu.ops.block_fused import _unpack_planar
            wq = _unpack_planar(w_ref[:], 4)            # [8*trows, cols]
            wd = wq * 1.7 + 0.3                          # FMA stand-in
            # full-row reduce so no plane is dead code (1 add/value)
            acc_ref[0:1, :] += jnp.sum(wd, axis=0, keepdims=True)
        else:
            acc_ref[:] += jax.lax.bitcast_convert_type(
                w_ref[0:8, :], jnp.int32).astype(jnp.float32)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _stream_once(salt, ws, trows, unpack=False):
    rows, cols = ws[0].shape
    nsteps = rows // trows
    return pl.pallas_call(
        functools.partial(read_kernel_multi, nsteps=nsteps, unpack=unpack),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((8, cols), lambda j: (0, 0))]
        + [pl.BlockSpec((trows, cols), lambda j: (j, 0)) for _ in ws],
        out_specs=pl.BlockSpec((8, cols), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(salt, *ws)


@functools.partial(jax.jit, static_argnames=("trows", "n", "unpack"))
def stream(ws, trows, n, unpack=False):
    # n passes inside ONE dispatch: this environment's fixed dispatch+pull
    # overhead is ~30-40ms, swamping any single 1.6GB pass. Each pass is
    # seeded with the previous pass's result (salt) so XLA cannot CSE the
    # identical pallas calls into one (observed: t10 == t2 without this).
    cols = ws[0].shape[1]

    def body(salt, _):
        r = _stream_once(salt, ws, trows, unpack)
        return r, None

    out, _ = jax.lax.scan(body, jnp.zeros((8, cols), jnp.float32), None,
                          length=n)
    return out[0, 0]


@jax.jit
def xla_reduce(w):
    return jnp.sum(jax.lax.bitcast_convert_type(w, jnp.int32).astype(jnp.float32))


def bench(fn, gb):
    r = fn()
    _ = float(np.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    r = fn()
    _ = float(np.asarray(r).reshape(-1)[0])
    dt = time.perf_counter() - t0
    return dt, gb / dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    cols = 12288
    total_rows = 4096 * 8  # 1.6 GB total across all operands

    gb1 = total_rows * cols * 4 / 1e9
    for k, unpack in ((1, False), (1, True), (4, False)):
        rows = total_rows // k
        ws = tuple(jax.device_put(jnp.full((rows, cols), i + 1, jnp.uint32))
                   for i in range(k))
        for trows in (64, 128, 256):
            if trows * cols * 4 * 2 * k > 110e6:
                continue
            t2, _ = bench(lambda: stream(ws, trows, 2, unpack), 1)
            t10, _ = bench(lambda: stream(ws, trows, 10, unpack), 1)
            bw = 8 * gb1 / (t10 - t2)
            print(f"pallas k={k} unpack={int(unpack)} trows={trows} "
                  f"t2={t2*1e3:7.1f}ms t10={t10*1e3:7.1f}ms  "
                  f"delta-bw={bw:7.1f} GB/s", flush=True)
        del ws


if __name__ == "__main__":
    main()
