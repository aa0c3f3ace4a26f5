"""Comm/compute-overlapped collective dequant-matmul (Pallas ring kernel).

The north star (BASELINE.md) demands "all-gather/reduce-scatter collectives
overlapped with the dequant-matmul compute". GSPMD's row-parallel pattern
(parallel/collectives.py::row_parallel_matmul, and what custom_partitioning
emits for the packed kernel) computes the FULL local partial product and only
then all-reduces — the ICI transfer idles while the MXU works and vice versa.

This module hand-schedules the overlap with `pltpu.make_async_remote_copy`:
the output columns are split into one chunk per ring device, and each device
walks the chunks in ring order, computing the dequant-matmul for chunk c while
the partial sum for the PREVIOUS chunk is in flight to its left neighbour.
After D steps every device holds the fully-reduced chunk that matches its ring
position (a reduce-scatter whose transfers all hid behind chunk matmuls);an
optional ring all-gather phase then replicates the full [M, N] output.

    step s (device d):   c = (d + 1 + s) % D
        partial_c = x_local @ dequant(packed_local[:, c·NC:(c+1)·NC])   (MXU)
        if s > 0:  partial_c += recv[s-1]          (arrived during the matmul)
        if s < D-1: async-send partial_c -> left   (hides behind step s+1)

No torch/CUDA counterpart exists in the reference — it has no distributed
support at all (SURVEY.md §2.8); this is the TPU-native latency-hiding
equivalent of what NCCL's fused collective GEMMs do for GPU frameworks.

Multi-chip hardware is not available in this environment, so the kernel is
validated in Pallas TPU interpret mode (simulated remote DMAs + semaphores)
against `row_parallel_matmul` and the unsharded fused kernel; on-chip
profiling is deferred until a real slice exists (ROADMAP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.dequant_matmul import _unpack_words


def _dequant_chunk(p_ref, s_ref, z_ref, c, *, bits, nc, ng_local, k_local, qmin):
    """Dequantize output-column chunk c of the local packed shard -> [K_local, NC]."""
    off = pl.multiple_of(c * nc, nc)
    wq = _unpack_words(p_ref[:, pl.ds(off, nc)], bits).astype(jnp.float32)
    s = s_ref[:, pl.ds(off, nc)]
    z = z_ref[:, pl.ds(off, nc)]
    g = k_local // ng_local
    wv = wq.reshape(ng_local, g, nc)
    wd = (wv - (z[:, None, :] - float(qmin))) * s[:, None, :]
    return wd.reshape(k_local, nc)


def _ring_kernel(x_ref, p_ref, s_ref, z_ref, y_ref,
                 send_buf, comm, own_buf, comm2,
                 send_sem, recv_sem, send_sem2, recv_sem2,
                 *, axis, D, nc, bits, ng_local, k_local, qmin, gather):
    my_id = jax.lax.axis_index(axis)
    left_id = jax.lax.rem(my_id - 1 + D, D)
    right_id = jax.lax.rem(my_id + 1, D)

    # MESH device ids as dicts: unspecified axes keep this device's own
    # coordinate, so each 'data' row runs its own independent ring
    left = {axis: left_id}
    right = {axis: right_id}

    # neighbour barrier: a remote DMA must not land before the peer's scratch
    # exists — standard prologue for ring kernels (pallas_guide.md)
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.MESH)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.MESH)
    pltpu.semaphore_wait(barrier, 2)

    x = x_ref[:]

    # ---- phase 1: matmul + overlapped ring reduce-scatter -------------------
    reduced = None
    for s in range(D):
        c = jax.lax.rem(my_id + 1 + s, D)
        wd = _dequant_chunk(p_ref, s_ref, z_ref, c, bits=bits, nc=nc,
                            ng_local=ng_local, k_local=k_local, qmin=qmin)
        partial = jax.lax.dot_general(
            x, wd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if s > 0:
            # the upstream accumulation was in flight during the matmul above
            pltpu.make_async_copy(comm.at[s - 1], comm.at[s - 1],
                                  recv_sem.at[s - 1]).wait()
            partial = partial + comm[s - 1]
        if s < D - 1:
            send_buf[s] = partial
            pltpu.make_async_remote_copy(
                src_ref=send_buf.at[s],
                dst_ref=comm.at[s],
                send_sem=send_sem.at[s],
                recv_sem=recv_sem.at[s],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.MESH,
            ).start()
        else:
            reduced = partial  # c == my_id: the fully-reduced chunk

    if not gather:
        y_ref[:] = reduced.astype(y_ref.dtype)
    else:
        # ---- phase 2: ring all-gather of the reduced chunks -----------------
        own = pl.multiple_of(my_id * nc, nc)
        y_ref[:, pl.ds(own, nc)] = reduced.astype(y_ref.dtype)
        own_buf[:] = reduced
        for t in range(D - 1):
            src = own_buf if t == 0 else comm2.at[t - 1]
            pltpu.make_async_remote_copy(
                src_ref=src if t == 0 else comm2.at[t - 1],
                dst_ref=comm2.at[t],
                send_sem=send_sem2.at[t],
                recv_sem=recv_sem2.at[t],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.MESH,
            ).start()
            pltpu.make_async_copy(comm2.at[t], comm2.at[t],
                                  recv_sem2.at[t]).wait()
            idx = jax.lax.rem(my_id + 1 + t, D)
            off = pl.multiple_of(idx * nc, nc)
            y_ref[:, pl.ds(off, nc)] = comm2[t].astype(y_ref.dtype)

    # all outstanding sends must complete before the kernel may exit
    for s in range(D - 1):
        pltpu.make_async_copy(send_buf.at[s], send_buf.at[s],
                              send_sem.at[s]).wait()
        if gather:
            src = own_buf if s == 0 else comm2.at[s - 1]
            pltpu.make_async_copy(src, src, send_sem2.at[s]).wait()


def overlapped_row_parallel_dequant_matmul(
    x: jnp.ndarray,
    packed_t: jnp.ndarray,
    scales_t: jnp.ndarray,
    zeros_t: jnp.ndarray,
    mesh: Mesh,
    *,
    bits: int,
    groupsize: int,
    qmin: int,
    axis: str = "model",
    gather: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[M,N] = x[M,K] @ dequant(packed)^T, K ring-sharded over `axis`, with the
    ring reduce (and optional all-gather) overlapped with the chunk matmuls.

    Calling convention mirrors collectives.row_parallel_matmul: global arrays
    in, shard_map inside. packed_t [K·bits/32, N] words-major; scales_t/zeros_t
    [ngroups, N]. With gather=False the output stays column-sharded over
    `axis` (the reduce-scatter form — feed it straight to a column-parallel
    consumer).
    """
    D = mesh.shape[axis]
    M, K = x.shape
    N = packed_t.shape[1]
    ngroups = scales_t.shape[0]
    if N % (D * 128) and D > 1:
        raise ValueError(f"N={N} must split into {D} lane-aligned chunks")
    nc = N // D
    k_local = K // D
    vpw = 32 // bits
    if K % D or k_local % vpw or (groupsize > 0 and k_local % groupsize):
        raise ValueError(f"K={K} does not ring-shard over {D} devices on whole "
                         f"words/groups (groupsize={groupsize})")
    ng_local = max(ngroups // D, 1)

    if D == 1:
        from ..ops.dequant_matmul import _packed_matmul_local
        return _packed_matmul_local(x, packed_t, scales_t, zeros_t, bits=bits,
                                    groupsize=groupsize, qmin=qmin,
                                    interpret=interpret)

    ip = pltpu.InterpretParams() if interpret else False
    kern = functools.partial(
        _ring_kernel, axis=axis, D=D, nc=nc,
        bits=bits, ng_local=ng_local, k_local=k_local, qmin=qmin, gather=gather)

    out_shape = (M, N if gather else nc)
    slots = D - 1

    def local(xs, ps, ss, zs):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((slots, M, nc), jnp.float32),   # send_buf
                pltpu.VMEM((slots, M, nc), jnp.float32),   # comm (recv)
                pltpu.VMEM((M, nc), jnp.float32),          # own_buf
                pltpu.VMEM((slots, M, nc), jnp.float32),   # comm2 (gather)
                pltpu.SemaphoreType.DMA((slots,)),
                pltpu.SemaphoreType.DMA((slots,)),
                pltpu.SemaphoreType.DMA((slots,)),
                pltpu.SemaphoreType.DMA((slots,)),
            ],
            compiler_params=pltpu.CompilerParams(collective_id=7),
            interpret=ip,
        )(xs, ps, ss, zs)

    s_spec = P(axis, None) if ngroups > 1 else P(None, None)
    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), s_spec, s_spec),
        out_specs=P(None, None) if gather else P(None, axis),
        check_vma=False,
    )
    return f(x, packed_t, scales_t, zeros_t)
