"""Fused quantized MLP: gate/up dequant-matmuls + SiLU·mul + down dequant-matmul
in ONE Pallas kernel.

The SwiGLU MLP is associative over intermediate features:

    y = Σ_j down[:, I_j] · ( silu(x @ gate[:, I_j]) * (x @ up[:, I_j]) )

so a single kernel iterates intermediate tiles I_j: per grid step it unpacks a
gate and an up column slice, computes the activation slice entirely in VMEM,
unpacks the matching down row slice and accumulates the output — the [*, I]
activation tensor never exists in HBM and four launches (gate, up, silu·mul,
down) become one.

Layout reuse: both contraction directions are natural under the words-major
packed layout (core/packing.py) — gate/up packed [K·b/32, I] slice columns,
down packed [I·b/32, N] slices word-rows; down scales use the same
8-row-aligned per-tile pre-expansion as ops/dequant_matmul.py.

Scope: packed gate/up/down with identical wbit, per_group (g | TI) or
per_channel scales, no smooth factors / act quant / bias — exactly the
RTN/GPTQ int4 serving configuration.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dequant_matmul import _unpack_words

_TI = 128  # intermediate tile (divides llama 11008; 256 overflowed VMEM by 2.7MB)


def _dequant(wq, scales, zeros, group, rows, cols):
    ng = rows // group
    wd = ((wq.reshape(ng, group, cols) - zeros[:, None, :]) * scales[:, None, :])
    return wd.reshape(rows, cols)


def _kernel(x_ref, g_ref, gs_ref, gz_ref, u_ref, us_ref, uz_ref,
            dn_ref, ds_ref, dz_ref, o_ref, acc_ref,
            *, bits, k_group, i_group, ti, nk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)  # [TM, K]
    K = x.shape[1]
    ngk = K // k_group

    gw = _dequant(_unpack_words(g_ref[:], bits).astype(jnp.float32),
                  gs_ref[0:ngk, :], gz_ref[0:ngk, :], k_group, K, ti)
    gate = jax.lax.dot_general(x, gw, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    uw = _dequant(_unpack_words(u_ref[:], bits).astype(jnp.float32),
                  us_ref[0:ngk, :], uz_ref[0:ngk, :], k_group, K, ti)
    up = jax.lax.dot_general(x, uw, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    act = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up  # [TM, TI]

    ngi = ti // i_group
    dn = _dequant(_unpack_words(dn_ref[:], bits).astype(jnp.float32),
                  ds_ref[0:ngi, :], dz_ref[0:ngi, :], i_group, ti,
                  acc_ref.shape[1])
    acc_ref[:] += jax.lax.dot_general(act, dn, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _tile_expand(scales_t, zeros_t, qmin, n_tiles, groups_per_tile, total_groups):
    z = zeros_t.astype(jnp.float32) - float(qmin)
    s = scales_t.astype(jnp.float32)
    R = max(8, -(-groups_per_tile // 8) * 8)
    src = np.minimum(
        np.arange(n_tiles)[:, None] * groups_per_tile + np.arange(R)[None, :],
        total_groups - 1,
    ).reshape(-1)
    return s[src], z[src], R


@functools.partial(jax.jit, static_argnames=("bits", "k_group", "i_group", "qmin",
                                             "inter", "hidden", "interpret"))
def fused_mlp(x, g_packed, g_scales_t, g_zeros_t, u_packed, u_scales_t,
              u_zeros_t, d_packed, d_scales_t, d_zeros_t,
              *, bits, k_group, i_group, qmin, inter, hidden, interpret=False):
    """x [M, K] -> y [M, hidden].

    gate/up packed [K·b/32, I] with scales_t [K/g, I]; down packed [I·b/32, N]
    with scales_t [I/g, N]. Scales arrive in kernel layout ([groups, out]).
    """
    M, K = x.shape
    vpw = 32 // bits
    assert inter % _TI == 0
    n_tiles = inter // _TI
    ngk = K // k_group

    # tile the row axis: long-prefill M (e.g. 2048 at 7B) cannot hold the
    # whole [M, hidden] f32 accumulator + [M, K] f32 activation in VMEM
    # (r3: S=2048 OOMed the 16MB scoped limit). Weight tiles re-stream once
    # per row tile — acceptable for prefill, which is MXU-bound.
    TM = M
    for c in (512, 256, 128, 64, 32, 16, 8):
        if M % c == 0:
            TM = c
            break

    gz = g_zeros_t.astype(jnp.float32) - float(qmin)
    uz = u_zeros_t.astype(jnp.float32) - float(qmin)
    ds_exp, dz_exp, R = _tile_expand(d_scales_t, d_zeros_t, qmin, n_tiles,
                                     _TI // i_group, inter // i_group)

    kern = functools.partial(_kernel, bits=bits, k_group=k_group,
                             i_group=i_group, ti=_TI, nk=n_tiles)
    out = pl.pallas_call(
        kern,
        grid=(M // TM, n_tiles),
        in_specs=[
            pl.BlockSpec((TM, K), lambda m, j: (m, 0)),
            pl.BlockSpec((K // vpw, _TI), lambda m, j: (0, j)),
            pl.BlockSpec((ngk, _TI), lambda m, j: (0, j)),
            pl.BlockSpec((ngk, _TI), lambda m, j: (0, j)),
            pl.BlockSpec((K // vpw, _TI), lambda m, j: (0, j)),
            pl.BlockSpec((ngk, _TI), lambda m, j: (0, j)),
            pl.BlockSpec((ngk, _TI), lambda m, j: (0, j)),
            pl.BlockSpec((_TI // vpw, hidden), lambda m, j: (j, 0)),
            pl.BlockSpec((R, hidden), lambda m, j: (j, 0)),
            pl.BlockSpec((R, hidden), lambda m, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TM, hidden), lambda m, j: (m, 0)),
        out_shape=jax.ShapeDtypeStruct((M, hidden), x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, g_packed, g_scales_t.astype(jnp.float32), gz,
      u_packed, u_scales_t.astype(jnp.float32), uz,
      d_packed, ds_exp, dz_exp)
    return out


def mlp_supported(gate, up, down, hidden, inter) -> bool:
    """Whether the fused path applies to this (gate, up, down) triple."""
    for lin in (gate, up, down):
        if lin.packed is None or lin.bias is not None or lin.smooth_factor is not None:
            return False
        s = lin.spec
        if s.wbit not in (2, 4, 8) or s.abit is not None:
            return False
        if s.w_qtype not in ("per_group", "per_channel"):
            return False
    if gate.spec != up.spec or gate.spec.wbit != down.spec.wbit:
        return False
    if inter % _TI:
        return False
    gk = gate.spec.w_groupsize if gate.spec.w_qtype == "per_group" else hidden
    ik = down.spec.w_groupsize if down.spec.w_qtype == "per_group" else inter
    if hidden % gk or ik > _TI or _TI % ik:
        return False  # down groups must tile within _TI
    return gate.spec.w_unsigned == up.spec.w_unsigned == down.spec.w_unsigned


def mlp_apply_fused(x, gate, up, down, cfg):
    """Run the fused MLP for a supported triple; caller checked mlp_supported."""
    from ..core.qparams import qrange

    hidden = cfg.hidden_size
    inter = cfg.intermediate_size
    s = gate.spec
    rng = qrange(s.wbit, s.w_unsigned)
    gk = s.w_groupsize if s.w_qtype == "per_group" else hidden
    ik = down.spec.w_groupsize if down.spec.w_qtype == "per_group" else inter

    def scales_t(lin, n_out, ngroups):
        return (jnp.broadcast_to(jnp.reshape(lin.w_scale, (-1, ngroups)).T,
                                 (ngroups, n_out)),
                jnp.broadcast_to(jnp.reshape(lin.w_zero, (-1, ngroups)).T,
                                 (ngroups, n_out)))

    gs, gz = scales_t(gate, inter, hidden // gk)
    us, uz = scales_t(up, inter, hidden // gk)
    ds, dz = scales_t(down, hidden, inter // ik)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, hidden)
    M = x2.shape[0]
    pad = (-M) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    y = fused_mlp(x2, gate.packed, gs, gz, up.packed, us, uz,
                  down.packed, ds, dz,
                  bits=s.wbit, k_group=gk, i_group=ik, qmin=rng.qmin,
                  inter=inter, hidden=hidden,
                  interpret=jax.default_backend() != "tpu")
    if pad:
        y = y[:M]
    return y.reshape(*lead, hidden)
