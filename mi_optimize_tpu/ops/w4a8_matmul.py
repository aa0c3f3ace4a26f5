"""W4A8 prefill matmul: int4 weights × int8 activations on the MXU.

The reference's W4A8 configs (GPTQ/RTN int4 weights + int8 activation quant,
e.g. smoothquant+gptq wbit=4 abit=8) are fake-quant — dequantize everything to
fp16 and run an fp GEMM. Round 1 measured that a naive per-group int8-dot
formulation is 5x SLOWER than the fused f32 dequant kernel at decode shapes
(M≤8: [M,128]x[128,TN] dots fragment the MXU — ROADMAP item 3). This kernel is
the PREFILL formulation: with M ≥ ~128 rows, per-group sub-dots are full MXU
passes and int8×int8→int32 runs at 2× the bf16 (4× the f32) MXU rate, turning
the compute-bound prefill into:

    y[m,n] = sx[m] · Σ_g  s_g[n] · Σ_{k∈g} xq[m,k] · (q[k,n] − z_g[n])

The zero-point subtraction happens on the int grid during the in-VMEM unpack
(GPTQ/RTN zeros are integral by construction), so each group contributes ONE
[TM, g]×[g, TN] int8 dot accumulated in int32 and rescaled in f32 — exactly the
product the fake-quant reference computes, with lossless int32 accumulation.

Routing: quant_linear_apply sends packed int4 layers with dynamic symmetric
signed int8 per-token activation quant here when the flattened batch M ≥ 32
(prefill); decode stays on the f32 dequant kernel (ops/dequant_matmul.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dequant_matmul import _pick_tile, _unpack_words


def supports_w4a8(spec) -> bool:
    return (
        spec.wbit == 4
        and spec.abit == 8
        and spec.a_dynamic
        and spec.a_symmetric
        and not spec.a_unsigned
        and spec.a_qtype in ("per_token", "per_tensor")
        and spec.fp8_format is None
        and not spec.quant_out
        and spec.w_qtype in ("per_group", "per_channel")
    )


def _kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, ng_tile, tk, nk, bits):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = tk // ng_tile
    wq = _unpack_words(w_ref[:], bits)  # [TK, TN] int32, natural k order
    s = s_ref[0:ng_tile, :]             # [ng, TN] f32
    z = z_ref[0:ng_tile, :]             # [ng, TN] f32 but integral values
    zi = z.astype(jnp.int32)
    x = x_ref[:]                        # [TM, TK] int8

    for gi in range(ng_tile):
        w8 = (wq[gi * g:(gi + 1) * g, :] - zi[gi:gi + 1, :]).astype(jnp.int8)
        xi = x[:, gi * g:(gi + 1) * g]
        part = jax.lax.dot_general(
            xi, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += part.astype(jnp.float32) * s[gi:gi + 1, :]

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("bits", "groupsize", "qmin", "interpret"))
def w4a8_matmul_int(xi, packed_t, scales_t, zeros_t, *, bits, groupsize, qmin,
                    interpret=False):
    """acc[M,N] (f32, pre-activation-scale) from int8 xi and packed int4 W.

    xi [M, K] int8; packed_t uint32 [K·bits/32, N]; scales_t/zeros_t
    [ngroups, N]. The caller multiplies by the per-token activation scale.
    `qmin` folds the storage bias (stored = q - qmin) into the zero table.
    """
    M, K = xi.shape
    N = packed_t.shape[1]
    g = groupsize if groupsize > 0 else K
    ngroups = K // g
    s_t = scales_t.astype(jnp.float32)
    z_eff = zeros_t.astype(jnp.float32) - float(qmin)  # on the stored grid
    vpw = 32 // bits

    TM = _pick_tile(M, (256, 128, 64, 32))
    TN = _pick_tile(N, (512, 256, 128))
    TK = None
    for cand in (512, 1024, 256, 2048):
        if K % cand or (cand // vpw) % 8:
            continue
        if cand % g == 0 or g % cand == 0:
            TK = cand
            break
    if TK is None:
        TK = K
    nk = K // TK
    ng_tile = max(TK // g, 1)
    R = max(8, -(-ng_tile // 8) * 8)
    src = jnp.minimum(
        (jnp.arange(nk)[:, None] * TK) // g + jnp.arange(R)[None, :], ngroups - 1
    ).reshape(-1)
    s_exp = s_t[src]
    z_exp = z_eff[src]

    grid = (M // TM, N // TN, nk)
    return pl.pallas_call(
        functools.partial(_kernel, ng_tile=ng_tile, tk=TK, nk=nk, bits=bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k)),
            pl.BlockSpec((TK // vpw, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((R, TN), lambda i, j, k: (k, j)),
            pl.BlockSpec((R, TN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        interpret=interpret,
    )(xi, packed_t, s_exp, z_exp)


def w4a8_matmul(x: jnp.ndarray, qlin) -> jnp.ndarray:
    """y = int8(x) @ dequant(int4 W)^T with the int dot; any leading dims.

    Matches the fake-quant reference bit-for-bit up to f32 rounding: the
    activation grid is the same dynamic absmax int8 grid `_quant_activations`
    uses, and the weight product is computed exactly in int32.
    """
    from ..core.qparams import div_round, exact_div, qrange

    s = qlin.spec
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    M = x2.shape[0]
    pad = (-M) % 32
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    if s.a_qtype == "per_token":
        amax = jnp.clip(jnp.abs(x2).max(axis=-1, keepdims=True), 1e-12, None)
    else:
        amax = jnp.clip(jnp.abs(x2).max(), 1e-12, None).reshape(1, 1)
    # exact_div/div_round: same correctly-rounded grid as _quant_activations
    # (XLA's reciprocal-multiply lowering flips round() at half-integer
    # boundaries otherwise — core/qparams.py)
    sx = exact_div(amax, jnp.float32(127.0))
    xi = jnp.clip(div_round(x2, sx), -128, 127).astype(jnp.int8)

    rng = qrange(s.wbit, s.w_unsigned)
    g = s.w_groupsize if (s.w_qtype == "per_group" and s.w_groupsize > 0) else -1
    N = qlin.out_features
    ngroups = K // (g if g > 0 else K)
    scales_t = jnp.broadcast_to(jnp.reshape(qlin.w_scale, (-1, ngroups)).T, (ngroups, N))
    zeros_t = jnp.broadcast_to(jnp.reshape(qlin.w_zero, (-1, ngroups)).T, (ngroups, N))
    acc = w4a8_matmul_int(
        xi, qlin.packed, scales_t, zeros_t,
        bits=s.wbit, groupsize=g, qmin=rng.qmin,
        interpret=jax.default_backend() != "tpu")
    y = acc * sx
    if pad:
        y = y[:M]
    return y.reshape(*lead, N).astype(x.dtype)
