"""Pure-function quantization numerics (qparam search, quant/dequant, fake-quant).

This is the TPU-native re-implementation of the reference's `Quantizer` engine
(/root/reference/mi_optimize/quantization/quantizer/utils.py:105-194): the same
granularity matrix (per_tensor / per_channel / per_group / per_dimension /
per_token), symmetric & asymmetric qparam formulas, and round-half-to-even
rounding — but as stateless jittable functions over jnp arrays instead of a
stateful nn.Module. Every quantizer algorithm and the packed-inference kernels
consume these primitives.

Semantics notes (bit-parity with the reference):
  * symmetric ("has_zero=False"): scale = max(|min|,|max|) / ((qmax-qmin)//2),
    zero = 0 for signed ranges else 2**(bits-1) (midpoint).
  * asymmetric ("has_zero=True"): scale = (max-min)/(qmax-qmin),
    zero = qmin - round(min/scale).
  * quantize: clamp(round(x/scale) + zero, qmin, qmax).  jnp.round and
    torch.round are both round-half-to-even, so integer grids match bit-exactly.
  * We add an epsilon guard on zero scales (an all-zero row in the reference
    produces NaNs); this only changes behavior on degenerate inputs.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

GRANULARITIES = ("per_tensor", "per_channel", "per_group", "per_dimension", "per_token")

_EPS = 1e-12


def exact_div(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """f32 division refined to the correctly-rounded quotient.

    XLA may lower a division as reciprocal-multiply inside fusions (always on
    TPU, and on CPU inside scan/map bodies), which is off by ~2 ulp from the
    true f32 quotient that a strict division (torch) computes. Quantization
    rounds these quotients at EXACT half-integer boundaries — a clipped
    symmetric group has -min/scale ≈ (qmax+1)/2 — so 2 ulp flips the rounded
    integer and breaks bit-parity with the reference. One residual step
    (r += (x - r·y)/y) collapses the error to <0.5 ulp, reproducing the
    strict quotient deterministically regardless of how XLA lowers the
    divisions. The optimization_barrier stops XLA's algebraic simplifier from
    folding the correction back into a single (reciprocal) division —
    measured: without it the flips return."""
    import jax

    r = jax.lax.optimization_barrier(x / y)
    return r + (x - r * y) / y


def div_round(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """round-half-to-even of the correctly-rounded f32 quotient x/y."""
    return jnp.round(exact_div(x, y))


class QRange(NamedTuple):
    qmin: int
    qmax: int
    bits: int
    unsigned: bool


def qrange(bits: int, unsigned: bool = True) -> QRange:
    if unsigned:
        return QRange(0, (1 << bits) - 1, bits, True)
    return QRange(-(1 << (bits - 1)), (1 << (bits - 1)) - 1, bits, False)


def find_qparams(
    x_min: jnp.ndarray,
    x_max: jnp.ndarray,
    rng: QRange,
    symmetric: bool,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (scale, zero_point) from min/max statistics.

    `symmetric` corresponds to the reference's `has_zero=False`.
    Returns arrays broadcastable against the data the stats were reduced from.
    """
    x_min = jnp.asarray(x_min, compute_dtype)
    x_max = jnp.asarray(x_max, compute_dtype)
    if symmetric:
        max_abs = jnp.maximum(jnp.abs(x_max), jnp.abs(x_min))
        scale = exact_div(max_abs, jnp.float32((rng.qmax - rng.qmin) // 2))
        scale = jnp.maximum(scale, _EPS)
        zp_val = 0 if rng.qmin < 0 else (1 << (rng.bits - 1))
        zero = jnp.full_like(scale, zp_val)
    else:
        scale = exact_div(x_max - x_min, jnp.float32(rng.qmax - rng.qmin))
        scale = jnp.maximum(scale, _EPS)
        zero = rng.qmin - div_round(x_min, scale)
    return scale, zero


def quantize(x, scale, zero, rng: QRange) -> jnp.ndarray:
    """Real-valued x -> integer grid (kept in float for downstream math)."""
    q = div_round(jnp.asarray(x, jnp.float32), scale) + zero
    return jnp.clip(q, rng.qmin, rng.qmax)


def dequantize(q, scale, zero) -> jnp.ndarray:
    return scale * (jnp.asarray(q, jnp.float32) - zero)


def _minmax_rows(x2d):
    return x2d.min(axis=1, keepdims=True), x2d.max(axis=1, keepdims=True)


def quantize_dequantize(
    x: jnp.ndarray,
    bits: int,
    qtype: str = "per_tensor",
    groupsize: int = -1,
    symmetric: bool = True,
    unsigned: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fake-quantize `x`; returns (dq, scales, zeros).

    Granularity semantics mirror the reference exactly:
      per_tensor     one (scale, zero) for the whole array
      per_channel    stats over the last axis of x flattened to 2D (weight rows)
      per_group      stats over contiguous `groupsize` chunks of the last axis;
                     scales returned as [..., last/groupsize]
      per_dimension  stats per last-axis feature, reduced over all other axes
      per_token      alias of per_channel for activation [tokens, features]
    """
    orig_shape = x.shape
    orig_dtype = x.dtype
    rng = qrange(bits, unsigned)
    xf = jnp.asarray(x, jnp.float32)

    if qtype == "per_tensor":
        scale, zero = find_qparams(xf.min(), xf.max(), rng, symmetric)
        dq = dequantize(quantize(xf, scale, zero, rng), scale, zero)
    elif qtype in ("per_channel", "per_token"):
        x2 = xf.reshape(-1, orig_shape[-1])
        mn, mx = _minmax_rows(x2)
        scale, zero = find_qparams(mn, mx, rng, symmetric)
        dq = dequantize(quantize(x2, scale, zero, rng), scale, zero).reshape(orig_shape)
    elif qtype == "per_group":
        if groupsize <= 0:
            raise ValueError(f"per_group requires groupsize>0, got {groupsize}")
        if orig_shape[-1] % groupsize != 0:
            raise ValueError(f"last dim {orig_shape[-1]} not divisible by groupsize {groupsize}")
        xg = xf.reshape(-1, groupsize)
        mn, mx = _minmax_rows(xg)
        scale, zero = find_qparams(mn, mx, rng, symmetric)
        dq = dequantize(quantize(xg, scale, zero, rng), scale, zero).reshape(orig_shape)
        ngroups = orig_shape[-1] // groupsize
        scale = scale.reshape(*orig_shape[:-1], ngroups)
        zero = zero.reshape(*orig_shape[:-1], ngroups)
    elif qtype == "per_dimension":
        x2 = xf.reshape(-1, orig_shape[-1])
        mn = x2.min(axis=0, keepdims=True)
        mx = x2.max(axis=0, keepdims=True)
        scale, zero = find_qparams(mn, mx, rng, symmetric)
        dq = dequantize(quantize(x2, scale, zero, rng), scale, zero).reshape(orig_shape)
    else:
        raise ValueError(f"unsupported qtype {qtype!r}; one of {GRANULARITIES}")

    return dq.astype(orig_dtype), scale, zero


def quantize_to_int(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    bits: int,
    qtype: str,
    groupsize: int = -1,
    unsigned: bool = True,
) -> jnp.ndarray:
    """Map real weights to the integer grid given existing qparams (for packing).

    Mirrors the export-time reconstruction `round(fake_w/scale + zero)` of the
    reference packers (role of /root/reference/mi_optimize/export/qnn.py:191),
    with scales broadcast per granularity. Returns int32 in [qmin, qmax].
    """
    rng = qrange(bits, unsigned)
    orig_shape = x.shape
    xf = jnp.asarray(x, jnp.float32)
    if qtype == "per_group" and groupsize > 0:
        xg = xf.reshape(-1, groupsize)
        q = quantize(xg, scale.reshape(-1, 1), zero.reshape(-1, 1), rng)
        return q.reshape(orig_shape).astype(jnp.int32)
    if qtype in ("per_channel", "per_token"):
        x2 = xf.reshape(-1, orig_shape[-1])
        q = quantize(x2, scale.reshape(-1, 1), zero.reshape(-1, 1), rng)
        return q.reshape(orig_shape).astype(jnp.int32)
    q = quantize(xf, jnp.reshape(scale, ()), jnp.reshape(zero, ()), rng)
    return q.astype(jnp.int32)
