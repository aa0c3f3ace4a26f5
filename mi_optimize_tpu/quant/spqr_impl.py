"""SpQR implementation: GPTQ-style loop + fp outliers + double-quantized qparams.

Exact-semantics re-implementation of LinearSpqrQuantizer
(/root/reference/mi_optimize/quantization/quantizer/SpqrQuantizer.py):

  * identity permutation, blocksize 128, per-channel asymmetric groups (:14-36)
  * SpQR find_params: degenerate rows -> [-1,1]; fractional zero -xmin/scale
    (:86-145); quant = clamp(round(x/scale + zero), 0, maxq) (:81-84)
  * outlier threshold = rel_thresh · mean(var(W,0)/diag(U)^2) (:205-206)
  * per-group leave-one-out error -> likely-outlier mask; group qparams
    refit on outlier-free weights (mean-imputed) (:143-167, :228-247)
  * double quantization: the per-group scales/zeros are themselves quantized
    at qq_scale_bits in qq_groups along the out axis (:253-273)
  * per-column: quantize with the *double-quantized* qparams, flag columns
    whose scaled error exceeds the threshold, keep those weights fp
    (:284-299), GPTQ error feedback within/between blocks (:302-312)
  * avg-bits accounting (:360-391)

TPU mapping: one jitted function; the column loop is a lax.fori_loop whose
group-boundary work (LOO + double quant) runs under lax.cond; error feedback
uses full-width masked rank-1/mat-mat updates (same trick as gptq.py).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.qparams import exact_div
from ..models.quant_linear import QuantizedLinear
from .base import finalize_hessian
from .common import make_weight_spec
from .config import QuantConfig

_EPS = 1e-9


def _find_params_rows(x2d, bits, sym):
    """SpQR find_params (weight=True, perchannel): per-row asym/sym qparams."""
    maxq = float(2 ** bits - 1)
    mn = x2d.min(axis=1)
    mx = x2d.max(axis=1)
    if sym:
        mx = jnp.maximum(jnp.abs(mn), mx)
        mn = jnp.where(mn < 0, -mx, mn)
    deg = mn == mx
    mn = jnp.where(deg, -1.0, mn)
    mx = jnp.where(deg, 1.0, mx)
    scale = exact_div(mx - mn, jnp.float32(maxq))
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = -exact_div(mn, scale)
    return scale, zero


def _quant(x, scale, zero, bits):
    maxq = float(2 ** bits - 1)
    q = jnp.clip(jnp.round(exact_div(x, jnp.clip(scale, _EPS, None)) + zero), 0.0, maxq)
    return scale * (q - zero)


def _double_quant(v_col, qq_bits, qq_groupsize):
    """Quantize a [out] qparam vector in groups of qq_groupsize along out."""
    g = v_col.reshape(-1, qq_groupsize)
    s, z = _find_params_rows(g, qq_bits, sym=False)
    return _quant(g, s[:, None], z[:, None], qq_bits).reshape(v_col.shape)


def _loo_error_reduction(group_w, d_group, bits, sym, loo_idx):
    """Reference get_leave_one_out_error (:143-167). group_w [out,g], d_group [g]."""
    loo = group_w[:, loo_idx]  # [out, g, g-1]
    out_f, g, _ = loo.shape
    flat = loo.reshape(out_f * g, g - 1)
    s, z = _find_params_rows(flat, bits, sym)
    rec = _quant(flat, s[:, None], z[:, None], bits).reshape(out_f, g, g - 1)
    d_loo = d_group[loo_idx]  # [g, g-1]
    loo_err = (((rec - loo) / d_loo[None]) ** 2).sum(-1)  # [out, g]
    s0, z0 = _find_params_rows(group_w, bits, sym)
    base = _quant(group_w, s0[:, None], z0[:, None], bits)
    base_err = (((base - group_w) / d_group[None]) ** 2).sum(1, keepdims=True)
    return base_err - loo_err  # [out, g]


@partial(jax.jit, static_argnames=(
    "bits", "blocksize", "groupsize", "qq_bits", "qq_groupsize", "sym", "percdamp", "rel_threshold"))
def spqr_quantize_matrix(
    W: jnp.ndarray,
    H: jnp.ndarray,
    *,
    bits: int,
    blocksize: int = 128,
    groupsize: int = 16,
    qq_bits: int = 3,
    qq_groupsize: int = 16,
    sym: bool = False,
    percdamp: float = 0.01,
    rel_threshold: float = 0.2,
):
    """Returns (Q fake-quant weights incl. fp outliers, scales, zeros, n_outliers)."""
    out_f, cols = W.shape
    assert cols % blocksize == 0 and blocksize % groupsize == 0
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)

    dead = jnp.diag(H) == 0.0
    H = H + percdamp * jnp.abs(jnp.diag(H)).mean() * jnp.eye(cols, dtype=jnp.float32)
    H = jnp.where(jnp.diag(dead.astype(jnp.float32)) > 0, 1.0, H)
    W = jnp.where(dead[None, :], 0.0, W)

    L = jnp.linalg.cholesky(H)
    Hinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(cols, dtype=jnp.float32))
    U = jnp.linalg.cholesky(Hinv).T  # upper, Hinv = U^T U
    d = jnp.diag(U)

    # torch .var() is UNBIASED (ddof=1) — SpqrQuantizer.py:205 outlier_scale
    thr = rel_threshold * jnp.mean(jnp.var(W, axis=0, ddof=1) / jnp.clip(d, _EPS, None) ** 2)

    ngroups = cols // groupsize
    loo_idx = np.arange(groupsize)[1:][None, :] - (
        np.arange(groupsize)[:, None] >= np.arange(groupsize)[1:][None, :]
    ).astype(np.int64)

    col_ids = jnp.arange(cols)

    def col_step(i_local, state, i1):
        W, Err, qs_cur, qz_cur, scales, zeros, n_out = state
        col = i1 + i_local
        gidx = col // groupsize

        def new_group(_):
            gw = jax.lax.dynamic_slice(W, (0, col), (out_f, groupsize))
            dg = jax.lax.dynamic_slice(d, (col,), (groupsize,))
            red = _loo_error_reduction(gw, dg, bits, sym, loo_idx)
            likely = (red > thr).astype(jnp.float32)
            keep = 1.0 - likely
            mean_keep = (gw * keep).sum(1, keepdims=True) / jnp.clip(keep.sum(1, keepdims=True), 1.0, None)
            gw_clean = gw * keep + mean_keep * likely
            s, z = _find_params_rows(gw_clean, bits, sym)
            qs = _double_quant(s, qq_bits, qq_groupsize)
            qz = _double_quant(z, qq_bits, qq_groupsize)
            return qs, qz, s, z

        qs_cur, qz_cur, s_raw, z_raw = jax.lax.cond(
            col % groupsize == 0, new_group,
            lambda _: (qs_cur, qz_cur, qs_cur, qz_cur), None,
        )
        scales = jax.lax.cond(
            col % groupsize == 0,
            lambda sc: jax.lax.dynamic_update_slice(sc, s_raw[:, None], (0, gidx)),
            lambda sc: sc, scales,
        )
        zeros = jax.lax.cond(
            col % groupsize == 0,
            lambda zc: jax.lax.dynamic_update_slice(zc, z_raw[:, None], (0, gidx)),
            lambda zc: zc, zeros,
        )

        w_col = jax.lax.dynamic_slice(W, (0, col), (out_f, 1))[:, 0]
        d_i = d[col]
        wq = _quant(w_col, qs_cur, qz_cur, bits)
        err = (w_col - wq) / d_i
        is_out = (err ** 2 > thr).astype(jnp.float32)
        wq_wo = _quant(w_col * (1.0 - is_out), qs_cur, qz_cur, bits)
        wq = wq_wo * (1.0 - is_out) + w_col * is_out
        err = (w_col - wq) / d_i
        n_out = n_out + is_out.sum()

        # feedback within the block: cols (col, i1+blocksize); col itself -> wq
        u_row = U[col]
        mask = (col_ids >= col) & (col_ids < i1 + blocksize)
        W = W - err[:, None] * jnp.where(mask, u_row, 0.0)[None, :]
        Err = jax.lax.dynamic_update_slice(Err, err[:, None], (0, i_local))
        return W, Err, qs_cur, qz_cur, scales, zeros, n_out

    def block_step(carry, i1):
        W, scales, zeros, n_out = carry
        Err = jnp.zeros((out_f, blocksize), jnp.float32)
        qs0 = jnp.zeros((out_f,), jnp.float32)
        W, Err, _, _, scales, zeros, n_out = jax.lax.fori_loop(
            0, blocksize,
            lambda i, st: col_step(i, st, i1),
            (W, Err, qs0, qs0, scales, zeros, n_out),
        )
        tail = col_ids >= (i1 + blocksize)
        U_rows = jax.lax.dynamic_slice(U, (i1, 0), (blocksize, cols))
        W = W - Err @ jnp.where(tail[None, :], U_rows, 0.0)
        return (W, scales, zeros, n_out), None

    scales0 = jnp.zeros((out_f, ngroups), jnp.float32)
    zeros0 = jnp.zeros((out_f, ngroups), jnp.float32)
    (Q, scales, zeros, n_out), _ = jax.lax.scan(
        block_step, (W, scales0, zeros0, jnp.zeros((), jnp.float32)),
        jnp.arange(cols // blocksize) * blocksize,
    )
    return Q, scales, zeros, n_out


def average_bits(cfg: QuantConfig, n_outliers: float, numel: int) -> float:
    """Reference get_average_number_of_bits (:360-391), round_zero=False."""
    w = cfg.wbit.bits
    g = cfg.w_groupsize if cfg.w_groupsize > 0 else 16
    avg = w + (cfg.qq_scale_bits + cfg.qq_zero_bits) / g \
        + 2 * (16 + 16) / (g * cfg.qq_groupsize)
    share = n_outliers / max(numel, 1)
    return round(avg + 32 * share, 2)


def spqr_quantize_linear(cfg: QuantConfig, lin: QuantizedLinear, stats) -> QuantizedLinear:
    if not cfg.quantize_weights:
        return lin
    H = finalize_hessian(stats)
    groupsize = cfg.w_groupsize if cfg.w_groupsize > 0 else 16
    Q, scales, zeros, n_out = spqr_quantize_matrix(
        lin.weight.astype(jnp.float32), H,
        bits=cfg.wbit.bits,
        blocksize=min(cfg.blocksize, lin.in_features),
        groupsize=groupsize,
        qq_bits=cfg.qq_scale_bits,
        qq_groupsize=cfg.qq_groupsize,
        sym=False,
        percdamp=cfg.percdamp,
        rel_threshold=cfg.outlier_relative_threshold,
    )
    # outliers stay fp -> not packable; fake-quant weights (reference parity:
    # SpQR is excluded from QLinear export, export/utils.py:8-22)
    spec = make_weight_spec(cfg, packed=False).replace(
        w_qtype="per_group", w_groupsize=groupsize, w_symmetric=False
    )
    return lin.replace(
        spec=spec,
        weight=Q.astype(lin.weight.dtype),
        w_scale=scales,
        w_zero=zeros,
    )
