"""GPTQ: Hessian-aware error-feedback weight quantization.

Parity target: LinearGPTQQuantizer
(/root/reference/mi_optimize/quantization/quantizer/GPTQQuantizer.py):
  * H = (2/n)·ΣX^TX from calibration (via the xtx reducer)
  * dead-column handling (diag==0 → H_ii=1, W col zeroed)  (:84-87 region)
  * act-order permutation by descending Hessian diagonal    (:84-87)
  * damped Cholesky: H += percdamp·mean(diag);              (:92-99)
    Hinv's *upper* Cholesky factor U (Hinv = U^T U) drives the update
  * blocked column loop (blocksize=128) with error feedback
    W1[:,i:] -= err·U1[i,i:], inter-block W[:,i2:] -= Err1·U[i1:i2,i2:]
    (:104-137)
  * per-group scale refresh every w_groupsize columns, computed from the
    block-start state of W in permuted order (:118-123) — exactly the
    reference's timing (it reads W, which the inner loop never mutates)
  * qparams via torch-observer semantics (:51-67): min/max *clamped to
    include 0*, affine zero clamped to the quant range, symmetric scale
    uses float (qmax-qmin)/2 and midpoint zero (torch observer defaults)

TPU mapping (SURVEY.md §7.3.1): the inner 128-column loop is a
lax.fori_loop of masked rank-1 updates (the mask col>=i makes column i land
exactly on its quantized value, so Q needs no separate buffer); inter-block
updates are dense MXU matmuls; everything is one jitted function per shape.

Act-order packing: with actorder+per_group the scales live in permuted column
order; we pack the PERMUTED weight matrix and store the permutation on the
QuantizedLinear — the runtime gathers x into the permuted domain (the
reference simply cannot export this configuration, export/utils.py:8-22, so
our packed serving path is a strict superset).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.qparams import div_round, exact_div
from ..models.quant_linear import QuantizedLinear
from .base import BaseAlgo, finalize_hessian, register_algo
from .common import build_quantized_linear


# ---------------------------------------------------------------------------
# torch-observer-style qparams (include-zero clamp, float half-range)
# ---------------------------------------------------------------------------

def observer_qparams(w: jnp.ndarray, bits: int, symmetric: bool):
    """Per-out-channel qparams on the unsigned range [0, 2^b-1].

    Matches torch's (PerChannel)MinMaxObserver with quant_min=0,
    quant_max=2^b-1: min/max are clamped to include zero; symmetric scale
    divides by float (qmax-qmin)/2 with midpoint zero; affine zero is clamped
    into the range.
    """
    qmax = float(2 ** bits - 1)
    mn = jnp.minimum(w.min(axis=-1), 0.0)
    mx = jnp.maximum(w.max(axis=-1), 0.0)
    if symmetric:
        amax = jnp.maximum(-mn, mx)
        scale = jnp.maximum(exact_div(amax, jnp.float32(qmax / 2.0)), 1e-9)
        zero = jnp.full_like(scale, float((2 ** bits) // 2))
    else:
        scale = jnp.maximum(exact_div(mx - mn, jnp.float32(qmax)), 1e-9)
        zero = jnp.clip(-div_round(mn, scale), 0.0, qmax)
    return scale, zero


def _fake_quant_col(w, scale, zero, bits):
    qmax = float(2 ** bits - 1)
    q = jnp.clip(div_round(w, scale) + zero, 0.0, qmax)
    return (q - zero) * scale


# ---------------------------------------------------------------------------
# core GPTQ matrix solver
# ---------------------------------------------------------------------------

_INV_CHUNK = 1024


@partial(jax.jit, static_argnames=("n", "c"))
def _eye_block(s0, n, c):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, c), 0)
    cols_ = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    return (rows == s0 + cols_).astype(jnp.float32)


def _cholesky_inverse_chunked(L, n, chunk=_INV_CHUNK):
    blocks = []
    for s0 in range(0, n, chunk):
        c = min(chunk, n - s0)
        I_blk = _eye_block(jnp.asarray(s0), n, c)
        blocks.append(jax.scipy.linalg.cho_solve((L, True), I_blk))
    return jnp.concatenate(blocks, axis=1)


def gptq_quantize_matrix(
    W: jnp.ndarray,
    H: jnp.ndarray,
    *,
    bits: int,
    blocksize: int = 128,
    groupsize: int = -1,
    actorder: bool = True,
    symmetric: bool = False,
    percdamp: float = 0.01,
):
    """Quantize W [out, in] against Hessian H [in, in].

    Returns (Q, scales, zeros, perm): scales/zeros [out, ngroups] in
    act-order-permuted group order when actorder=True (see module docstring);
    perm is the act-order permutation (None when actorder=False).
    """
    out_f, cols = W.shape
    if groupsize > 0 and blocksize % groupsize != 0:
        raise ValueError(f"blocksize {blocksize} must be a multiple of groupsize {groupsize}")
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)

    dead = jnp.diag(H) == 0.0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = jnp.where(dead[None, :], 0.0, W)

    if actorder:
        perm = jnp.argsort(-jnp.diag(H))
        W = W[:, perm]
        H = H[perm][:, perm]
    else:
        perm = None

    damp = percdamp * jnp.mean(jnp.diag(H))
    H = H + damp * jnp.eye(cols, dtype=jnp.float32)

    # Hinv's upper Cholesky factor U (Hinv = U^T U), as in the reference's
    # cholesky → cholesky_inverse → cholesky(upper) chain. These run as eager
    # ops OUTSIDE the solver jit, and the inverse solves in RHS column chunks:
    # XLA's triangular_solve with a full [n,n] identity RHS materializes ~19GB
    # of temporaries at llama's 11008-wide down_proj — chunking bounds it.
    L = jnp.linalg.cholesky(H)
    Hinv = _cholesky_inverse_chunked(L, cols)
    del L
    U = jnp.linalg.cholesky(Hinv).T
    del Hinv

    Q, scales_all, zeros_all = _gptq_core(
        W, U, bits=bits, blocksize=blocksize, groupsize=groupsize,
        symmetric=symmetric,
    )
    if actorder:
        invperm = jnp.argsort(perm)
        Q = Q[:, invperm]
    return Q, scales_all, zeros_all, perm


@partial(jax.jit, static_argnames=("bits", "blocksize", "groupsize", "symmetric"))
def _gptq_core(
    W: jnp.ndarray,
    U: jnp.ndarray,
    *,
    bits: int,
    blocksize: int,
    groupsize: int,
    symmetric: bool,
):
    out_f, cols = W.shape

    if groupsize == -1:
        g_scale, g_zero = observer_qparams(W, bits, symmetric)  # [out]
        scales_all = g_scale[:, None]
        zeros_all = g_zero[:, None]

    col_idx = jnp.arange(blocksize)

    def block_step(carry, i1):
        W, scales_acc, zeros_acc = carry
        W1 = jax.lax.dynamic_slice(W, (0, i1), (out_f, blocksize))
        U1 = jax.lax.dynamic_slice(U, (i1, i1), (blocksize, blocksize))

        if groupsize > 0:
            # group starts inside this block; qparams from block-start W state
            ngr = blocksize // groupsize
            Wg = W1.reshape(out_f, ngr, groupsize)
            gs, gz = jax.vmap(
                lambda wg: observer_qparams(wg, bits, symmetric), in_axes=1, out_axes=1
            )(Wg)  # [out, ngr]
        else:
            gs = jnp.broadcast_to(g_scale[:, None], (out_f, 1))
            gz = jnp.broadcast_to(g_zero[:, None], (out_f, 1))

        def col_step(i, state):
            W1, Err1 = state
            w = jax.lax.dynamic_slice(W1, (0, i), (out_f, 1))[:, 0]
            d = jax.lax.dynamic_slice(U1, (i, i), (1, 1))[0, 0]
            gi = i // groupsize if groupsize > 0 else 0
            sc = jax.lax.dynamic_slice(gs, (0, gi), (out_f, 1))[:, 0]
            zp = jax.lax.dynamic_slice(gz, (0, gi), (out_f, 1))[:, 0]
            q = _fake_quant_col(w, sc, zp, bits)
            err = (w - q) / d
            u_row = jax.lax.dynamic_slice(U1, (i, 0), (1, blocksize))[0]
            upd = err[:, None] * jnp.where(col_idx >= i, u_row, 0.0)[None, :]
            W1 = W1 - upd  # column i lands exactly on q (err*d == w-q)
            Err1 = jax.lax.dynamic_update_slice(Err1, err[:, None], (0, i))
            return W1, Err1

        W1, Err1 = jax.lax.fori_loop(
            0, blocksize, col_step, (W1, jnp.zeros((out_f, blocksize), jnp.float32))
        )

        # write quantized block back; propagate error to the remaining columns
        W = jax.lax.dynamic_update_slice(W, W1, (0, i1))
        U_rows = jax.lax.dynamic_slice(U, (i1, 0), (blocksize, cols))
        tail_mask = jnp.arange(cols) >= (i1 + blocksize)
        W = W - (Err1 @ jnp.where(tail_mask[None, :], U_rows, 0.0))
        return (W, scales_acc, zeros_acc), (gs, gz)

    nblocks = cols // blocksize
    assert nblocks * blocksize == cols, "in_features must be a multiple of blocksize"
    (W, _, _), (gs_all, gz_all) = jax.lax.scan(
        block_step, (W, 0.0, 0.0), jnp.arange(nblocks) * blocksize
    )
    Q = W

    if groupsize > 0:
        # [nblocks, out, blocksize/groupsize] -> [out, ngroups]
        scales_all = jnp.moveaxis(gs_all, 0, 1).reshape(out_f, -1)
        zeros_all = jnp.moveaxis(gz_all, 0, 1).reshape(out_f, -1)

    return Q, scales_all, zeros_all


@register_algo("gptq")
class GPTQAlgo(BaseAlgo):
    stats = ("xtx",)

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        cfg = self.cfg
        if not cfg.quantize_weights:
            return lin
        H = finalize_hessian(stats)
        W = lin.weight.astype(jnp.float32)
        groupsize = cfg.w_groupsize
        Q, scales, zeros, perm = gptq_quantize_matrix(
            W, H,
            bits=cfg.wbit.bits,
            blocksize=min(cfg.blocksize, lin.in_features),
            groupsize=groupsize,
            actorder=cfg.actorder,
            symmetric=cfg.w_qscheme == "symmetric",
            percdamp=cfg.percdamp,
        )
        w_qtype = "per_group" if groupsize > 0 else "per_channel"
        if groupsize > 0 and cfg.actorder and cfg.pack:
            # grouped act-order: scales live in permuted column order, so pack
            # the PERMUTED weight and store `perm` — the runtime gathers x into
            # the permuted domain (the reference simply cannot export this
            # configuration, export/utils.py:8-22)
            out = build_quantized_linear(
                lin, cfg, Q[:, perm], scales, zeros, w_qtype=w_qtype,
                w_symmetric=cfg.w_qscheme == "symmetric",
            )
            if out.packed is not None:
                return out.replace(perm=perm)
            return build_quantized_linear(
                lin, cfg, Q, scales, zeros, w_qtype=w_qtype, pack_ok=False,
                w_symmetric=cfg.w_qscheme == "symmetric",
            )
        pack_ok = groupsize <= 0 or not cfg.actorder
        return build_quantized_linear(
            lin, cfg, Q, scales, zeros, w_qtype=w_qtype, pack_ok=pack_ok,
            w_symmetric=cfg.w_qscheme == "symmetric",
        )
