"""QuIP implementation: incoherence preprocessing + LDL(GPTQ-equivalent) rounding.

Exact-semantics re-implementation of QuIPQuantizer
(/root/reference/mi_optimize/quantization/quantizer/QuIPQuantizer.py), defaults
incoh_processing=True, qfn='b', qmethod='ldl_gptqequiv':

  * Hessian = ΣX^TX / nbatches (the QuIP hook variant, quantizer/utils.py:74-102
    — no factor 2, fp64 there; fp32 here: TPUs have no native f64, SURVEY §7.3.5)
  * preproc (:86-135): H /= |H|max; scaleWH = (diagH/diagW²)^(1/4); W·s, H/s/s;
    random orthogonal butterfly U,V (prime-factor Kronecker blocks ·
    permutations); H trace-normalized + 1e-2·I; W←U W Vᵀ, H←V H Vᵀ; then the
    GPTQ dead/damp step
  * qfn 'b' (:360): scale = 2.4·rms(W)+1e-16, map to [0,maxq] grid
  * round_ldl_gptqequiv (:321-341): flip-Cholesky LDL factor, sequential
    column rounding w_i = clamp(floor(w_i + (w−ŵ)L[:,i] + 1/2))
  * postproc inverse (:141-159); result stays fake-quant (QuIP is excluded
    from packed export in the reference too, export/utils.py:8-22)

The scipy special_ortho_group dependency is replaced by QR-of-Gaussian blocks
(Haar-distributed after sign fixing), per SURVEY.md §7.3.5.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.quant_linear import QuantizedLinear
from .common import make_weight_spec
from .config import QuantConfig


# ---------------------------------------------------------------------------
# random orthogonal butterfly (host-side numpy, once per linear)
# ---------------------------------------------------------------------------

def _prime_factors(n: int):
    fs, d = [], 2
    while d * d <= n:
        while n % d == 0:
            fs.append(d)
            n //= d
        d += 1
    if n > 1:
        fs.append(n)
    return fs


def butterfly_factors(n: int) -> Tuple[int, int]:
    pf = _prime_factors(n)
    import math
    return (math.prod(pf[0::2]), math.prod(pf[1::2]))


def _rand_orthos(rng: np.random.Generator, m: int, p: int) -> np.ndarray:
    """m Haar-random SO(p) blocks via QR of Gaussians (sign-fixed)."""
    if p == 2:
        t = rng.uniform(0, 2 * np.pi, m)
        X = np.zeros((m, 2, 2), np.float32)
        X[:, 0, 0] = np.cos(t); X[:, 1, 1] = np.cos(t)
        X[:, 0, 1] = np.sin(t); X[:, 1, 0] = -np.sin(t)
        return X
    A = rng.normal(size=(m, p, p))
    Q, R = np.linalg.qr(A)
    # make Haar: multiply columns by sign of R diagonal, then fix det to +1
    s = np.sign(np.einsum("mii->mi", R))
    Q = Q * s[:, None, :]
    det = np.linalg.det(Q)
    Q[:, :, 0] *= np.sign(det)[:, None]
    return Q.astype(np.float32)


def rand_ortho_butterfly(rng: np.random.Generator, n: int) -> np.ndarray:
    """Dense [n,n] random orthogonal matrix with butterfly structure
    (reference gen_rand_ortho_butterfly + mul_ortho_butterfly on eye)."""
    import math

    pfn = butterfly_factors(n)
    Bs = [_rand_orthos(rng, n // p, p) for p in pfn]
    p_in = rng.permutation(n)
    p_out = rng.permutation(n)

    x = np.eye(n, dtype=np.float32)
    q = n
    x = x[p_in, :]
    for i, p in enumerate(pfn):
        mpfx = math.prod(pfn[:i])
        msfx = math.prod(pfn[i + 1:])
        x = x.reshape(mpfx, p, msfx, q).transpose(0, 2, 1, 3).reshape(mpfx * msfx, p, q)
        x = np.einsum("bpq,bqk->bpk", Bs[i], x)
        x = x.reshape(mpfx, msfx, p, q).transpose(0, 2, 1, 3).reshape(n, q)
    return x[p_out, :]


# ---------------------------------------------------------------------------
# LDL rounding + pre/post processing (jitted)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nbits", "blocksize"))
def round_ldl_gptqequiv(w: jnp.ndarray, H: jnp.ndarray, nbits: int,
                        blocksize: int = 128) -> jnp.ndarray:
    """Blocked sequential LDL rounding (reference :321-341 semantics).

    Numerically the reference loop computes, per column i,
    c_i = (w - ŵ)[:, :i+1] @ L[:i+1, i]. Blocking splits that sum: the
    contribution of columns < i1 is one [m, i1] x [i1, B] matmul per block
    (MXU), and the inner fori adds only the within-block part — cutting HBM
    traffic from O(d · m·d) to O((d/B) · m·d) (same trick as gptq.py; float
    summation order changes, values agree to f32 noise).
    """
    m, d = w.shape
    assert d % blocksize == 0, "in_features must be a multiple of blocksize"
    maxq = float(2 ** nbits - 1)
    Hf = jnp.flip(H, (0, 1))
    Lf = jnp.linalg.cholesky(Hf)
    L = jnp.flip(Lf, (0, 1))
    L = L @ jnp.diag(1.0 / jnp.diag(L))
    L = L - jnp.eye(d, dtype=w.dtype)
    col_ids = jnp.arange(d)
    blk_ids = jnp.arange(blocksize)

    def block_step(w_hat, i1):
        # past contribution for all of this block's columns at once
        diff = jnp.where(col_ids[None, :] < i1, w - w_hat, 0.0)  # [m, d]
        L_blk = jax.lax.dynamic_slice(L, (0, i1), (d, blocksize))
        C_past = diff @ L_blk  # [m, B]
        W_blk = jax.lax.dynamic_slice(w, (0, i1), (m, blocksize))
        L1 = jax.lax.dynamic_slice(L, (i1, i1), (blocksize, blocksize))

        def col_step(i, hat_blk):
            within = jnp.where(blk_ids < i, W_blk - hat_blk, 0.0) @ L1[:, i]
            c = C_past[:, i] + within
            new_col = jnp.clip(jnp.floor(W_blk[:, i] + c + 0.5), 0.0, maxq)
            return hat_blk.at[:, i].set(new_col)

        hat_blk = jax.lax.fori_loop(0, blocksize, col_step, W_blk)
        return jax.lax.dynamic_update_slice(w_hat, hat_blk, (0, i1)), None

    w_hat, _ = jax.lax.scan(block_step, w, jnp.arange(d // blocksize) * blocksize)
    return w_hat


def quip_quantize_matrix(
    W: jnp.ndarray,
    H: jnp.ndarray,
    *,
    bits: int,
    qfn: str = "b",
    percdamp: float = 0.01,
    incoh: bool = True,
    seed: int = 0,
    U: jnp.ndarray = None,
    V: jnp.ndarray = None,
) -> jnp.ndarray:
    """Full QuIP pipeline on one weight matrix; returns fake-quant weights.

    `U`/`V` override the internally-drawn random orthogonal butterflies —
    used by the reference-parity tests to feed both pipelines identical
    transforms (the randomness is the only non-deterministic step)."""
    m, n = W.shape
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)
    maxq = float(2 ** bits - 1)

    if incoh:
        # --- rescale (:94-107)
        H = H / jnp.max(jnp.abs(H))
        diagH = jnp.clip(jnp.diag(H), 1e-8, None)
        diagW2 = jnp.clip(jnp.sum(W * W, axis=0), 1e-8, None)
        scaleWH = jnp.clip(jnp.sqrt(jnp.sqrt(diagH / diagW2)), 1e-8, None)
        W = W * scaleWH[None, :]
        H = H / scaleWH[None, :] / scaleWH[:, None]
        # --- orthogonal projection (:108-126)
        if U is None or V is None:
            rng = np.random.default_rng(seed)
            U = jnp.asarray(rand_ortho_butterfly(rng, m))
            V = jnp.asarray(rand_ortho_butterfly(rng, n))
        else:
            U = jnp.asarray(U, jnp.float32)
            V = jnp.asarray(V, jnp.float32)
        H = H * (n / (jnp.trace(H) + 1e-8)) + 1e-2 * jnp.eye(n, dtype=jnp.float32)
        W = U @ W @ V.T
        H = V @ H @ V.T

    # --- gptqH (:128-135)
    dead = jnp.diag(H) == 0.0
    H = jnp.where(jnp.diag(dead.astype(jnp.float32)) > 0, 1.0, H)
    W = jnp.where(dead[None, :], 0.0, W)
    H = H + percdamp * jnp.mean(jnp.diag(H)) * jnp.eye(n, dtype=jnp.float32)

    if qfn == "a":
        # per-column asym params (find_params weight=False on 2D -> per column)
        mn = jnp.min(W, axis=0)
        mx = jnp.max(W, axis=0)
        deg = mn == mx
        mn = jnp.where(deg, -1.0, mn)
        mx = jnp.where(deg, 1.0, mx)
        scale = (mx - mn) / maxq
        zero = -mn / scale
        wr = jnp.clip(W / scale[None, :] + zero[None, :], 0.0, maxq)
        wr = round_ldl_gptqequiv(wr, H, bits, blocksize=min(128, n))
        Wq = scale[None, :] * (wr - zero[None, :])
    elif qfn == "b":
        scale = 2.4 * jnp.sqrt(jnp.mean(W * W)) + 1e-16
        wr = jnp.clip((W / scale + 1.0) / 2.0 * maxq, 0.0, maxq)
        wr = round_ldl_gptqequiv(wr, H, bits, blocksize=min(128, n))
        Wq = ((wr / maxq) * 2.0 - 1.0) * scale
    else:
        raise ValueError(f"qfn must be 'a'|'b', got {qfn}")

    if incoh:
        # --- postproc inverse (:141-159)
        Wq = U.T @ Wq @ V
        Wq = Wq / scaleWH[None, :]
    return Wq


def quip_quantize_linear(cfg: QuantConfig, lin: QuantizedLinear, stats) -> QuantizedLinear:
    if not cfg.quantize_weights:
        return lin
    # QuIP hook: H = ΣX^TX / nbatches (no factor 2)
    H = stats["xtx"] / jnp.maximum(stats["nsamples"].astype(jnp.float32), 1.0)
    Wq = quip_quantize_matrix(
        lin.weight.astype(jnp.float32), H,
        bits=cfg.wbit.bits, qfn=cfg.qfn, percdamp=cfg.percdamp,
    )
    spec = make_weight_spec(cfg, packed=False)
    return lin.replace(spec=spec, weight=Wq.astype(lin.weight.dtype))
