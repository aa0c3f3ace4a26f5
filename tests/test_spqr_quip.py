"""SpQR and QuIP algorithm tests (tiny matrices + tiny-model e2e)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mi_optimize_tpu as mt
from mi_optimize_tpu.eval.ppl import compute_ppl
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.quant.config import QuantConfig


def random_hessian(rng, n, tokens=256):
    X = rng.normal(size=(tokens, n)).astype(np.float32)
    return 2.0 / 4 * (X.T @ X) / (tokens / 4)  # well-conditioned PSD


def test_spqr_matrix_reconstruction(rng):
    from mi_optimize_tpu.quant.spqr_impl import spqr_quantize_matrix

    W = rng.normal(size=(32, 64)).astype(np.float32)
    H = random_hessian(rng, 64)
    Q, scales, zeros, n_out = spqr_quantize_matrix(
        jnp.asarray(W), jnp.asarray(H), bits=8, blocksize=32, groupsize=16,
        qq_bits=8, qq_groupsize=8,
    )
    Q = np.asarray(Q)
    assert np.isfinite(Q).all()
    # int8 with error feedback: relative recon error small
    rel = np.abs(Q - W).mean() / np.abs(W).mean()
    assert rel < 0.05
    assert scales.shape == (32, 4)


def test_spqr_outliers_kept_fp(rng):
    from mi_optimize_tpu.quant.spqr_impl import spqr_quantize_matrix

    W = rng.normal(size=(32, 64)).astype(np.float32)
    W[5, 17] = 40.0  # massive outlier
    H = random_hessian(rng, 64)
    Q, _, _, n_out = spqr_quantize_matrix(
        jnp.asarray(W), jnp.asarray(H), bits=3, blocksize=32, groupsize=16,
        qq_bits=3, qq_groupsize=8,
    )
    assert float(n_out) >= 1
    # the outlier weight survives ~fp (up to accumulated error feedback),
    # far closer than any 3-bit grid point could land
    assert abs(float(Q[5, 17]) - 40.0) < 0.5


def test_quip_butterfly_orthogonal(rng):
    from mi_optimize_tpu.quant.quip_impl import rand_ortho_butterfly

    for n in (12, 64):
        Q = rand_ortho_butterfly(np.random.default_rng(0), n)
        np.testing.assert_allclose(Q @ Q.T, np.eye(n), atol=1e-4)


def test_quip_matrix_reconstruction(rng):
    from mi_optimize_tpu.quant.quip_impl import quip_quantize_matrix

    W = rng.normal(size=(32, 64)).astype(np.float32)
    H = random_hessian(rng, 64)
    Wq = np.asarray(quip_quantize_matrix(jnp.asarray(W), jnp.asarray(H), bits=8))
    assert np.isfinite(Wq).all()
    rel = np.abs(Wq - W).mean() / np.abs(W).mean()
    assert rel < 0.1


@pytest.mark.parametrize("algo", ["spqr", "quip"])
def test_e2e_tiny_model(algo):
    m = Model.tiny_llama()
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 256, (1, 32)) for _ in range(2)]
    fp_ppl = compute_ppl(m, batches, fused=False)
    cfg = QuantConfig(algo=algo, wbit="int4", w_groupsize=16, blocksize=32,
                      qq_groupsize=8)
    qm = mt.quantize(m, cfg, calib_data=batches)
    ppl = compute_ppl(qm, batches, fused=False)
    assert np.isfinite(ppl)
    assert ppl < fp_ppl * 5
