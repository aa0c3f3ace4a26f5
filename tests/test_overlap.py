"""Comm/compute-overlapped ring dequant-matmul: interpret-mode equivalence.

Pallas TPU interpret mode simulates the inter-chip DMAs and semaphores on the
virtual CPU mesh, so the ring schedule (parallel/overlap.py) is validated for
correctness here; on-chip profiling needs a real multi-chip slice (ROADMAP).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.parallel import make_mesh
from mi_optimize_tpu.parallel.collectives import row_parallel_matmul
from mi_optimize_tpu.parallel.overlap import overlapped_row_parallel_dequant_matmul
from mi_optimize_tpu.models.quant_linear import dequant_weight, quant_linear_apply
from tests.test_dequant_matmul import make_packed_linear


def _operands(rng, K, N, bits, qtype, gs):
    qlin, fake_w = make_packed_linear(rng, N, K, bits, qtype, gs)
    ng = K // (gs if gs > 0 else K)
    scales_t = jnp.broadcast_to(jnp.reshape(qlin.w_scale, (-1, ng)).T, (ng, N))
    zeros_t = jnp.broadcast_to(jnp.reshape(qlin.w_zero, (-1, ng)).T, (ng, N))
    return qlin, fake_w, scales_t, zeros_t


@pytest.mark.parametrize("qtype,gs", [("per_group", 32), ("per_channel", -1)])
@pytest.mark.parametrize("n_model", [2, 4])
def test_overlapped_ring_matches_row_parallel(qtype, gs, n_model):
    rng = np.random.default_rng(31)
    mesh = make_mesh(n_model=n_model, n_data=1)
    K = N = 512
    qlin, fake_w, scales_t, zeros_t = _operands(rng, K, N, 4, qtype, gs)
    x = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))

    y = overlapped_row_parallel_dequant_matmul(
        x, qlin.packed, scales_t, zeros_t, mesh,
        bits=4, groupsize=gs, qmin=0, interpret=True)

    # oracle 1: the GSPMD-style row-parallel matmul on the dequantized weights
    y_rp = row_parallel_matmul(x, jnp.asarray(dequant_weight(qlin)), mesh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_rp),
                               rtol=1e-5, atol=1e-4)
    # oracle 2: the unsharded fused kernel
    y_fused = quant_linear_apply(qlin, x, fused=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_fused),
                               rtol=1e-5, atol=1e-4)


def test_overlapped_reduce_scatter_form():
    """gather=False leaves the output column-sharded (reduce-scatter form)."""
    rng = np.random.default_rng(33)
    mesh = make_mesh(n_model=4, n_data=1)
    K = N = 512
    qlin, fake_w, scales_t, zeros_t = _operands(rng, K, N, 4, "per_group", 32)
    x = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))
    y = overlapped_row_parallel_dequant_matmul(
        x, qlin.packed, scales_t, zeros_t, mesh,
        bits=4, groupsize=32, qmin=0, gather=False, interpret=True)
    assert y.shape == (8, N)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ fake_w.T,
                               rtol=1e-5, atol=1e-4)


def test_overlapped_ring_with_data_axis():
    """Each 'data' row runs its own independent ring (2D mesh)."""
    rng = np.random.default_rng(35)
    mesh = make_mesh(n_model=2, n_data=2)
    K = N = 256
    qlin, fake_w, scales_t, zeros_t = _operands(rng, K, N, 4, "per_group", 32)
    x = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))
    y = overlapped_row_parallel_dequant_matmul(
        x, qlin.packed, scales_t, zeros_t, mesh,
        bits=4, groupsize=32, qmin=0, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ fake_w.T,
                               rtol=1e-5, atol=1e-4)
