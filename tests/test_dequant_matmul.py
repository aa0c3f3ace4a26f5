"""Pallas fused dequant-matmul ≡ jnp reference path (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mi_optimize_tpu.core import packing, qparams
from mi_optimize_tpu.core.qparams import qrange
from mi_optimize_tpu.models.quant_linear import (
    QuantSpec, QuantizedLinear, dequant_weight, quant_linear_apply,
)


def make_packed_linear(rng, out_f, in_f, bits, qtype, groupsize=-1, unsigned=True):
    w = rng.normal(size=(out_f, in_f)).astype(np.float32)
    fake_w, scale, zero = qparams.quantize_dequantize(
        jnp.asarray(w), bits, qtype, groupsize, symmetric=True, unsigned=unsigned
    )
    ints = qparams.quantize_to_int(fake_w, scale, zero, bits, qtype, groupsize, unsigned)
    packed = jnp.asarray(packing.pack_weight(np.asarray(ints), bits, qrange(bits, unsigned)))
    spec = QuantSpec(
        wbit=bits, w_qtype=qtype, w_groupsize=groupsize, w_unsigned=unsigned, w_packed=True
    )
    return QuantizedLinear(
        spec=spec, out_features=out_f, in_features=in_f,
        packed=packed, w_scale=scale, w_zero=zero,
    ), np.asarray(fake_w)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("qtype,groupsize", [("per_channel", -1), ("per_group", 128)])
def test_fused_matches_reference(rng, bits, qtype, groupsize):
    qlin, fake_w = make_packed_linear(rng, 256, 256, bits, qtype, groupsize)
    x = rng.normal(size=(16, 256)).astype(np.float32)
    y_ref = x @ fake_w.T
    y_fused = np.asarray(quant_linear_apply(qlin, jnp.asarray(x), fused=True))
    np.testing.assert_allclose(y_fused, y_ref, rtol=1e-4, atol=1e-3)


def test_fused_signed_grid(rng):
    qlin, fake_w = make_packed_linear(rng, 128, 256, 4, "per_channel", unsigned=False)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    y_ref = x @ fake_w.T
    y = np.asarray(quant_linear_apply(qlin, jnp.asarray(x), fused=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-3)


def test_fused_odd_batch_padding(rng):
    """M not a multiple of 8 exercises the pad/unpad path (decode batch=1)."""
    qlin, fake_w = make_packed_linear(rng, 128, 128, 4, "per_group", 32)
    x = rng.normal(size=(1, 5, 128)).astype(np.float32)
    y_ref = x.reshape(-1, 128) @ fake_w.T
    y = np.asarray(quant_linear_apply(qlin, jnp.asarray(x), fused=True)).reshape(-1, 128)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-3)


def test_dequant_weight_roundtrip(rng):
    qlin, fake_w = make_packed_linear(rng, 64, 128, 4, "per_group", 32)
    np.testing.assert_allclose(np.asarray(dequant_weight(qlin)), fake_w, rtol=1e-5, atol=1e-6)


def test_native_w8a8_matches_fake_path(rng):
    """int8x int8 MXU path ≈ fake-quant path (int32 accumulation is exact;
    fp accumulation differs at ~1e-6 relative)."""
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.models.model import Model
    from mi_optimize_tpu.quant.config import QuantConfig
    from mi_optimize_tpu.ops.int8_matmul import supports_native_int8

    m = Model.tiny_llama()
    batches = [rng.integers(0, 256, (1, 32)).astype(np.int64)]
    cfg = QuantConfig(algo="smoothquant", wbit="int8", abit="int8",
                      w_qtype="per_channel", a_qtype="per_token", pack=True)
    qm = mt.quantize(m, cfg, calib_data=batches)
    lin = qm.params["layers"][0]["q_proj"]
    assert supports_native_int8(lin.spec)
    x = jnp.asarray(rng.normal(size=(1, 4, lin.in_features)).astype(np.float32))
    y_fake = np.asarray(quant_linear_apply(lin, x, fused=False))
    y_int8 = np.asarray(quant_linear_apply(lin, x, fused=True))
    np.testing.assert_allclose(y_int8, y_fake, rtol=1e-4, atol=1e-4)


def test_native_w8a8_generation_consistency(rng):
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.models.model import Model
    from mi_optimize_tpu.quant.config import QuantConfig
    from mi_optimize_tpu.serving import generate

    m = Model.tiny_llama()
    batches = [rng.integers(0, 256, (1, 32)).astype(np.int64)]
    cfg = QuantConfig(algo="smoothquant", wbit="int8", abit="int8",
                      w_qtype="per_channel", a_qtype="per_token", pack=True)
    qm = mt.quantize(m, cfg, calib_data=batches)
    prompt = rng.integers(0, 256, (1, 8))
    out_fake = generate(qm, prompt, max_new_tokens=6, fused=False)
    out_int8 = generate(qm, prompt, max_new_tokens=6, fused=True)
    # logits differ at float-accumulation noise level; greedy tokens must agree
    np.testing.assert_array_equal(out_fake, out_int8)


def test_fused_mlp_matches_separate(rng):
    """One-kernel MLP ≡ gate/up/down separate path (interpret mode)."""
    import jax

    import mi_optimize_tpu as mt
    from mi_optimize_tpu.models import llama
    from mi_optimize_tpu.models.model import Model
    from mi_optimize_tpu.models.quant_linear import quant_linear_apply
    from mi_optimize_tpu.ops.mlp_fused import mlp_apply_fused, mlp_supported
    from mi_optimize_tpu.quant.config import QuantConfig

    cfg = llama.LlamaConfig.tiny(hidden_size=128, intermediate_size=512, head_dim=32)
    m = Model(config=cfg, params=llama.init_params(cfg, jax.random.PRNGKey(0)),
              family="llama")
    qm = mt.quantize(m, QuantConfig(algo="rtn", wbit="int4", w_qtype="per_group",
                                    w_groupsize=32), calib_data=[])
    blk = qm.params["layers"][0]
    gate, up, down = blk["gate_proj"], blk["up_proj"], blk["down_proj"]
    assert mlp_supported(gate, up, down, cfg.hidden_size, cfg.intermediate_size)
    for rows in (3, 280):  # 280 -> M=280 pads to 288 -> TM=32, 9 row tiles
        x = jnp.asarray(rng.normal(size=(1, rows, 128)).astype(np.float32))
        y_fused = np.asarray(mlp_apply_fused(x, gate, up, down, cfg))
        g = quant_linear_apply(gate, x, fused=False)
        u = quant_linear_apply(up, x, fused=False)
        y_ref = np.asarray(quant_linear_apply(down, jax.nn.silu(g) * u,
                                              fused=False))
        np.testing.assert_allclose(y_fused, y_ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# W4A8 prefill kernel (ops/w4a8_matmul.py): int8-dot formulation == fake-quant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("qtype,groupsize", [("per_group", 32), ("per_channel", -1)])
def test_w4a8_matches_fake_quant(rng, qtype, groupsize):
    from mi_optimize_tpu.ops.w4a8_matmul import supports_w4a8, w4a8_matmul

    qlin, fake_w = make_packed_linear(rng, 256, 256, 4, qtype, groupsize)
    spec = qlin.spec.replace(abit=8, a_qtype="per_token", a_dynamic=True,
                             a_symmetric=True, a_unsigned=False)
    qlin = qlin.replace(spec=spec)
    assert supports_w4a8(spec)

    x = rng.normal(size=(64, 256)).astype(np.float32)
    # fake-quant oracle: same dynamic absmax int8 activation grid + fp matmul
    amax = np.abs(x).max(axis=-1, keepdims=True)
    sx = amax / 127.0
    x_fake = np.clip(np.round(x / sx), -128, 127) * sx
    y_ref = x_fake @ fake_w.T

    y = np.asarray(w4a8_matmul(jnp.asarray(x), qlin))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-4)


def test_w4a8_routing_by_batch(rng, monkeypatch):
    """quant_linear_apply with MI_W4A8_INT=1: M>=32 takes the int-dot kernel,
    decode M stays on the f32 dequant path — both produce the same math.
    (The int path is OPT-IN: measured slower than the f32 dequant kernel at
    prefill shapes on v5e — BENCH_DETAILS.md round 2.)"""
    from mi_optimize_tpu.models.quant_linear import quant_linear_apply

    monkeypatch.setenv("MI_W4A8_INT", "1")

    qlin, fake_w = make_packed_linear(rng, 128, 128, 4, "per_group", 32)
    spec = qlin.spec.replace(abit=8, a_qtype="per_token", a_dynamic=True,
                             a_symmetric=True, a_unsigned=False)
    qlin = qlin.replace(spec=spec)
    x_big = rng.normal(size=(1, 40, 128)).astype(np.float32)
    x_small = x_big[:, :4]
    y_big = np.asarray(quant_linear_apply(qlin, jnp.asarray(x_big), fused=True))
    y_small = np.asarray(quant_linear_apply(qlin, jnp.asarray(x_small), fused=True))
    np.testing.assert_allclose(y_small, y_big[:, :4], rtol=1e-4, atol=1e-3)
    # both agree with the unfused fake-quant path
    y_ref = np.asarray(quant_linear_apply(qlin, jnp.asarray(x_big), fused=False))
    np.testing.assert_allclose(y_big, y_ref, rtol=1e-4, atol=1e-3)


def test_fused_int2(rng):
    """int2 packed weights through the fused kernel (spec-dec drafts)."""
    qlin, fake_w = make_packed_linear(rng, 128, 256, 2, "per_group", 128)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    y = np.asarray(quant_linear_apply(qlin, jnp.asarray(x), fused=True))
    np.testing.assert_allclose(y, x @ fake_w.T, rtol=1e-4, atol=1e-3)


@pytest.mark.slow  # r5 re-tier: fast representative = test_native_w8a8_matches_fake_path
def test_gptq_affine_int8_never_routes_native_w8a8():
    """Regression (r2 code review): affine GPTQ int8 zeros span [0,255]; the
    native int8 path's (q - zero).astype(int8) would wrap. The spec must carry
    w_symmetric=False for affine GPTQ so routing skips w8a8_matmul, and the
    fused forward must equal the unfused fake-quant forward."""
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.models.model import Model
    from mi_optimize_tpu.models import llama
    from mi_optimize_tpu.ops.int8_matmul import supports_native_int8
    from mi_optimize_tpu.quant.config import QuantConfig

    m = Model.tiny_llama()
    rng = np.random.default_rng(41)
    batches = [rng.integers(0, 256, (1, 32))]
    qcfg = QuantConfig(algo="gptq", wbit="int8", abit="int8",
                       w_qtype="per_channel", a_qtype="per_token",
                       quantization_type="dynamic", blocksize=16,
                       actorder=False, pack=True)
    qm = mt.quantize(m, qcfg, calib_data=batches)
    lin = qm.params["layers"][0]["q_proj"]
    assert lin.spec.w_symmetric is False  # affine default (w_qscheme='affine')
    assert not supports_native_int8(lin.spec)
    ids = rng.integers(0, 256, (1, 16))
    y_f = np.asarray(llama.forward(qm.params, qm.config, jnp.asarray(ids), fused=True))
    y_u = np.asarray(llama.forward(qm.params, qm.config, jnp.asarray(ids), fused=False))
    np.testing.assert_allclose(y_f, y_u, rtol=2e-3, atol=2e-3)
