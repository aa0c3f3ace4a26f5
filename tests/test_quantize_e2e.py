"""End-to-end quantization tests on a tiny random llama (CPU).

Oracle strategy (SURVEY.md §4): quantized-model PPL must stay close to fp PPL
at int8 and not explode at int4; fake-quant forward ≡ packed forward.
"""
import numpy as np
import pytest

import mi_optimize_tpu as mt
from mi_optimize_tpu.eval.ppl import compute_ppl
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.quant.config import QuantConfig


def make_model_and_data(seed=0, nbatches=2, seqlen=32):
    m = Model.tiny_llama()
    rng = np.random.default_rng(seed)
    batches = [rng.integers(0, 256, (1, seqlen)) for _ in range(nbatches)]
    return m, batches


@pytest.fixture(scope="module")
def fp_setup():
    m, batches = make_model_and_data()
    return m, batches, compute_ppl(m, batches, fused=False)


def quant_ppl(m, batches, **cfg_kw):
    cfg = QuantConfig(**cfg_kw)
    qm = mt.quantize(m, cfg, calib_data=batches)
    return compute_ppl(qm, batches, fused=False), qm


def test_rtn_int8_close_to_fp(fp_setup):
    m, batches, fp_ppl = fp_setup
    ppl, qm = quant_ppl(m, batches, algo="rtn", wbit="int8", w_qtype="per_channel")
    assert abs(ppl - fp_ppl) / fp_ppl < 0.02


def test_rtn_int4_per_group_packed(fp_setup):
    m, batches, fp_ppl = fp_setup
    ppl, qm = quant_ppl(m, batches, algo="rtn", wbit="int4", w_qtype="per_group", w_groupsize=16)
    assert ppl < fp_ppl * 3
    # weights actually packed
    lin = qm.params["layers"][0]["q_proj"]
    assert lin.packed is not None and lin.weight is None


def test_rtn_static_act_quant(fp_setup):
    m, batches, fp_ppl = fp_setup
    ppl, qm = quant_ppl(
        m, batches, algo="rtn", wbit="int8", abit="int8",
        quantization_type="static", a_qtype="per_tensor",
    )
    lin = qm.params["layers"][0]["q_proj"]
    assert lin.a_scale is not None
    assert ppl < fp_ppl * 2


def test_gptq_int4(fp_setup):
    m, batches, fp_ppl = fp_setup
    ppl, qm = quant_ppl(
        m, batches, algo="gptq", wbit="int4", w_qtype="per_group",
        w_groupsize=16, blocksize=32, w_has_zero=True,
    )
    assert ppl < fp_ppl * 3


def test_gptq_beats_rtn_int3(fp_setup):
    """GPTQ's error feedback should out-perform naive RTN at low bits."""
    m, batches, fp_ppl = fp_setup
    rtn_ppl, _ = quant_ppl(m, batches, algo="rtn", wbit="int3", w_qtype="per_channel")
    gptq_ppl, _ = quant_ppl(
        m, batches, algo="gptq", wbit="int3", blocksize=32, w_has_zero=True,
    )
    assert gptq_ppl < rtn_ppl * 1.1


def test_smoothquant_w8a8(fp_setup):
    m, batches, fp_ppl = fp_setup
    ppl, qm = quant_ppl(
        m, batches, algo="smoothquant", wbit="int8", abit="int8",
        w_qtype="per_channel", a_qtype="per_tensor",
    )
    lin = qm.params["layers"][0]["q_proj"]
    assert lin.smooth_factor is not None
    assert abs(ppl - fp_ppl) / fp_ppl < 0.05


def test_zeroquant(fp_setup):
    m, batches, fp_ppl = fp_setup
    ppl, qm = quant_ppl(m, batches, algo="zeroquant", wbit="int8", abit="int8", w_groupsize=16)
    assert abs(ppl - fp_ppl) / fp_ppl < 0.05


def test_fp8_e4m3(fp_setup):
    m, batches, fp_ppl = fp_setup
    ppl, qm = quant_ppl(m, batches, algo="fp8", wbit="int8", abit="int8", fp8_format="e4m3")
    assert abs(ppl - fp_ppl) / fp_ppl < 0.05


def test_passthrough_fp16(fp_setup):
    m, batches, fp_ppl = fp_setup
    cfg = QuantConfig(algo="rtn", wbit="float16", abit="float16")
    qm = mt.quantize(m, cfg, calib_data=batches)
    assert qm is m


def test_config_from_reference_style_dict():
    cfg = QuantConfig.from_dict({
        "quant_config": {
            "algo": "gptq",
            "model_type": "llama",
            "kwargs": {"wbit": "int4", "w_groupsize": 128, "actorder": True},
            "calibrate_config": {"name": "wikitext2", "nsample": 4, "seqlen": 64},
        }
    })
    assert cfg.algo == "gptq" and cfg.w_groupsize == 128
    assert cfg.calibrate.nsamples == 4


def test_unknown_config_key_rejected():
    with pytest.raises(ValueError):
        QuantConfig.from_dict({"algo": "rtn", "not_a_key": 1})


def test_quantize_with_config_driven_calibration():
    """Full reference-style entry: calib data built from quant_config.calibrate
    via the datasets layer (quantize(model, tokenizer, quant_config) parity)."""
    from mi_optimize_tpu.datasets.calibration import find_data_path
    from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer

    if find_data_path("wikitext") is None:
        pytest.skip("no wikitext data")
    m = Model.tiny_llama(vocab_size=300)
    cfg = QuantConfig.from_dict({
        "quant_config": {
            "algo": "gptq",
            "kwargs": {"wbit": "int4", "w_groupsize": 16, "blocksize": 32,
                       "w_has_zero": True},
            "calibrate_config": {"name": "wikitext2", "split": "train",
                                 "nsamples": 2, "seqlen": 64},
        }
    })
    qm = mt.quantize(m, cfg, tokenizer=ByteTokenizer())
    batches = [np.random.default_rng(0).integers(0, 300, (1, 32))]
    assert np.isfinite(compute_ppl(qm, batches, fused=False))


def test_gptq_actorder_grouped_packs_with_perm(fp_setup):
    """The north-star config (GPTQ grouped + actorder) must serve PACKED via
    the stored permutation — and match the fake-quant model exactly."""
    m, batches, fp_ppl = fp_setup
    kw = dict(algo="gptq", wbit="int4", w_qtype="per_group", w_groupsize=16,
              blocksize=32, actorder=True, w_has_zero=True)
    qm_packed = mt.quantize(m, QuantConfig(**kw, pack=True), calib_data=batches)
    qm_fake = mt.quantize(m, QuantConfig(**kw, pack=False), calib_data=batches)
    lin = qm_packed.params["layers"][0]["q_proj"]
    assert lin.packed is not None and lin.perm is not None
    ppl_packed = compute_ppl(qm_packed, batches, fused=True)
    ppl_fake = compute_ppl(qm_fake, batches, fused=False)
    # dequant(packed+perm) == fake weights bit-exactly (verified separately);
    # the residual PPL delta is f32 reduction-order noise from the permuted
    # summation order
    assert abs(ppl_packed - ppl_fake) / ppl_fake < 5e-3


def test_block_sequential_propagation(fp_setup):
    """block_sequential=True feeds quantized block outputs forward
    (llama_seq.py:155-158 ping-pong) — different stats, still-sane PPL."""
    m, batches, fp_ppl = fp_setup
    kw = dict(algo="gptq", wbit="int4", w_qtype="per_group", w_groupsize=16,
              blocksize=32, w_has_zero=True)
    ppl_bs, qm_bs = quant_ppl(m, batches, **kw, block_sequential=True)
    ppl_fp, qm_fp = quant_ppl(m, batches, **kw, block_sequential=False)
    assert np.isfinite(ppl_bs) and ppl_bs < fp_ppl * 3
    # the two propagation modes must actually differ (different calibration)
    w1 = np.asarray(qm_bs.params["layers"][1]["q_proj"].packed)
    w2 = np.asarray(qm_fp.params["layers"][1]["q_proj"].packed)
    assert not np.array_equal(w1, w2)
    # ...but block 0 sees identical inputs either way
    b1 = np.asarray(qm_bs.params["layers"][0]["q_proj"].packed)
    b2 = np.asarray(qm_fp.params["layers"][0]["q_proj"].packed)
    np.testing.assert_array_equal(b1, b2)


def test_generic_driver_matches_shapes(fp_setup):
    """layer_sequential=False (quant_other_model parity) quantizes everything."""
    m, batches, fp_ppl = fp_setup
    ppl, qm = quant_ppl(m, batches, algo="gptq", wbit="int4", blocksize=32,
                        w_has_zero=True, layer_sequential=False)
    assert np.isfinite(ppl) and ppl < fp_ppl * 3
    for blk in qm.params["layers"]:
        for name in ("q_proj", "down_proj"):
            assert blk[name].packed is not None or blk[name].weight is not None


def test_fp8_native_storage_exact(fp_setup):
    """Native float8 storage reproduces the emulated grid exactly and survives
    checkpointing."""
    import jax.numpy as jnp

    from mi_optimize_tpu.models.quant_linear import dequant_weight

    m, batches, fp_ppl = fp_setup
    cfg_native = QuantConfig(algo="fp8", wbit="int8", abit="float16",
                             fp8_format="e4m3", pack=True)
    cfg_fake = QuantConfig(algo="fp8", wbit="int8", abit="float16",
                           fp8_format="e4m3", pack=False)
    qn = mt.quantize(m, cfg_native, calib_data=batches)
    qf = mt.quantize(m, cfg_fake, calib_data=batches)
    ln, lf = qn.params["layers"][0]["q_proj"], qf.params["layers"][0]["q_proj"]
    assert ln.weight.dtype == jnp.float8_e4m3fn
    np.testing.assert_allclose(np.asarray(dequant_weight(ln)),
                               np.asarray(lf.weight), rtol=1e-6, atol=1e-7)
    ppl_n = compute_ppl(qn, batches, fused=False)
    ppl_f = compute_ppl(qf, batches, fused=False)
    assert abs(ppl_n - ppl_f) < 1e-3
