"""Checkpoint round-trip + calibration-journal resume tests.

Generalizes the reference's save/load consistency oracle
(tests/test_export_module.py:12-40): generation from a reloaded checkpoint
must equal generation from the in-memory model.
"""
import numpy as np

import mi_optimize_tpu as mt
from mi_optimize_tpu.eval.ppl import compute_ppl
from mi_optimize_tpu.export import CalibrationJournal, load_model, save_model
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.quant.config import QuantConfig
from mi_optimize_tpu.serving import generate


def quantized_tiny(pack=True):
    m = Model.tiny_llama()
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 256, (1, 32)) for _ in range(2)]
    cfg = QuantConfig(algo="rtn", wbit="int4", w_qtype="per_group", w_groupsize=16, pack=pack)
    return mt.quantize(m, cfg, calib_data=batches), batches


def test_save_load_roundtrip(tmp_path):
    qm, batches = quantized_tiny()
    save_model(qm, str(tmp_path / "ckpt"))
    m2 = load_model(str(tmp_path / "ckpt"))
    assert m2.config == qm.config
    prompt = np.random.default_rng(1).integers(0, 256, (1, 8))
    out1 = generate(qm, prompt, max_new_tokens=6, fused=False)
    out2 = generate(m2, prompt, max_new_tokens=6, fused=False)
    np.testing.assert_array_equal(out1, out2)


def test_ppl_preserved_after_reload(tmp_path):
    qm, batches = quantized_tiny()
    save_model(qm, str(tmp_path / "c2"))
    m2 = load_model(str(tmp_path / "c2"))
    p1 = compute_ppl(qm, batches, fused=False)
    p2 = compute_ppl(m2, batches, fused=False)
    assert abs(p1 - p2) < 1e-3


def test_journal_resume(tmp_path):
    """Quantize with a journal, then 'crash' and resume — results identical."""
    from mi_optimize_tpu.quant.base import get_algo
    from mi_optimize_tpu.quant.calibrate import sequential_quantize

    m = Model.tiny_llama()
    rng = np.random.default_rng(2)
    batches = [rng.integers(0, 256, (1, 32))]
    qcfg = QuantConfig(algo="gptq", wbit="int4", blocksize=32, w_has_zero=True)
    algo = get_algo("gptq", qcfg)

    full = sequential_quantize(m.params, m.config, qcfg, algo, batches)

    j = CalibrationJournal(str(tmp_path / "journal"))
    # first pass writes the journal
    sequential_quantize(m.params, m.config, qcfg, algo, batches, journal=j)
    assert j.last_completed() == m.config.num_layers - 1
    # resume pass must skip all blocks and reproduce the same weights
    resumed = sequential_quantize(m.params, m.config, qcfg, algo, batches, journal=j)
    w1 = np.asarray(full["layers"][0]["q_proj"].packed)
    w2 = np.asarray(resumed["layers"][0]["q_proj"].packed)
    np.testing.assert_array_equal(w1, w2)


def test_export_packed_consistency():
    """Fake-quant model -> export_packed -> identical generation (the
    reference's export_module oracle, tests/test_export_module.py:12-40)."""
    from mi_optimize_tpu.export import export_packed

    qm, batches = quantized_tiny(pack=False)
    assert qm.params["layers"][0]["q_proj"].packed is None
    pm = export_packed(qm)
    assert pm.params["layers"][0]["q_proj"].packed is not None
    prompt = np.random.default_rng(3).integers(0, 256, (1, 8))
    out_fake = generate(qm, prompt, max_new_tokens=6, fused=False)
    out_packed = generate(pm, prompt, max_new_tokens=6, fused=False)
    np.testing.assert_array_equal(out_fake, out_packed)


def test_export_packed_skips_spqr():
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.export import export_packed
    from mi_optimize_tpu.models.model import Model as M

    m = M.tiny_llama()
    rng = np.random.default_rng(4)
    batches = [rng.integers(0, 256, (1, 32))]
    cfg = QuantConfig(algo="spqr", wbit="int4", w_groupsize=16, blocksize=32,
                      qq_groupsize=8)
    qm = mt.quantize(m, cfg, calib_data=batches)
    pm = export_packed(qm)
    # SpQR keeps fp outliers -> not grid-faithful -> must stay fake-quant
    assert pm.params["layers"][0]["q_proj"].packed is None
