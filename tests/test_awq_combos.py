"""AWQ and combo-pipeline (AWQ+GPTQ, SmoothQuant+GPTQ) e2e tests."""
import numpy as np
import pytest

import mi_optimize_tpu as mt
from mi_optimize_tpu.eval.ppl import compute_ppl
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.quant.config import QuantConfig


@pytest.fixture(scope="module")
def setup():
    m = Model.tiny_llama()
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 256, (1, 32)) for _ in range(2)]
    return m, batches, compute_ppl(m, batches, fused=False)


def test_awq_int4(setup):
    m, batches, fp_ppl = setup
    cfg = QuantConfig(algo="awq", wbit="int4", w_groupsize=16)
    qm = mt.quantize(m, cfg, calib_data=batches)
    lin = qm.params["layers"][0]["q_proj"]
    assert lin.smooth_factor is not None
    assert lin.packed is not None
    ppl = compute_ppl(qm, batches, fused=False)
    assert ppl < fp_ppl * 3


def test_awq_gptq_combo(setup):
    m, batches, fp_ppl = setup
    cfg = QuantConfig(algo="awq+gptq", wbit="int4", w_qtype="per_group",
                      w_groupsize=16, blocksize=32, w_has_zero=True)
    qm = mt.quantize(m, cfg, calib_data=batches)
    lin = qm.params["layers"][0]["q_proj"]
    assert lin.smooth_factor is not None
    ppl = compute_ppl(qm, batches, fused=False)
    assert ppl < fp_ppl * 3


def test_smooth_gptq_combo(setup):
    m, batches, fp_ppl = setup
    cfg = QuantConfig(algo="smoothquant+gptq", wbit="int8", abit="int8",
                      w_qtype="per_channel", a_qtype="per_tensor",
                      blocksize=32, w_has_zero=True)
    qm = mt.quantize(m, cfg, calib_data=batches)
    lin = qm.params["layers"][0]["q_proj"]
    assert lin.smooth_factor is not None
    assert lin.spec.abit == 8
    ppl = compute_ppl(qm, batches, fused=False)
    assert abs(ppl - fp_ppl) / fp_ppl < 0.1
