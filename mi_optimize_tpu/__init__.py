"""mi_optimize_tpu — TPU-native post-training quantization + inference for LLMs.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
MI-optimize toolbox (see SURVEY.md): 8 PTQ algorithms (RTN, GPTQ, AWQ,
SmoothQuant, ZeroQuant, SpQR, QuIP, FP8) + combos, layer-sequential
calibration, packed-int inference via fused Pallas dequant-matmul kernels,
multi-chip sharding over jax.sharding meshes, and the full evaluation suite
(perplexity, C-Eval, CMMLU, BOSS, lm-eval).

Public API parity with the reference's three exports
(/root/reference/mi_optimize/__init__.py): `quantize`, `Benchmark`, `QLinear`
(ours: `QuantizedLinear` parameters + `quant_linear_apply`).
"""
from .precision import Precision, as_precision  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import mi_optimize_tpu` light (jax init is deferred).
    if name == "quantize":
        from .quant.api import quantize
        return quantize
    if name == "Benchmark":
        from .eval.benchmark import Benchmark
        return Benchmark
    if name == "QuantizedLinear":
        from .models.quant_linear import QuantizedLinear
        return QuantizedLinear
    raise AttributeError(name)
