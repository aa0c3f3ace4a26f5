"""AWQ: activation-aware weight quantization (grid-searched smoothing + clip).

Parity target: LinearAwqQuantizer
(/root/reference/mi_optimize/quantization/quantizer/AWQQuantizer.py):
  * 20-point ratio grid over s = x_max^r / w_max^(1-r), normalized by
    sqrt(max·min), choosing the MSE-minimizing smooth scale (:88-141)
  * per-output-channel clip search over a 20x0.5 shrink grid (:147-194)
  * final per-group asymmetric fake-quant (:39-84)
  * runtime divides activations by the smooth factor (:250-252)

Implemented in awq_impl.py once the input-sample reducer lands; this module
registers the algorithm.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.quant_linear import QuantizedLinear
from .base import BaseAlgo, register_algo
from .common import build_quantized_linear


@register_algo("awq")
class AWQAlgo(BaseAlgo):
    stats = ("inputs", "absmean")

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        from .awq_impl import awq_quantize_linear

        return awq_quantize_linear(self.cfg, lin, stats)
