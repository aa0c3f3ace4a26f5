"""SpQR: GPTQ-style loop + unstructured fp outliers + double-quantized qparams.

Parity target: LinearSpqrQuantizer
(/root/reference/mi_optimize/quantization/quantizer/SpqrQuantizer.py):
per-group leave-one-out outlier detection (:143-167), outlier mask kept fp
(:284-299), double quantization of scales/zeros at qq_scale_bits in qq_groups
(:253-273), average-bits accounting (:360-391).

Implemented in spqr_impl.py; this module registers the algorithm.
"""
from __future__ import annotations

from ..models.quant_linear import QuantizedLinear
from .base import BaseAlgo, register_algo


@register_algo("spqr")
class SpQRAlgo(BaseAlgo):
    stats = ("xtx",)

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        from .spqr_impl import spqr_quantize_linear

        return spqr_quantize_linear(self.cfg, lin, stats)
