"""QuIP: incoherence-processed quantization with LDL rounding.

Parity target: QuIPQuantizer
(/root/reference/mi_optimize/quantization/quantizer/QuIPQuantizer.py):
diagonal rescale by (diagH/diagW^2)^(1/4) (:91-107), random orthogonal
butterfly transforms U·W·V^T from prime-factor Kronecker blocks (:29-85),
LDL-based rounding (:225-341), qfn 'b' scale 2.4·rms(w) (:360), inverse
postprocessing (:141-159). The reference's scipy special_ortho_group is
replaced by QR-of-Gaussian orthogonal blocks in JAX (SURVEY.md §7.3.5).

Implemented in quip_impl.py; this module registers the algorithm.
"""
from __future__ import annotations

from ..models.quant_linear import QuantizedLinear
from .base import BaseAlgo, register_algo


@register_algo("quip")
class QuIPAlgo(BaseAlgo):
    stats = ("xtx",)

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        from .quip_impl import quip_quantize_linear

        return quip_quantize_linear(self.cfg, lin, stats)
