"""ZeroQuant: per-group absmax weights + per-token dynamic activations.

Parity target: LinearZeroquantQuantizer
(/root/reference/mi_optimize/quantization/quantizer/ZeroQuantQuantizer.py:13-61):
calibration-free; weights absmax-symmetric per group of `w_groupsize` (default
128), activations per-token absmax at forward time. Both map onto the generic
symmetric-signed grid (scale = absmax/(2^(b-1)-1), zero = 0).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import qparams
from ..models.quant_linear import QuantizedLinear
from .base import BaseAlgo, register_algo
from .common import build_quantized_linear


@register_algo("zeroquant")
class ZeroQuantAlgo(BaseAlgo):
    stats = ()

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        cfg = self.cfg
        groupsize = cfg.w_groupsize if cfg.w_groupsize > 0 else 128
        if cfg.quantize_weights:
            fake_w, scale, zero = qparams.quantize_dequantize(
                lin.weight.astype(jnp.float32), cfg.wbit.bits, "per_group",
                groupsize, symmetric=True, unsigned=False,
            )
            out = build_quantized_linear(
                lin, cfg, fake_w, scale, zero, w_qtype="per_group", w_groupsize=groupsize
            )
        else:
            out = lin
        spec = out.spec.replace(
            abit=cfg.abit.bits if cfg.quantize_acts else None,
            a_qtype="per_token",
            a_symmetric=True,
            a_unsigned=False,
            a_dynamic=True,
        )
        return out.replace(spec=spec)
