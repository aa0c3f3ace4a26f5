"""SmoothQuant: activation-outlier migration via per-channel smoothing.

Parity target: LinearSmoothQuantizer
(/root/reference/mi_optimize/quantization/quantizer/SmoothQuantizer.py):
  * act scale  = per-in-feature max |x| over the calibration set (:35-39)
  * smooth     = (act^alpha / colmax|W|^(1-alpha)).clamp(1e-5)  (:41-46)
  * weight     = absmax symmetric fake-quant of W*smooth, per
                 group/channel/tensor (:48-74) — scale = absmax/(2^(b-1)-1)
  * runtime    = x / smooth, then dynamic per-token/per-tensor absmax act
                 fake-quant (:142-163); optional quant_out
The absmax grid is identical to our symmetric signed grid (scale = absmax/127
for int8, zero = 0), so the generic qparams engine reproduces it bit-exactly.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import qparams
from ..models.quant_linear import QuantizedLinear
from .base import BaseAlgo, register_algo
from .common import build_quantized_linear


def smooth_scales(w: jnp.ndarray, act_absmax: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """s_j = act_absmax_j^alpha / max_i|W_ij|^(1-alpha), clamped at 1e-5."""
    w_colmax = jnp.clip(jnp.abs(w).max(axis=0), 1e-5, None)
    s = jnp.power(act_absmax, alpha) / jnp.power(w_colmax, 1.0 - alpha)
    return jnp.clip(s, 1e-5, None)


def absmax_fake_quant_weight(w, bits, qtype, groupsize):
    """Symmetric signed absmax fake-quant (reference's quantize_weight_*_absmax)."""
    return qparams.quantize_dequantize(
        w, bits, qtype, groupsize, symmetric=True, unsigned=False
    )


@register_algo("smoothquant")
@register_algo("smooth")
class SmoothQuantAlgo(BaseAlgo):
    stats = ("absmax",)

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        cfg = self.cfg
        w = lin.weight.astype(jnp.float32)
        smooth = None
        if cfg.quantize_acts:
            smooth = smooth_scales(w, stats["absmax"], cfg.alpha)
            w = w * smooth

        if cfg.quantize_weights:
            fake_w, scale, zero = absmax_fake_quant_weight(
                w, cfg.wbit.bits, cfg.w_qtype, cfg.w_groupsize
            )
        else:
            fake_w, scale, zero = w, None, None

        out = build_quantized_linear(
            lin, cfg, fake_w, scale, zero, smooth_factor=smooth,
        ) if cfg.quantize_weights else lin.replace(weight=fake_w, smooth_factor=smooth)
        # activations: dynamic absmax == symmetric signed dynamic quant
        spec = out.spec.replace(
            abit=cfg.abit.bits if cfg.quantize_acts else None,
            a_qtype=cfg.a_qtype,
            a_symmetric=True,
            a_unsigned=False,
            a_dynamic=True,
            quant_out=cfg.quant_out,
        )
        return out.replace(spec=spec)
