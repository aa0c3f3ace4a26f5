"""FP8 (software-emulated E4M3 / E5M2) weight + activation quantization.

Parity target: LinearFP8Quantizer
(/root/reference/mi_optimize/quantization/quantizer/FP8Quantizer.py):
  * E4M3: bound 240 (2^7·1.875), flush |v|<=2^-10 to 0, subnormal exponent
    floor at -6, 3-bit mantissa (round to 1/8)  (:17-32)
  * E5M2: bound 57344 (2^15·1.75), flush <=2^-17, exponent floor -14, 2-bit
    mantissa (round to 1/4)  (:34-49)
  * weights: per-out-channel scale S = bound/absmax(row) (E4M3) or
    absmax(row)/bound (E5M2 — the reference's own convention, mirrored)
  * activations: per-tensor scale from the *running max* (reference uses
    torch.max(x), i.e. max not absmax — mirrored), computed at forward time.

Note: TPU v5e has no hardware FP8 matmul; like the reference this is
fake-quant — the value grid is FP8, the matmul runs in bf16/fp32 on the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.quant_linear import QuantizedLinear
from .base import BaseAlgo, register_algo

E4M3_BOUND = 240.0      # 2^7 * 1.875
E5M2_BOUND = 57344.0    # 2^15 * 1.75


def _fp8_grid(ab: jnp.ndarray, fmt: str) -> jnp.ndarray:
    """Round |values| (already scaled into fp8 range) onto the fp8 grid."""
    if fmt == "e4m3":
        top, flush, emin, mant = E4M3_BOUND, 2.0 ** -10, -6.0, 8.0
    elif fmt == "e5m2":
        top, flush, emin, mant = E5M2_BOUND, 2.0 ** -17, -14.0, 4.0
    else:
        raise ValueError(f"fp8 format must be e4m3|e5m2, got {fmt}")
    ab = jnp.where(ab > top, top, ab)
    ab = jnp.where(ab <= flush, 0.0, ab)
    safe = jnp.where(ab > 0, ab, 1.0)
    E = jnp.where(ab < 2.0 ** emin, emin, jnp.floor(jnp.log2(safe)))
    M = jnp.round(ab * jnp.exp2(-E) * mant) / mant
    return M * jnp.exp2(E)


def fp8_quantize_value(x: jnp.ndarray, scale: jnp.ndarray, fmt: str) -> jnp.ndarray:
    """Fake-quantize x with pre-scaling S: dequant(round_fp8(|x|*S))·sign/S."""
    xf = x.astype(jnp.float32)
    sign = jnp.sign(xf)
    q = _fp8_grid(jnp.abs(xf) * scale, fmt) * sign / scale
    # reference keeps nan/inf/zero inputs untouched (:31)
    keep = jnp.isnan(xf) | jnp.isinf(xf) | (xf == 0.0)
    return jnp.where(keep, xf, q).astype(x.dtype)


def fp8_fake_quant(x: jnp.ndarray, fmt: str, per_tensor: bool = True) -> jnp.ndarray:
    """Dynamic per-tensor activation fake-quant (jittable, runs in the forward)."""
    amax = jnp.max(x.astype(jnp.float32))  # reference uses max, not absmax (:74)
    if fmt == "e4m3":
        scale = E4M3_BOUND / jnp.where(amax == 0, 1.0, amax)
    else:
        scale = jnp.where(amax == 0, 1.0, amax) / E5M2_BOUND
    return fp8_quantize_value(x, scale, fmt)


@register_algo("fp8")
class FP8Algo(BaseAlgo):
    stats = ()

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        cfg = self.cfg
        fmt = cfg.fp8_format.lower()
        w = lin.weight.astype(jnp.float32)
        absmax = jnp.clip(jnp.abs(w).max(axis=-1, keepdims=True), 1e-12, None)
        scale = (E4M3_BOUND / absmax) if fmt == "e4m3" else (absmax / E5M2_BOUND)
        fake_w = fp8_quantize_value(w, scale, fmt)
        spec = lin.spec.replace(
            wbit=8, abit=8 if cfg.quantize_acts else None, fp8_format=fmt,
            w_packed=False, a_dynamic=True,
        )
        if cfg.pack:
            # store NATIVE float8: the reference's emulated grid (M·2^E with
            # the per-format exponent floor/flush rules) is exactly the fp8
            # value set, so fake_w·scale casts losslessly — 1 byte/weight in
            # HBM (the reference keeps fp16 fake weights; ours is 2-4x
            # smaller). Dequant divides the cast-back values by scale.
            f8 = jnp.float8_e4m3fn if fmt == "e4m3" else jnp.float8_e5m2
            stored = (fake_w * scale).astype(f8)
            return lin.replace(weight=stored, spec=spec,
                               w_scale=scale, w_zero=jnp.zeros_like(scale))
        return lin.replace(
            weight=fake_w.astype(lin.weight.dtype), spec=spec,
            w_scale=scale, w_zero=jnp.zeros_like(scale),
        )
