"""Native W8A8 matmul: int8×int8 on the MXU with per-token/per-channel rescale.

The reference's W8A8 (SmoothQuant / ZeroQuant) is fake-quant — it dequantizes
to fp16 and runs an fp GEMM (SmoothQuantizer.py:142-163). TPU MXUs execute
int8×int8→int32 natively at 2x the bf16 rate, so here the quantized values
*stay integer* through the dot:

    y = (x_int8 @ w_int8^T) · s_x ⊗ s_w

Exactness: int32 accumulation of int8 products is lossless (K ≤ 2^17), unlike
the fp accumulation of the fake-quant path — this is numerically *better* than
the reference while being faster.

Applicability (auto-detected by quant_linear_apply): packed 8-bit symmetric
weights with per_channel/per_tensor scales, dynamic symmetric signed
activation quant (per_token/per_tensor) — exactly SmoothQuant's and
ZeroQuant-per-channel's serving configuration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import packing
from ..core.qparams import qrange


def supports_native_int8(spec) -> bool:
    return (
        spec.wbit == 8
        and spec.w_symmetric
        and spec.w_qtype in ("per_channel", "per_tensor")
        and spec.abit == 8
        and spec.a_dynamic
        and spec.a_symmetric
        and not spec.a_unsigned
        and spec.a_qtype in ("per_token", "per_tensor")
        and spec.fp8_format is None
        and not spec.quant_out
    )


def w8a8_matmul(x: jnp.ndarray, qlin) -> jnp.ndarray:
    """y[..., N] = int8(x) @ int8(W)^T rescaled; replaces act-fakequant+matmul."""
    s = qlin.spec
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)

    # dynamic symmetric activation quantization (absmax grid, scale=absmax/127)
    if s.a_qtype == "per_token":
        amax = jnp.clip(jnp.abs(x2).max(axis=-1, keepdims=True), 1e-12, None)
    else:
        amax = jnp.clip(jnp.abs(x2).max(), 1e-12, None).reshape(1, 1)
    sx = amax / 127.0
    xi = jnp.clip(jnp.round(x2 / sx), -128, 127).astype(jnp.int8)

    rng = qrange(8, s.w_unsigned)
    wi = packing.unpack_weight(qlin.packed, 8, rng, K)
    # symmetric grid: stored = q - qmin; recover signed int8 values exactly
    zero = qlin.w_zero.reshape(-1, 1) if qlin.w_zero.ndim else jnp.reshape(qlin.w_zero, (1, 1))
    wi8 = (wi - zero.astype(jnp.int32)).astype(jnp.int8)  # zero is integral (sym)

    acc = jax.lax.dot_general(
        xi, wi8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    sw = jnp.reshape(qlin.w_scale, (1, -1)) if qlin.w_scale.size > 1 else jnp.reshape(qlin.w_scale, (1, 1))
    y = acc.astype(jnp.float32) * sx * sw
    return y.reshape(*lead, qlin.out_features).astype(x.dtype)
