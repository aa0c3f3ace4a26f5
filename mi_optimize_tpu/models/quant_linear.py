"""QuantizedLinear: the single linear abstraction every model layer goes through.

Role parity: the reference routes every nn.Linear through a mutable
`LinearQuantHub` wrapper (hooks + registered quantizer objects,
/root/reference/mi_optimize/quantization/__init__.py:83-141) and swaps in a
packed `QLinear` module at export (/root/reference/mi_optimize/export/qnn.py:27).
Here both roles collapse into one immutable pytree: a `QuantizedLinear` holds
either fp weights, fake-quantized weights, or packed int weights + qparams, and
`quant_linear_apply` selects the compute path from its static `QuantSpec` —
selected by config, not module mutation (SURVEY.md §7.1 step 2).

Runtime semantics mirrored from the reference's quantizer forwards
(RTNQuantizer.py:63-86, qnn.py:123-157):
    x  -> x / smooth_factor          (AWQ / SmoothQuant)
       -> fake-quant activations     (static scale or dynamic per-token/tensor)
       -> x @ dequant(W)^T + bias    (packed path: fused dequant-matmul)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core import packing, qparams
from ..core.qparams import qrange


@struct.dataclass
class QuantSpec:
    """Static quantization metadata for one linear layer (hashable)."""

    wbit: Optional[int] = None          # None => fp weights
    abit: Optional[int] = None          # None => fp activations
    w_qtype: str = "per_channel"
    a_qtype: str = "per_tensor"
    w_groupsize: int = -1
    a_groupsize: int = -1
    w_symmetric: bool = True            # reference: has_zero=False
    a_symmetric: bool = True
    w_unsigned: bool = True
    a_unsigned: bool = True
    a_dynamic: bool = True              # dynamic vs static activation quant
    w_packed: bool = False              # weights stored packed-int vs fake-quant fp
    fp8_format: Optional[str] = None    # 'e4m3' | 'e5m2' (FP8 algorithm)
    quant_out: bool = False             # SmoothQuant quant_out: fake-quant y too


@struct.dataclass
class QuantizedLinear:
    """Parameters of one (possibly quantized) linear: y = x W^T + b."""

    spec: QuantSpec = struct.field(pytree_node=False)
    out_features: int = struct.field(pytree_node=False)
    in_features: int = struct.field(pytree_node=False)
    weight: Optional[jax.Array] = None        # fp or fake-quant [out, in]
    packed: Optional[jax.Array] = None        # uint32 [in*wbit/32, out] words-major
    w_scale: Optional[jax.Array] = None
    w_zero: Optional[jax.Array] = None
    bias: Optional[jax.Array] = None
    smooth_factor: Optional[jax.Array] = None  # [in]; x /= smooth at runtime
    a_scale: Optional[jax.Array] = None        # static activation qparams
    a_zero: Optional[jax.Array] = None
    # GPTQ act-order: weights/scales stored in permuted in-feature order; the
    # runtime gathers x columns by `perm` (g_idx-free grouped act-order packing)
    perm: Optional[jax.Array] = None

    @classmethod
    def fp(cls, weight, bias=None):
        return cls(
            spec=QuantSpec(),
            out_features=weight.shape[0],
            in_features=weight.shape[1],
            weight=weight,
            bias=bias,
        )


def dequant_weight(q: QuantizedLinear) -> jnp.ndarray:
    """Materialize the effective fp weight matrix [out, in].

    Reference parity: QLinear.forward's unpack→(w-zero)*scale
    (/root/reference/mi_optimize/export/qnn.py:123-135). Used by the jnp
    reference path and tests; the Pallas kernel fuses this into the matmul.
    """
    s = q.spec
    if q.packed is None:
        if s.fp8_format is not None and q.weight.dtype in (jnp.float8_e4m3fn,
                                                           jnp.float8_e5m2):
            # native-fp8 storage: values were scaled into fp8 range by w_scale
            return q.weight.astype(jnp.float32) / q.w_scale
        return q.weight
    rng = qrange(s.wbit, s.w_unsigned)
    w_int = packing.unpack_weight(q.packed, s.wbit, rng, q.in_features).astype(jnp.float32)
    if s.w_qtype == "per_group" and s.w_groupsize > 0:
        wg = w_int.reshape(-1, s.w_groupsize)
        w = (wg - q.w_zero.reshape(-1, 1)) * q.w_scale.reshape(-1, 1)
        w = w.reshape(q.out_features, q.in_features)
    elif s.w_qtype == "per_channel":
        w = (w_int - q.w_zero.reshape(-1, 1)) * q.w_scale.reshape(-1, 1)
    else:
        w = (w_int - jnp.reshape(q.w_zero, ())) * jnp.reshape(q.w_scale, ())
    if q.perm is not None:
        w = w[:, jnp.argsort(q.perm)]  # back to natural in-feature order
    return w


def _quant_activations(q: QuantizedLinear, x: jnp.ndarray) -> jnp.ndarray:
    s = q.spec
    if s.abit is None:
        return x
    if s.fp8_format is not None:
        from ..quant.fp8 import fp8_fake_quant  # local import: avoid cycle
        return fp8_fake_quant(x, s.fp8_format, per_tensor=True)
    if s.a_dynamic:
        dq, _, _ = qparams.quantize_dequantize(
            x, s.abit, s.a_qtype, s.a_groupsize, s.a_symmetric, s.a_unsigned
        )
        return dq
    rng = qrange(s.abit, s.a_unsigned)
    qx = qparams.quantize(x, q.a_scale, q.a_zero, rng)
    return qparams.dequantize(qx, q.a_scale, q.a_zero).astype(x.dtype)


def quant_linear_apply(q: QuantizedLinear, x: jnp.ndarray, *, fused: bool = True) -> jnp.ndarray:
    """Apply y = act_quant(x / smooth) @ W_eff^T + b.

    `fused=True` routes packed int4/int8 weights through the Pallas
    dequant-matmul kernel on TPU; otherwise (CPU tests, odd shapes) the jnp
    reference path dequantizes then matmuls — numerically identical.
    """
    in_dtype = x.dtype
    if q.smooth_factor is not None:
        x = x / q.smooth_factor.astype(x.dtype)

    s = q.spec
    if q.perm is not None and q.packed is not None and fused:
        # act-order packed path: gather x into the permuted domain once (cheap
        # for decode) so the packed weights' contiguous groups line up
        x = jnp.take(x, q.perm, axis=-1)
    if q.packed is not None and fused:
        from ..ops.int8_matmul import supports_native_int8, w8a8_matmul
        if supports_native_int8(s):
            # W8A8: integers stay integer through the MXU (int8xint8->int32) —
            # faster AND exact vs the reference's dequant+fp-GEMM fake path
            y = w8a8_matmul(x, q)
            if q.bias is not None:
                y = y + q.bias
            return y.astype(in_dtype)
        import os as _os

        import numpy as _np

        from ..ops.w4a8_matmul import supports_w4a8, w4a8_matmul
        if (supports_w4a8(s) and int(_np.prod(x.shape[:-1])) >= 32
                and _os.environ.get("MI_W4A8_INT") == "1"):
            # W4A8 int-dot path, OPT-IN: measured on v5e (BENCH_DETAILS.md r2)
            # the per-group int8 sub-dots are ~26% SLOWER than the fused f32
            # dequant kernel at prefill shapes (fragmented [M,g]x[g,TN] dots
            # vs one full-tile dot), and prefill already runs at the measured
            # bf16 compute roofline — so the numerically-equivalent fake-quant
            # route below stays the default (it is also what the reference's
            # fake-quant semantics specify).
            y = w4a8_matmul(x, q)
            if q.bias is not None:
                y = y + q.bias
            return y.astype(in_dtype)

    x = _quant_activations(q, x)
    if q.packed is not None and fused and s.wbit in (2, 4, 8):
        from ..ops.dequant_matmul import dequant_matmul  # lazy: pallas import
        y = dequant_matmul(x, q)
    else:
        w = dequant_weight(q)
        y = jax.lax.dot_general(
            x.astype(jnp.float32) if q.packed is not None else x,
            w.astype(x.dtype) if q.packed is None else w,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if q.bias is not None:
        y = y + q.bias
    if s.quant_out and s.abit is not None:
        # SmoothQuant's optional output quantization (SmoothQuantizer.py:158-160)
        dq, _, _ = qparams.quantize_dequantize(
            y, s.abit, s.a_qtype, s.a_groupsize, s.a_symmetric, s.a_unsigned
        )
        y = dq
    return y.astype(in_dtype)
