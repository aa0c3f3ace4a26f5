"""Shared helpers for building quantized `QuantizedLinear` pytrees."""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core import packing, qparams
from ..core.qparams import qrange
from ..models.quant_linear import QuantSpec, QuantizedLinear
from .config import QuantConfig
from .base import finalize_hessian  # noqa: F401  (re-export convenience)


def make_weight_spec(cfg: QuantConfig, packed: bool) -> QuantSpec:
    return QuantSpec(
        wbit=cfg.wbit.bits if cfg.quantize_weights else None,
        abit=cfg.abit.bits if cfg.quantize_acts else None,
        w_qtype=cfg.w_qtype,
        a_qtype=cfg.a_qtype,
        w_groupsize=cfg.w_groupsize,
        a_groupsize=cfg.a_groupsize,
        w_symmetric=not cfg.w_has_zero,
        a_symmetric=not cfg.a_has_zero,
        w_unsigned=cfg.w_unsign,
        a_unsigned=cfg.a_unsign,
        a_dynamic=cfg.quantization_type == "dynamic",
        w_packed=packed,
    )


def build_quantized_linear(
    lin: QuantizedLinear,
    cfg: QuantConfig,
    fake_w: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    *,
    w_qtype: Optional[str] = None,
    w_groupsize: Optional[int] = None,
    w_symmetric: Optional[bool] = None,
    smooth_factor: Optional[jnp.ndarray] = None,
    a_scale=None,
    a_zero=None,
    pack_ok: bool = True,
) -> QuantizedLinear:
    """Assemble the quantized linear: packed ints when cfg.pack, else fake-quant.

    Packing reconstructs the int grid from the fake-quant weights exactly like
    the reference packers (round(fake_w/scale + zero),
    /root/reference/mi_optimize/export/qnn.py:191) — the export-consistency
    tests assert dequant(pack(...)) == fake_w bit-exactly.
    """
    spec = make_weight_spec(cfg, packed=cfg.pack and pack_ok)
    if w_qtype is not None:
        spec = spec.replace(w_qtype=w_qtype)
    if w_groupsize is not None:
        spec = spec.replace(w_groupsize=w_groupsize)
    if w_symmetric is not None:
        # algorithms whose grid symmetry is NOT cfg.w_has_zero (GPTQ-family
        # uses w_qscheme) must say so, or downstream routing that keys on
        # spec.w_symmetric (e.g. the native-int8 path) mis-handles the zeros
        spec = spec.replace(w_symmetric=w_symmetric)
    if smooth_factor is not None:
        smooth_factor = smooth_factor.astype(jnp.float32)

    if spec.w_packed and spec.wbit is not None:
        rng = qrange(spec.wbit, spec.w_unsigned)
        ints = qparams.quantize_to_int(
            fake_w, w_scale, w_zero, spec.wbit, spec.w_qtype, spec.w_groupsize, spec.w_unsigned
        )
        if 32 % spec.wbit == 0:
            # pack on device — avoids a host round-trip of the full int grid
            packed = packing.pack_weight_device(ints, spec.wbit, rng)
        else:
            packed = jnp.asarray(packing.pack_weight(np.asarray(ints), spec.wbit, rng))
        weight = None
    else:
        packed = None
        weight = fake_w.astype(lin.weight.dtype if lin.weight is not None else jnp.float32)

    return QuantizedLinear(
        spec=spec,
        out_features=lin.out_features,
        in_features=lin.in_features,
        weight=weight,
        packed=packed,
        w_scale=jnp.asarray(w_scale, jnp.float32),
        w_zero=jnp.asarray(w_zero, jnp.float32),
        bias=lin.bias,
        smooth_factor=smooth_factor,
        a_scale=a_scale,
        a_zero=a_zero,
    )


def static_act_params(cfg: QuantConfig, stats: Dict[str, Any]):
    """Per-tensor static activation qparams from calibration min/max.

    Parity: RTNQuantizer.quantize activation branch (RTNQuantizer.py:47-57) —
    but from streamed min/max stats instead of concatenated padded inputs
    (identical result for per-tensor granularity, without the memory blowup).
    """
    if not (cfg.quantize_acts and cfg.quantization_type == "static"):
        return None, None
    if cfg.a_qtype != "per_tensor":
        return None, None  # reference: only per_tensor supports static
    rng = qrange(cfg.abit.bits, cfg.a_unsign)
    scale, zero = qparams.find_qparams(
        stats["min"], stats["max"], rng, symmetric=not cfg.a_has_zero
    )
    return scale, zero
