"""Serving-time graph optimization: fuse QKV and gate/up projections.

Decode on TPU is launch-count- and tile-shape-sensitive: three [4096,4096]-ish
matmuls that share an input fuse into one [12288,4096] matmul — one kernel
launch, a 3x larger N tile for the fused dequant-matmul, and one HBM sweep of
the activations instead of three. Calibration keeps the per-projection
granularity (reference group structure), fusion happens afterwards.

Fusion requirements (checked per block):
  * same compute path (all packed with identical QuantSpec, or all fp)
  * same in_features (they share the input by construction)
  * compatible smooth factors (all None, or numerically identical — AWQ/SQ
    learn per-projection factors, which forbids fusion)
Packed concat is trivial by layout: words-major packed [K·b/32, N] and logical
scales [N, ngroups] both concatenate along the N axis.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..models.model import Model
from ..models.quant_linear import QuantizedLinear

log = logging.getLogger(__name__)


def _can_fuse(lins) -> bool:
    specs = {l.spec for l in lins}
    if len(specs) != 1:
        return False
    if len({l.in_features for l in lins}) != 1:
        return False
    smooths = [l.smooth_factor for l in lins]
    if any(s is not None for s in smooths):
        if any(s is None for s in smooths):
            return False
        s0 = np.asarray(smooths[0])
        if not all(np.allclose(s0, np.asarray(s)) for s in smooths[1:]):
            return False
    if any(l.a_scale is not None for l in lins):
        return False  # static act qparams are per-projection
    if any(l.perm is not None for l in lins):
        return False  # act-order permutations are per-projection
    biases = [l.bias is not None for l in lins]
    if len(set(biases)) != 1:
        return False
    return True


def _fuse(lins) -> Optional[QuantizedLinear]:
    if not _can_fuse(lins):
        return None
    l0 = lins[0]
    out_features = sum(l.out_features for l in lins)

    def cat(field, axis):
        vals = [getattr(l, field) for l in lins]
        if vals[0] is None:
            return None
        return jnp.concatenate(vals, axis=axis)

    return QuantizedLinear(
        spec=l0.spec,
        out_features=out_features,
        in_features=l0.in_features,
        weight=cat("weight", 0),
        packed=cat("packed", 1),     # words-major: N is axis 1
        w_scale=cat("w_scale", 0) if l0.w_scale is not None else None,
        w_zero=cat("w_zero", 0) if l0.w_zero is not None else None,
        bias=cat("bias", 0),
        smooth_factor=l0.smooth_factor,
    )


def fuse_for_serving(model: Model) -> Model:
    """Return a model with per-block fused qkv_proj / gateup_proj linears.

    When a block additionally satisfies the decode-megakernel contract
    (ops/block_fused.py: packed int4/int8, aligned shapes), kernel-layout
    scale/zero arrays are precomputed into blk["mega"] and llama.block_apply
    runs the whole block as ONE Pallas launch per decode step.
    """
    from ..ops.block_fused import block_mega_supported, prepare_block

    new_layers = []
    n_fused = n_mega = 0
    for blk in model.params["layers"]:
        nb = dict(blk)
        qkv = _fuse([blk["q_proj"], blk["k_proj"], blk["v_proj"]])
        if qkv is not None:
            nb["qkv_proj"] = qkv
            del nb["q_proj"], nb["k_proj"], nb["v_proj"]
            n_fused += 1
        gu = _fuse([blk["gate_proj"], blk["up_proj"]])
        if gu is not None:
            nb["gateup_proj"] = gu
            del nb["gate_proj"], nb["up_proj"]
        if block_mega_supported(nb, model.config):
            nb["mega"] = prepare_block(nb, model.config)
            n_mega += 1
        new_layers.append(nb)
    log.info("fused qkv in %d/%d blocks; megakernel in %d", n_fused,
             len(new_layers), n_mega)
    params = dict(model.params)
    params["layers"] = new_layers
    return Model(config=model.config, params=params, family=model.family)
