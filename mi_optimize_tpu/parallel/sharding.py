"""Multi-chip sharding: mesh construction + NamedSharding rules for the model.

The reference has no distributed support at all (SURVEY.md §2.8); this layer is
the TPU-native scale-out story mandated by BASELINE.md: a ('data','model') mesh
where tensor parallelism follows the Megatron pattern —

    q/k/v/gate/up : column-parallel  (out-features on 'model')
    o/down        : row-parallel     (in-features on 'model'; XLA inserts the
                                      psum on the output under GSPMD)
    embed/lm_head : vocab on 'model'
    KV cache      : kv-heads on 'model', batch on 'data'

Packed int4/int8 weights shard on the same logical axes: the pack layout
(little-endian along in-features, core/packing.py) keeps 32-bit words and
quant groups aligned to shard cuts, so a row-parallel shard of `packed`
[N, K·b/32] cuts the second axis at multiples of (g·b/32) words — scales
[N, K/g] cut at the same group boundary.

Everything rides jax.sharding + GSPMD: annotate, jit, let XLA place the
collectives on ICI (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.quant_linear import QuantizedLinear

COL, ROW = "col", "row"

# tensor-parallel kind of each llama linear
LINEAR_KIND = {
    "q_proj": COL, "k_proj": COL, "v_proj": COL,
    "o_proj": ROW,
    "gate_proj": COL, "up_proj": COL,
    "down_proj": ROW,
    "lm_head": COL,
}


def make_mesh(
    n_model: int = 1,
    n_data: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = n_model * n_data
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _linear_pspecs(kind: str, lin: QuantizedLinear) -> QuantizedLinear:
    """A pytree of PartitionSpecs with the same structure as `lin`."""
    spec = lin.spec
    if kind == COL:
        w = P("model", None)
        packed = P(None, "model")  # words-major [K·b/32, N]: N is the out axis
        scale = P("model", None)
        bias = P("model")
        smooth = P()  # full in-features on every shard
    else:  # ROW
        w = P(None, "model")
        packed = P("model", None)  # shard the word-rows (in-features axis)
        # per-channel scales [out,1] replicate; per-group [out, K/g] shard on K
        scale = P(None, "model") if (spec.w_qtype == "per_group" and spec.w_groupsize > 0) else P(None, None)
        bias = P()  # bias added after the psum; replicated
        smooth = P("model")

    def keep(field, ps):
        return None if field is None else ps

    return lin.replace(
        weight=keep(lin.weight, w),
        packed=keep(lin.packed, packed),
        w_scale=keep(lin.w_scale, scale),
        w_zero=keep(lin.w_zero, scale),
        bias=keep(lin.bias, bias),
        smooth_factor=keep(lin.smooth_factor, smooth),
        a_scale=keep(lin.a_scale, P()),
        a_zero=keep(lin.a_zero, P()),
        perm=keep(lin.perm, P()),
    )


def params_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Build a PartitionSpec tree matching a llama params tree."""
    def for_block(blk):
        out = {}
        for name, v in blk.items():
            if isinstance(v, QuantizedLinear):
                out[name] = _linear_pspecs(LINEAR_KIND.get(name, COL), v)
            else:  # norm weights replicate
                out[name] = P()
        return out

    specs: Dict[str, Any] = {
        "embed": P(None, None),
        "layers": [for_block(b) for b in params["layers"]],
        "final_norm": P(),
    }
    if "lm_head" in params:
        specs["lm_head"] = _linear_pspecs(COL, params["lm_head"])
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the params tree with the TP sharding rules over `mesh`."""
    specs = params_pspecs(params)

    def put(p, s):
        if p is None:
            return None
        return jax.device_put(p, NamedSharding(mesh, s))

    return jax.tree.map(
        put, params, specs, is_leaf=lambda x: x is None
    )


def cache_pspec() -> P:
    """KV cache [B, T, kv_heads, head_dim]: batch on data, heads on model."""
    return P("data", None, "model", None)


def batch_pspec() -> P:
    return P("data", None)


def shard_model(model, mesh: Mesh):
    """Return the Model with its params device_put under the TP/DP rules.

    The serving entry points (prefill / decode_loop / generate) work unchanged
    on a sharded model: GSPMD propagates the NamedShardings through the jitted
    programs and places collectives on the mesh.
    """
    from ..models.model import Model

    return Model(config=model.config, params=shard_params(model.params, mesh),
                 family=model.family)
