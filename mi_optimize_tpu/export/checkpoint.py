"""Checkpoint: save/load quantized models (packed ints + qparams + manifest).

Fills the role of the reference's torch.save of the whole pickled module tree
(/root/reference/examples/quantize.py:24, SURVEY.md §5.4) — but as a typed,
inspectable format: one .npz of named arrays + a JSON manifest carrying the
model config and every linear's static QuantSpec. Restartable and
framework-version-independent (no pickled code).

Also provides the per-block calibration journal that gives the long
quantization pass crash-resumability the reference lacks (a crash at block
30/32 loses everything there).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ..models.llama import LlamaConfig
from ..models.model import Model
from ..models.quant_linear import QuantSpec, QuantizedLinear

_ARRAY_FIELDS = ("weight", "packed", "w_scale", "w_zero", "bias", "smooth_factor",
                 "a_scale", "a_zero", "perm")


def _lin_manifest(lin: QuantizedLinear) -> Dict[str, Any]:
    return {
        "kind": "quant_linear",
        "spec": dataclasses.asdict(lin.spec),
        "out_features": lin.out_features,
        "in_features": lin.in_features,
        "fields": [f for f in _ARRAY_FIELDS if getattr(lin, f) is not None],
    }


def save_model(model: Model, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {
        "format_version": 1,
        "family": model.family,
        "config": dataclasses.asdict(model.config),
        "tree": {},
    }

    def put(key: str, node):
        if isinstance(node, QuantizedLinear):
            manifest["tree"][key] = _lin_manifest(node)
            for f in _ARRAY_FIELDS:
                v = getattr(node, f)
                if v is not None:
                    arrays[f"{key}.{f}"] = np.asarray(v)
        else:
            manifest["tree"][key] = {"kind": "array"}
            arrays[key] = np.asarray(node)

    put("embed", model.params["embed"])
    put("final_norm", model.params["final_norm"])
    if "lm_head" in model.params:
        put("lm_head", model.params["lm_head"])
    manifest["num_layers"] = len(model.params["layers"])
    for i, blk in enumerate(model.params["layers"]):
        for name, node in blk.items():
            put(f"layers.{i}.{name}", node)

    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def _load_lin(key: str, meta: Dict, arrays) -> QuantizedLinear:
    import jax.numpy as jnp

    spec = QuantSpec(**meta["spec"])
    kw = {}
    for f in _ARRAY_FIELDS:
        kw[f] = jnp.asarray(arrays[f"{key}.{f}"]) if f in meta["fields"] else None
    return QuantizedLinear(
        spec=spec, out_features=meta["out_features"], in_features=meta["in_features"], **kw
    )


def load_model(path: str) -> Model:
    import jax.numpy as jnp

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    arrays = np.load(os.path.join(path, "arrays.npz"))
    tree = manifest["tree"]

    def get(key):
        meta = tree[key]
        if meta["kind"] == "quant_linear":
            return _load_lin(key, meta, arrays)
        return jnp.asarray(arrays[key])

    params: Dict[str, Any] = {
        "embed": get("embed"),
        "final_norm": get("final_norm"),
        "layers": [],
    }
    if "lm_head" in tree:
        params["lm_head"] = get("lm_head")
    for i in range(manifest["num_layers"]):
        blk = {}
        prefix = f"layers.{i}."
        for key, meta in tree.items():
            if key.startswith(prefix) and key.count(".") == 2:
                blk[key[len(prefix):]] = get(key)
        params["layers"].append(blk)

    cfg = LlamaConfig(**manifest["config"])
    return Model(config=cfg, params=params, family=manifest["family"])


# ---------------------------------------------------------------------------
# calibration journal: per-block resumability
# ---------------------------------------------------------------------------

class CalibrationJournal:
    """Persists quantized blocks + activations as calibration proceeds, so an
    interrupted layer-sequential pass resumes at the last finished block."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _blk_path(self, i: int) -> str:
        return os.path.join(self.path, f"block_{i:04d}.npz")

    def last_completed(self) -> int:
        done = -1
        while os.path.exists(self._blk_path(done + 1)):
            done += 1
        return done

    def save_block(self, i: int, blk: Dict[str, Any], xs=None) -> None:
        arrays: Dict[str, np.ndarray] = {}
        meta: Dict[str, Any] = {}
        for name, node in blk.items():
            if isinstance(node, QuantizedLinear):
                meta[name] = _lin_manifest(node)
                for f in meta[name]["fields"]:
                    arrays[f"{name}.{f}"] = np.asarray(getattr(node, f))
            else:
                meta[name] = {"kind": "array"}
                arrays[name] = np.asarray(node)
        tmp = self._blk_path(i).replace(".npz", ".tmp.npz")
        np.savez(tmp, __meta__=json.dumps(meta), **arrays)
        os.replace(tmp, self._blk_path(i))
        if xs is not None:
            np.savez(os.path.join(self.path, "acts.npz"),
                     **{f"x{j}": np.asarray(x) for j, x in enumerate(xs)})

    def load_block(self, i: int) -> Dict[str, Any]:
        import jax.numpy as jnp

        data = np.load(self._blk_path(i), allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        blk: Dict[str, Any] = {}
        for name, m in meta.items():
            if m["kind"] == "quant_linear":
                blk[name] = _load_lin(name, m, data)
            else:
                blk[name] = jnp.asarray(data[name])
        return blk

    def load_acts(self):
        p = os.path.join(self.path, "acts.npz")
        if not os.path.exists(p):
            return None
        data = np.load(p)
        return [data[f"x{j}"] for j in range(len(data.files))]


# ---------------------------------------------------------------------------
# post-hoc packing: fake-quant model -> packed-kernel model
# ---------------------------------------------------------------------------

def export_packed(model: Model) -> Model:
    """Convert fake-quant linears to packed-int linears (in-place of pytree).

    Role of the reference's export_module swap
    (/root/reference/mi_optimize/export/utils.py:8-22): only grid-faithful
    algorithms pack (RTN/GPTQ/AWQ/SmoothQuant/ZeroQuant); SpQR (fp outliers)
    and QuIP/FP8 (no integer grid + qparams) stay fake-quant, exactly like the
    reference's QLinear support matrix.
    """
    import jax.numpy as jnp

    from ..core import packing, qparams
    from ..core.qparams import qrange

    def pack_lin(lin):
        if not isinstance(lin, QuantizedLinear):
            return lin
        s = lin.spec
        if (lin.packed is not None or lin.weight is None or s.wbit is None
                or lin.w_scale is None or s.fp8_format is not None):
            return lin
        if s.wbit not in (2, 4, 8):
            return lin
        # verify grid-faithfulness: dequant(int(w)) must reproduce fake_w
        ints = qparams.quantize_to_int(
            lin.weight.astype(jnp.float32), lin.w_scale, lin.w_zero,
            s.wbit, s.w_qtype, s.w_groupsize, s.w_unsigned,
        )
        if s.w_qtype == "per_group" and s.w_groupsize > 0:
            deq = (ints.reshape(-1, s.w_groupsize).astype(jnp.float32)
                   - lin.w_zero.reshape(-1, 1)) * lin.w_scale.reshape(-1, 1)
            deq = deq.reshape(lin.out_features, lin.in_features)
        elif s.w_qtype == "per_channel":
            deq = (ints.astype(jnp.float32) - lin.w_zero.reshape(-1, 1)) * lin.w_scale.reshape(-1, 1)
        else:
            deq = (ints.astype(jnp.float32) - jnp.reshape(lin.w_zero, ())) * jnp.reshape(lin.w_scale, ())
        if not bool(jnp.allclose(deq, lin.weight.astype(jnp.float32), rtol=1e-4, atol=1e-5)):
            return lin  # not on the grid (e.g. SpQR outliers) — keep fake
        rng = qrange(s.wbit, s.w_unsigned)
        packed = packing.pack_weight_device(ints, s.wbit, rng)
        return lin.replace(weight=None, packed=packed,
                           spec=s.replace(w_packed=True))

    new_layers = []
    for blk in model.params["layers"]:
        new_layers.append({k: pack_lin(v) for k, v in blk.items()})
    params = dict(model.params)
    params["layers"] = new_layers
    if "lm_head" in params:
        params["lm_head"] = pack_lin(params["lm_head"])
    return Model(config=model.config, params=params, family=model.family)
