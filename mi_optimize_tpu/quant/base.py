"""Quantizer-algorithm interface + calibration statistics reducers.

The reference attaches stateful quantizer objects and forward hooks to each
linear (BaseQuantizer + track_*_hook, quantizer/{base,utils}.py). TPU-native
equivalent: each algorithm is a pure transformation

    quantize_linear(lin: QuantizedLinear, stats) -> QuantizedLinear

and the *stats* are produced functionally by on-device reducers over the
activations that `block_apply(capture=True)` returns (SURVEY.md §7.3.4).

Reducer semantics (parity with quantizer/utils.py hooks):
  xtx      running sum of X^T X (fp32) + batch count.  GPTQ's running
           renormalization (track_hessian_hook :40-72) telescopes to
           H = (2/n)·ΣX^TX, so a plain sum is bit-equivalent and
           associative — it shards over sequence/data with a psum.
  minmax   global activation min/max (RTN static per-tensor act quant).
  absmax   per-in-feature running max |x| (SmoothQuant act scales :35-39).
  inputs   host-side sample of raw input tokens (AWQ grid-search loss).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.quant_linear import QuantizedLinear
from .config import QuantConfig

# ---------------------------------------------------------------------------
# stat reducers
# ---------------------------------------------------------------------------

MAX_INPUT_SAMPLE_TOKENS = 8192  # cap for the host-side 'inputs' sample


def init_stats(kinds: Tuple[str, ...], in_features: int) -> Dict[str, Any]:
    s: Dict[str, Any] = {}
    if "xtx" in kinds:
        s["xtx"] = jnp.zeros((in_features, in_features), jnp.float32)
        s["nsamples"] = jnp.zeros((), jnp.int32)
    if "minmax" in kinds:
        s["min"] = jnp.asarray(jnp.inf, jnp.float32)
        s["max"] = jnp.asarray(-jnp.inf, jnp.float32)
    if "absmax" in kinds:
        s["absmax"] = jnp.zeros((in_features,), jnp.float32)
    if "absmean" in kinds:
        s["abssum"] = jnp.zeros((in_features,), jnp.float32)
        s["ntokens"] = jnp.zeros((), jnp.float32)
    if "inputs" in kinds:
        s["inputs"] = []  # host-side list of np arrays [tokens, in_features]
    return s


def update_stats_device(kinds, stats, x: jnp.ndarray):
    """Jittable part of the reduction; x is the captured activation [B,S,F]."""
    out = dict(stats)
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    if "xtx" in kinds:
        out["xtx"] = stats["xtx"] + xf.T @ xf
        out["nsamples"] = stats["nsamples"] + x.shape[0]
    if "minmax" in kinds:
        out["min"] = jnp.minimum(stats["min"], xf.min())
        out["max"] = jnp.maximum(stats["max"], xf.max())
    if "absmax" in kinds:
        out["absmax"] = jnp.maximum(stats["absmax"], jnp.abs(xf).max(axis=0))
    if "absmean" in kinds:
        out["abssum"] = stats["abssum"] + jnp.abs(xf).sum(axis=0)
        out["ntokens"] = stats["ntokens"] + xf.shape[0]
    return out


def update_stats_host(kinds, stats, x: jnp.ndarray):
    """Host-side part (raw input sampling) — not jitted."""
    if "inputs" in kinds:
        have = sum(a.shape[0] for a in stats["inputs"])
        room = MAX_INPUT_SAMPLE_TOKENS - have
        if room > 0:
            arr = np.asarray(x, dtype=np.float32).reshape(-1, x.shape[-1])
            stats["inputs"].append(arr[:room])
    return stats


def finalize_hessian(stats) -> jnp.ndarray:
    """H = (2/nbatches)·ΣX^TX — closed form of the reference's running update."""
    n = jnp.maximum(stats["nsamples"].astype(jnp.float32), 1.0)
    return stats["xtx"] * (2.0 / n)


# ---------------------------------------------------------------------------
# algorithm base + registry
# ---------------------------------------------------------------------------

class BaseAlgo:
    """One PTQ algorithm. Subclasses declare needed stats and transform linears."""

    # reducer kinds needed for weight quantization
    stats: Tuple[str, ...] = ()

    def __init__(self, cfg: QuantConfig):
        self.cfg = cfg

    def act_stats(self) -> Tuple[str, ...]:
        """Extra reducers needed for static activation quantization."""
        c = self.cfg
        if c.quantize_acts and c.quantization_type == "static":
            return ("minmax",)
        return ()

    def quantize_linear(self, lin: QuantizedLinear, stats: Dict[str, Any]) -> QuantizedLinear:
        raise NotImplementedError


_REGISTRY: Dict[str, type] = {}


def register_algo(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get_algo(name: str, cfg: QuantConfig) -> BaseAlgo:
    # registrations live in the algorithm modules; import side-effect
    from . import rtn, gptq, awq, smoothquant, zeroquant, fp8, spqr, quip, combos  # noqa: F401
    if name not in _REGISTRY:
        raise ValueError(f"unknown algo {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg)
