"""Layer-streaming sequential calibration engine.

TPU-native re-design of the reference's per-arch sequential drivers
(llama_sequential, /root/reference/mi_optimize/quantization/models/llama_seq.py):

  reference (torch, mutable)               ours (JAX, functional)
  ------------------------------------     -----------------------------------
  Catcher raises ValueError to grab        jitted embed() — block-0 inputs are
  block-0 inputs (llama_seq.py:31-49)      just a function output
  forward hooks accumulate H / inputs      block_apply(capture=True) returns the
  (quantizer/utils.py:26-102)              activations; a jitted step reduces
                                           them into stats on device
  one block resident on GPU, .to()         params live on host (numpy); each
  ping-pong (llama_seq.py:65-158)          block is device_put for its turn,
                                           quantized, fetched back
  per-group order [kvq][o][up,gate][down]  same GROUP_ORDER; stats are shared
  (llama_seq.py:71-76)                     within a group (same input tensor)
  block_sequential flag: propagate         same flag; fp outputs computed from
  quantized vs fp outputs (:155-158)       the retained fp block pytree

Combo pipelines (AWQ+GPTQ, SmoothQuant+GPTQ — llama_seq.py:112-138) fold the
first algorithm's smooth factor into the weights, then run GPTQ on the smoothed
weights; see `ComboAlgo`.
"""
from __future__ import annotations

import logging
import re
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.llama import GROUP_ORDER, LlamaConfig
from .base import BaseAlgo, init_stats, update_stats_device, update_stats_host
from .config import QuantConfig

log = logging.getLogger(__name__)


def _selected(cfg: QuantConfig, path: str) -> bool:
    """Regex include/exclude selection of linears to quantize — parity with
    replace_module's filters (/root/reference/mi_optimize/quantization/
    utils.py:35-68); paths look like 'layers.3.q_proj' or 'lm_head'."""
    return bool(re.search(cfg.include, path)) and not re.search(cfg.exclude, path)


@partial(jax.jit, static_argnames=("cfg", "capture_name"))
def _stats_forward(blk, x, cos, sin, mask, cfg: LlamaConfig, capture_name: str):
    """Run one block forward, return the captured input of `capture_name`."""
    _, _, caps = llama.block_apply(blk, x, cos, sin, mask, cfg, capture=True, fused=False)
    return caps[capture_name]


@partial(jax.jit, static_argnames=("cfg",))
def _block_forward(blk, x, cos, sin, mask, cfg: LlamaConfig):
    out, _, _ = llama.block_apply(blk, x, cos, sin, mask, cfg, capture=False, fused=False)
    return out


def _collect_group_stats(blk, batches, cos, sin, mask, cfg, name, kinds, in_features):
    """Accumulate calibration stats for one linear-group input across batches."""
    if not kinds:
        return {}
    stats = init_stats(kinds, in_features)
    dev_kinds = tuple(k for k in kinds if k != "inputs")

    @partial(jax.jit, static_argnames=())
    def update(stats_dev, cap):
        return update_stats_device(dev_kinds, stats_dev, cap)

    stats_dev = {k: v for k, v in stats.items() if k != "inputs"}
    for x in batches:
        cap = _stats_forward(blk, jnp.asarray(x), cos, sin, mask, cfg, name)
        if dev_kinds:
            stats_dev = update(stats_dev, cap)
        stats = update_stats_host(kinds, stats, cap)
    stats.update(stats_dev)
    return stats


def quantize_blocks_dataless(
    params: Dict[str, Any],
    quant_cfg: QuantConfig,
    algo: BaseAlgo,
) -> Dict[str, Any]:
    """Quantize every block without calibration forwards (RTN/ZeroQuant/FP8
    weight-only dynamic configs need no stats)."""
    new_layers = []
    for i, fp_blk in enumerate(params["layers"]):
        blk = dict(fp_blk)
        for group in GROUP_ORDER:
            for name in group:
                if _selected(quant_cfg, f"layers.{i}.{name}"):
                    blk[name] = algo.quantize_linear(blk[name], {})
        new_layers.append(jax.device_get(blk))
    out = dict(params)
    out["layers"] = new_layers
    return out


def sequential_quantize(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    quant_cfg: QuantConfig,
    algo: BaseAlgo,
    calib_batches: List[np.ndarray],
    *,
    progress: bool = True,
    journal=None,
    offload_host: bool = True,
) -> Dict[str, Any]:
    """Quantize all transformer blocks layer-sequentially; returns new params.

    `journal` (export.checkpoint.CalibrationJournal) makes the pass resumable:
    completed blocks and the current ping-pong activations are persisted and
    skipped on restart — the mid-run crash-resumability the reference lacks
    (SURVEY.md §5.4).

    `offload_host=False` keeps quantized blocks and activations on device —
    use when the whole model fits HBM and host<->device transfers are slow.
    """
    seqlen = calib_batches[0].shape[-1]
    cos, sin = llama.rope_tables(cfg, jnp.arange(seqlen))
    mask = llama.causal_mask(seqlen)

    embed_fn = jax.jit(lambda ids: llama.embed(params, ids))
    def _off(a):
        return np.asarray(a) if offload_host else a
    xs = [_off(embed_fn(jnp.asarray(b))) for b in calib_batches]

    kinds = tuple(dict.fromkeys(tuple(algo.stats) + tuple(algo.act_stats())))
    new_layers = []
    resume_from = -1
    if journal is not None:
        resume_from = journal.last_completed()
        if resume_from >= 0:
            new_layers = [journal.load_block(i) for i in range(resume_from + 1)]
            saved = journal.load_acts()
            if saved is not None:
                xs = saved
            log.info("resuming calibration after block %d", resume_from)
    for i, fp_blk in enumerate(params["layers"]):
        if i <= resume_from:
            continue
        blk = {k: jax.device_put(v) for k, v in fp_blk.items()}
        if not quant_cfg.block_sequential:
            # fp propagation: next-block inputs from the unquantized block
            fp_outs = [_off(_block_forward(blk, jnp.asarray(x), cos, sin, mask, cfg))
                       for x in xs]

        for group in GROUP_ORDER:
            sel = [n for n in group if _selected(quant_cfg, f"layers.{i}.{n}")]
            if not sel:
                continue
            lead = group[0]
            in_features = blk[lead].in_features
            stats = _collect_group_stats(blk, xs, cos, sin, mask, cfg, lead, kinds, in_features)
            for name in sel:
                blk[name] = algo.quantize_linear(blk[name], stats)
            del stats

        if quant_cfg.block_sequential:
            outs = [_off(_block_forward(blk, jnp.asarray(x), cos, sin, mask, cfg))
                    for x in xs]
        else:
            outs = fp_outs
        xs = outs  # ping-pong (llama_seq.py:155-158)
        new_layers.append(jax.device_get(blk) if offload_host else blk)
        if journal is not None:
            journal.save_block(i, new_layers[-1], xs=xs)
        if progress:
            log.info("quantized block %d/%d", i + 1, len(params["layers"]))

    out_params = dict(params)
    out_params["layers"] = new_layers
    return out_params


# ---------------------------------------------------------------------------
# generic (non-sequential) driver — parity with quant_other_model
# (/root/reference/mi_optimize/quantization/models/quant_other_model.py:12-88):
# wrap ALL linears at once, run full-model calibration forwards, quantize each.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def _full_forward_captures(params, cfg: LlamaConfig, ids):
    """One full-model forward returning per-block capture dicts."""
    B, S = ids.shape
    x = llama.embed(params, ids)
    cos, sin = llama.rope_tables(cfg, jnp.arange(S))
    mask = llama.causal_mask(S)
    all_caps = []
    for blk in params["layers"]:
        x, _, caps = llama.block_apply(blk, x, cos, sin, mask, cfg, capture=True, fused=False)
        all_caps.append({g[0]: caps[g[0]] for g in GROUP_ORDER})
    return all_caps


def full_model_quantize(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    quant_cfg: QuantConfig,
    algo: BaseAlgo,
    calib_batches: List[np.ndarray],
) -> Dict[str, Any]:
    """Non-layer-sequential calibration: stats for every linear from full-model
    forwards with ORIGINAL fp weights throughout, then quantize everything."""
    kinds = tuple(dict.fromkeys(tuple(algo.stats) + tuple(algo.act_stats())))
    dev_kinds = tuple(k for k in kinds if k != "inputs")
    nlayers = len(params["layers"])
    leads = [g[0] for g in GROUP_ORDER]

    stats = [
        {lead: init_stats(kinds, params["layers"][i][lead].in_features) for lead in leads}
        for i in range(nlayers)
    ]

    @partial(jax.jit, static_argnames=())
    def update_all(dev_stats, all_caps):
        return [
            {lead: update_stats_device(dev_kinds, dev_stats[i][lead], all_caps[i][lead])
             for lead in leads}
            for i in range(nlayers)
        ]

    dev_stats = [
        {lead: {k: v for k, v in stats[i][lead].items() if k != "inputs"} for lead in leads}
        for i in range(nlayers)
    ]
    for b in calib_batches:
        all_caps = _full_forward_captures(params, cfg, jnp.asarray(b))
        if dev_kinds:
            dev_stats = update_all(dev_stats, all_caps)
        if "inputs" in kinds:
            for i in range(nlayers):
                for lead in leads:
                    stats[i][lead] = update_stats_host(kinds, stats[i][lead], all_caps[i][lead])
    for i in range(nlayers):
        for lead in leads:
            stats[i][lead].update(dev_stats[i][lead])

    new_layers = []
    for i, fp_blk in enumerate(params["layers"]):
        blk = dict(fp_blk)
        for group in GROUP_ORDER:
            for name in group:
                if _selected(quant_cfg, f"layers.{i}.{name}"):
                    blk[name] = algo.quantize_linear(blk[name], stats[i][group[0]])
        new_layers.append(jax.device_get(blk))
    out = dict(params)
    out["layers"] = new_layers
    return out
