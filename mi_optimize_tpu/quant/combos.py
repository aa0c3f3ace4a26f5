"""Composed pipelines: AWQ+GPTQ and SmoothQuant+GPTQ.

Parity target: the reference composes these at the driver level
(/root/reference/mi_optimize/quantization/models/llama_seq.py:98-138): both
quantizers' hooks observe the SAME calibration forwards (so GPTQ's Hessian is
accumulated on *unsmoothed* inputs), the first algorithm produces a smooth
factor which is folded into the weights, GPTQ quantizes the smoothed weights,
and the runtime path divides activations by the smooth factor (plus, for
SQ+GPTQ, SmoothQuant's dynamic activation quant).

Deviation (documented): the reference's awq+gptq leg aliases core.weight while
applying AWQ's scale, smoothing the weight twice before GPTQ
(AWQQuantizer.apply_scale mutates in place, then llama_seq.py:116 multiplies
again). We implement the intended single-smoothing pipeline:
smooth → clip → GPTQ.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.quant_linear import QuantizedLinear
from .base import BaseAlgo, register_algo
from .common import build_quantized_linear
from .gptq import gptq_quantize_matrix
from .base import finalize_hessian


def _gptq_on(cfg, lin, W_smoothed, stats, smooth):
    H = finalize_hessian(stats)
    groupsize = cfg.w_groupsize
    Q, scales, zeros, perm = gptq_quantize_matrix(
        W_smoothed, H,
        bits=cfg.wbit.bits,
        blocksize=min(cfg.blocksize, lin.in_features),
        groupsize=groupsize,
        actorder=cfg.actorder,
        symmetric=cfg.w_qscheme == "symmetric",
        percdamp=cfg.percdamp,
    )
    w_qtype = "per_group" if groupsize > 0 else "per_channel"
    if groupsize > 0 and cfg.actorder and cfg.pack:
        out = build_quantized_linear(
            lin, cfg, Q[:, perm], scales, zeros, w_qtype=w_qtype,
            w_symmetric=cfg.w_qscheme == "symmetric", smooth_factor=smooth,
        )
        if out.packed is not None:
            return out.replace(perm=perm)
    pack_ok = groupsize <= 0 or not cfg.actorder
    return build_quantized_linear(
        lin, cfg, Q, scales, zeros, w_qtype=w_qtype, pack_ok=pack_ok,
        w_symmetric=cfg.w_qscheme == "symmetric", smooth_factor=smooth,
    )


@register_algo("awq+gptq")
class AWQGPTQAlgo(BaseAlgo):
    stats = ("inputs", "absmean", "xtx")

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        import numpy as np
        from .awq_impl import auto_clip_search, auto_scale_search

        cfg = self.cfg
        if not cfg.quantize_weights:
            return lin
        n_bit = cfg.wbit.bits
        groupsize = cfg.w_groupsize if cfg.w_groupsize > 0 else 128
        w = lin.weight.astype(jnp.float32)
        x = jnp.asarray(np.concatenate(stats["inputs"], axis=0), jnp.float32)
        x_mean_abs = stats["abssum"] / jnp.maximum(stats["ntokens"], 1.0)
        smooth = auto_scale_search(
            w, x, x_mean_abs, n_bit=n_bit, groupsize=groupsize,
            zero_point=True, n_grid=cfg.n_grid,
        )
        Q = w * smooth[None, :]
        clip = auto_clip_search(
            Q, (x / smooth[None, :])[:1], n_bit=n_bit, groupsize=groupsize,
            zero_point=True, n_grid=cfg.n_grid, max_shrink=cfg.max_shrink,
        )
        oc, ci = Q.shape
        ng = ci // groupsize
        Qc = jnp.clip(Q.reshape(oc, ng, groupsize), -clip[:, :, None], clip[:, :, None])
        return _gptq_on(self.cfg, lin, Qc.reshape(oc, ci), stats, smooth)


@register_algo("smoothquant+gptq")
class SmoothGPTQAlgo(BaseAlgo):
    stats = ("absmax", "xtx")

    def quantize_linear(self, lin: QuantizedLinear, stats) -> QuantizedLinear:
        from .smoothquant import smooth_scales

        cfg = self.cfg
        if not cfg.quantize_weights:
            return lin
        w = lin.weight.astype(jnp.float32)
        smooth = smooth_scales(w, stats["absmax"], cfg.alpha)
        out = _gptq_on(cfg, lin, w * smooth[None, :], stats, smooth)
        # SmoothQuant's runtime activation quant rides along (SmoothQuantizer
        # forward :142-163): dynamic absmax per_tensor/per_token, signed sym.
        if cfg.quantize_acts:
            out = out.replace(spec=out.spec.replace(
                abit=cfg.abit.bits, a_qtype=cfg.a_qtype,
                a_symmetric=True, a_unsigned=False, a_dynamic=True,
            ))
        return out
