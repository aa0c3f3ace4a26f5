"""Public quantize() entry point — dtype normalization, calibration data, dispatch.

Parity: /root/reference/mi_optimize/quantization/quantize.py:6-37 — normalize
wbit/abit, build the calibration loader from quant_config['calibrate_config'],
dispatch on model family to a sequential driver, pass through unquantized when
both widths are > 8 bits.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Union

import numpy as np

from ..models.model import Model
from .base import get_algo
from .calibrate import sequential_quantize
from .config import QuantConfig

log = logging.getLogger(__name__)

# families that use the llama-shaped sequential driver (block list + GROUP_ORDER)
_SEQUENTIAL_FAMILIES = ("llama", "qwen2", "baichuan", "mistral", "chatglm")


def quantize(
    model: Model,
    quant_config: Union[QuantConfig, Dict[str, Any], str],
    calib_data: Optional[List[np.ndarray]] = None,
    tokenizer=None,
    journal=None,
) -> Model:
    """Quantize `model` according to `quant_config`.

    quant_config may be a QuantConfig, a (possibly reference-style nested)
    dict, or a path to a YAML file. `calib_data` is a list of token-id arrays
    [batch, seqlen]; if omitted it is built from quant_config.calibrate via the
    datasets layer (requires `tokenizer` for text datasets).
    """
    if isinstance(quant_config, str):
        cfg = QuantConfig.from_yaml(quant_config)
    elif isinstance(quant_config, dict):
        cfg = QuantConfig.from_dict(quant_config)
    else:
        cfg = quant_config

    if not cfg.quantize_weights and not cfg.quantize_acts:
        log.info("wbit and abit are both high-precision; model passes through")
        return model

    if calib_data is None:
        needs_data = cfg.quantization_type == "static" or get_algo(cfg.algo, cfg).stats
        if needs_data:
            from ..datasets.calibration import get_calibrate_loader

            calib_data = get_calibrate_loader(tokenizer, cfg.calibrate)
        else:
            calib_data = []

    algo = get_algo(cfg.algo, cfg)
    log.info("quantizing family=%s algo=%s w=%s a=%s", model.family, cfg.algo,
             cfg.wbit.name, cfg.abit.name)

    if model.family not in _SEQUENTIAL_FAMILIES:
        raise NotImplementedError(f"family {model.family} not yet supported")
    if not calib_data:
        # algorithms with no stats (RTN weight-only dynamic) still walk the
        # sequential driver, but with no forward passes needed
        from .calibrate import quantize_blocks_dataless

        params = quantize_blocks_dataless(model.params, cfg, algo)
    elif cfg.layer_sequential:
        params = sequential_quantize(model.params, model.config, cfg, algo, calib_data,
                                     journal=journal)
    else:
        # generic full-model driver (quant_other_model parity)
        from .calibrate import full_model_quantize

        params = full_model_quantize(model.params, model.config, cfg, algo, calib_data)

    return Model(config=model.config, params=params, family=model.family)
