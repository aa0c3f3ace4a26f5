"""Model bundle: (family, config, params) — the unit the public API passes around."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

from .llama import LlamaConfig


@dataclasses.dataclass
class Model:
    """A loaded model: immutable config + params pytree.

    `family` selects the sequential-calibration driver, mirroring the
    reference's dispatch on model.config.model_type
    (/root/reference/mi_optimize/quantization/quantize.py:24-35).
    """

    config: Any
    params: Dict[str, Any]
    family: str = "llama"

    @classmethod
    def tiny_llama(cls, key=None, **kw):
        import jax

        cfg = LlamaConfig.tiny(**kw)
        key = jax.random.PRNGKey(0) if key is None else key
        from .llama import init_params

        return cls(config=cfg, params=init_params(cfg, key), family="llama")
