"""Perplexity evaluation (token-weighted NLL → exp).

Parity target: Benchmark.compute_ppl
(/root/reference/mi_optimize/benchmark.py:20-37): per batch, token-mean loss ×
non-pad token count accumulated, ppl = exp(total_loss/total_count). The model
forward is jitted once per shape; batches stream host→device.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.model import Model


@partial(jax.jit, static_argnames=("cfg", "fused"))
def _batch_loss(params, cfg, input_ids, fused=True):
    logits = llama.forward(params, cfg, input_ids, fused=fused)
    return llama.causal_lm_loss(logits, input_ids)


def compute_ppl(model: Model, batches: Iterable[np.ndarray], fused: bool = True) -> float:
    total_loss = 0.0
    total_count = 0
    for b in batches:
        loss, count = _batch_loss(model.params, model.config, jnp.asarray(b), fused)
        c = int(count)
        total_loss += float(loss) * c
        total_count += c
    return float(np.exp(total_loss / max(total_count, 1)))
