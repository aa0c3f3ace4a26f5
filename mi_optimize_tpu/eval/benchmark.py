"""Benchmark facade — the evaluation entry point (parity with the reference's
`Benchmark` class, /root/reference/mi_optimize/benchmark.py:15-255).

Families:
  eval_ppl       wikitext2 / ptb / c4 perplexity (token-weighted NLL -> exp)
  eval_ceval     C-Eval MCQA, 0/5-shot, ABCD-logit argmax protocol
  eval_cmmlu     CMMLU MCQA, same protocol
  eval_boss      BOSS OOD suite (QA/SA/NLI/Toxic) via generation + metrics
  eval_lmeval    lm-eval-harness adapter (loglikelihood / rolling / greedy)
  eval_latency   forward latency percentiles + decode tokens/s vs roofline
"""
from __future__ import annotations

import logging
from typing import Dict, Iterable, List, Optional

import numpy as np

from ..models.model import Model
from .ppl import compute_ppl

log = logging.getLogger(__name__)


class Benchmark:
    def __init__(self, fused: bool = True):
        self.fused = fused

    # ---------------- perplexity (benchmark.py:20-72) ----------------
    def eval_wiki2_ppl(self, model: Model, tokenizer, seqlen=2048, nsamples=40):
        from ..datasets.calibration import get_wikitext2

        batches = get_wikitext2(tokenizer, split="test", nsamples=nsamples, seqlen=seqlen)
        return compute_ppl(model, batches, fused=self.fused)

    def eval_ptb_ppl(self, model: Model, tokenizer, seqlen=2048, nsamples=None):
        from ..datasets.calibration import get_ptb

        batches = get_ptb(tokenizer, split="test", seqlen=seqlen)
        if nsamples:
            batches = batches[:nsamples]
        return compute_ppl(model, batches, fused=self.fused)

    def eval_c4_ppl(self, model: Model, tokenizer, seqlen=2048, nsamples=40):
        from ..datasets.calibration import get_c4

        batches = get_c4(tokenizer, nsamples=nsamples, seqlen=seqlen)
        return compute_ppl(model, batches, fused=self.fused)

    def eval_ppl(self, model: Model, tokenizer, test_dataset="wikitext2", **kw) -> Dict[str, float]:
        names = test_dataset.split(",") if isinstance(test_dataset, str) else test_dataset
        out = {}
        for name in names:
            fn = {"wikitext2": self.eval_wiki2_ppl, "ptb": self.eval_ptb_ppl,
                  "c4": self.eval_c4_ppl}[name]
            out[name] = fn(model, tokenizer, **kw)
            log.info("ppl[%s] = %.4f", name, out[name])
        return out

    # ---------------- MCQA (benchmark.py:74-171) ----------------
    def eval_ceval(self, model: Model, tokenizer, model_type="llama", subject="all",
                   num_shot=0, **kw):
        from .mcqa import eval_ceval

        return eval_ceval(model, tokenizer, subject=subject, num_shot=num_shot,
                          fused=self.fused, **kw)

    def eval_cmmlu(self, model: Model, tokenizer, model_type="llama", subject="all",
                   num_shot=0, **kw):
        from .mcqa import eval_cmmlu

        return eval_cmmlu(model, tokenizer, subject=subject, num_shot=num_shot,
                          fused=self.fused, **kw)

    # ---------------- BOSS (benchmark.py:173-208) ----------------
    def eval_boss(self, model: Model, tokenizer, test_dataset="QuestionAnswering_advqa",
                  split="test", ICL_split="test", num_shot=0, **kw):
        from .boss import eval_boss

        return eval_boss(model, tokenizer, test_dataset=test_dataset, split=split,
                         num_shot=num_shot, fused=self.fused, **kw)

    # ---------------- lm-eval adapter (benchmark.py:210-255) ----------------
    def eval_lmeval(self, model: Model, tokenizer, eval_tasks, num_shot=0, **kw):
        from .lmeval import evaluate_tasks

        return evaluate_tasks(model, tokenizer, eval_tasks, num_shot=num_shot,
                              fused=self.fused, **kw)

    # ---------------- latency / throughput ----------------
    def eval_latency(self, model: Model, batch=1, seqlen=128, **kw):
        from .latency import decode_throughput, forward_latency

        return {
            "forward": forward_latency(model, batch=batch, seqlen=seqlen, fused=self.fused),
            "decode": decode_throughput(model, batch=batch, fused=self.fused, **kw),
        }
