"""lm-eval-harness adapter: loglikelihood / rolling / greedy_until executors.

The reference vendors ~6k LoC of EleutherAI lm-eval (benchmark/lmeval/). Per
SURVEY.md §7.1.6 we instead implement the harness *interface* natively —
request types, length-sorted batched executors, Task/MultipleChoiceTask/
PerplexityTask result processing (base.py:170-277, lmeval.py:11-178) — and a
small registry of offline-runnable tasks; external lm-eval task definitions
plug in through the same three executor primitives.

Executor semantics mirrored from lmeval/lmeval.py:
  loglikelihood          length-sorted, full-vocab log_softmax, continuation
                         token gather + greedy-match flag (:11-69)
  loglikelihood_rolling  disjoint max_length windows over the full doc (:73-148)
  greedy_until           greedy decode w/ stop-sequence split (:151-178)
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets.tokenizer import encode_ids
from ..models import llama
from ..models.model import Model
from ..serving import generate

log = logging.getLogger(__name__)


class Reorderer:
    """Sort requests for batching, restore original order (lmeval/utils.py:38-61)."""

    def __init__(self, arr, sort_fn):
        self.size = len(arr)
        self.order = sorted(range(len(arr)), key=lambda i: sort_fn(arr[i]))
        self.arr = [arr[i] for i in self.order]

    def get_reordered(self):
        return self.arr

    def get_original(self, results):
        out = [None] * self.size
        for pos, i in enumerate(self.order):
            out[i] = results[pos]
        return out


@partial(jax.jit, static_argnames=("cfg", "fused"))
def _token_logprobs(params, cfg, ids, fused=True):
    logits = llama.forward(params, cfg, ids, fused=fused)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def _bucket(n, cap):
    b = 32
    while b < n:
        b *= 2
    return min(b, cap)


class LMEvalModel:
    """Our model behind the three lm-eval request primitives."""

    def __init__(self, model: Model, tokenizer, fused=True, max_length=2048):
        self.model = model
        self.tokenizer = tokenizer
        self.fused = fused
        self.max_length = min(max_length, model.config.max_seq_len)

    def _enc(self, text: str) -> List[int]:
        return list(encode_ids(self.tokenizer, text)[0])

    def _ll_tokens(self, ctx_tokens: List[int], cont_tokens: List[int]) -> Tuple[float, bool]:
        # reference feeds (ctx+cont)[-(max_length+1):][:-1] (lmeval.py:118) —
        # the final continuation token needs only its *predecessor's* logits
        ids = (ctx_tokens + cont_tokens)[-(self.max_length + 1):]
        nctx = len(ids) - len(cont_tokens)
        L = len(ids)
        inp = ids[:-1]
        B = _bucket(len(inp), self.max_length)
        padded = np.zeros((1, B), np.int64)
        padded[0, :len(inp)] = inp
        lp = np.asarray(_token_logprobs(self.model.params, self.model.config,
                                        jnp.asarray(padded), self.fused)[0])
        # logprob of token t given prefix ids[:t] lives at position t-1
        ll = 0.0
        greedy = True
        for t in range(nctx, L):
            ll += float(lp[t - 1, ids[t]])
            greedy &= int(np.argmax(lp[t - 1])) == ids[t]
        return ll, greedy

    # the reference hardcodes token id 2 as the empty-context / rolling-window
    # prefix (lmeval.py:18 `context_enc=[2]`, :101 `prefix_token=2`) — match it
    # for bit-parity; fall back to a real bos id only when 2 is out of range
    PREFIX_TOKEN = 2

    def _prefix_token(self) -> int:
        vocab = getattr(self.model.config, "vocab_size", None)
        if vocab is None or vocab > self.PREFIX_TOKEN:
            return self.PREFIX_TOKEN
        bos = getattr(self.tokenizer, "bos_token_id", None)
        return bos if bos is not None else 0

    def loglikelihood(self, requests: Sequence[Tuple[str, str]]):
        reorder = Reorderer(list(requests), lambda r: -len(r[0] + r[1]))
        out = []
        for ctx, cont in reorder.get_reordered():
            ctx_t = self._enc(ctx) if ctx else [self._prefix_token()]
            cont_t = self._enc(cont)
            out.append(self._ll_tokens(ctx_t, cont_t))
        return reorder.get_original(out)

    def _rolling_windows(self, toks: List[int]):
        """get_rolling_token_windows(context_len=1) + make_disjoint_window
        (reference lmeval.py:71-95): every token of the doc is scored exactly
        once, the first behind the reference's hardcoded prefix token (id 2,
        lmeval.py:101)."""
        prefix = self._prefix_token()
        max_len = self.max_length
        if not toks:
            return
        first = min(max_len, len(toks))
        yield [prefix], toks[:first]
        predicted = first
        while predicted < len(toks):
            wpl = min(len(toks) - predicted, max_len)
            end = predicted + wpl
            ctx_full = toks[max(0, end - max_len - 1): end - 1]
            yield ctx_full[: len(ctx_full) - (wpl - 1)], toks[end - wpl: end]
            predicted += wpl

    def loglikelihood_rolling(self, requests: Sequence[str]):
        out = []
        for text in requests:
            toks = self._enc(text)
            ll = 0.0
            for ctx, cont in self._rolling_windows(toks):
                ll += self._ll_tokens(ctx, cont)[0]
            out.append(ll)
        return out

    def greedy_until(self, requests: Sequence[Tuple[str, List[str]]], max_new_tokens=256):
        out = []
        for ctx, stops in requests:
            ids = encode_ids(self.tokenizer, ctx)[:, -(self.max_length - max_new_tokens):]
            gen = generate(self.model, ids, max_new_tokens=max_new_tokens,
                           temperature=0.0, fused=self.fused, max_len=self.max_length)
            text = self.tokenizer.decode(gen[0, ids.shape[1]:])
            for s in stops:
                text = text.split(s)[0]
            out.append(text)
        return out


# ---------------------------------------------------------------------------
# Task abstraction (base.py parity)
# ---------------------------------------------------------------------------

class Task:
    """Minimal lm-eval Task: docs -> requests -> per-doc metrics -> aggregate."""

    request_type = "loglikelihood"

    def docs(self) -> List[dict]:
        raise NotImplementedError

    def fewshot_context(self, doc, num_shot: int, rng) -> str:
        raise NotImplementedError

    def construct_requests(self, doc, ctx):
        raise NotImplementedError

    def process_results(self, doc, results) -> Dict[str, float]:
        raise NotImplementedError

    def aggregate(self, metrics: List[Dict[str, float]]) -> Dict[str, float]:
        keys = metrics[0].keys() if metrics else []
        return {k: float(np.mean([m[k] for m in metrics])) for k in keys}


class MultipleChoiceTask(Task):
    """acc + length-normalized acc_norm over choice loglikelihoods (base.py:170-201)."""

    def choices(self, doc) -> List[str]:
        raise NotImplementedError

    def gold(self, doc) -> int:
        raise NotImplementedError

    def construct_requests(self, doc, ctx):
        return [(ctx, " " + c) for c in self.choices(doc)]

    def process_results(self, doc, results):
        lls = [r[0] for r in results]
        gold = self.gold(doc)
        acc = 1.0 if int(np.argmax(lls)) == gold else 0.0
        norm = [ll / max(len(c), 1) for ll, c in zip(lls, self.choices(doc))]
        acc_norm = 1.0 if int(np.argmax(norm)) == gold else 0.0
        return {"acc": acc, "acc_norm": acc_norm}


class PerplexityTask(Task):
    """word_perplexity / byte_perplexity / bits_per_byte (base.py:204-277)."""

    request_type = "loglikelihood_rolling"

    def fewshot_context(self, doc, num_shot, rng):
        return ""

    def construct_requests(self, doc, ctx):
        return doc["text"]

    def process_results(self, doc, ll):
        words = max(len(doc["text"].split()), 1)
        nbytes = max(len(doc["text"].encode("utf-8")), 1)
        return {"word_nll": -ll / words, "byte_nll": -ll / nbytes}

    def aggregate(self, metrics):
        wn = float(np.mean([m["word_nll"] for m in metrics]))
        bn = float(np.mean([m["byte_nll"] for m in metrics]))
        return {
            "word_perplexity": float(np.exp(wn)),
            "byte_perplexity": float(np.exp(bn)),
            "bits_per_byte": bn / np.log(2),
        }


TASK_REGISTRY: Dict[str, Callable[[], Task]] = {}


def register_task(name):
    def deco(cls):
        TASK_REGISTRY[name] = cls
        return cls
    return deco


def expand_task_names(eval_tasks) -> List[str]:
    """Alias/bundle expansion with reference semantics
    (mi_optimize/datasets/load_lmeval.py:15-32, :72-108): 'anli' -> the three
    rounds, 'blimp' -> all 67 UIDs, 'arc' -> easy+challenge, and the
    'all_tasks_0s' / 'all_tasks_5s' / 'test_tasks' bundles (only when they
    are the sole entry, matching the reference's len==1 guard)."""
    from . import lmeval_tasks  # noqa: F401  (registry side-effect)

    tasks = [eval_tasks] if isinstance(eval_tasks, str) else list(eval_tasks)
    blimp = sorted(n for n in TASK_REGISTRY if n.startswith("blimp_"))
    crows = [n for n in TASK_REGISTRY if n.startswith("crows_pairs_")]
    shared = (["winogrande", "wsc273", "race", "anli_r1", "anli_r2", "anli_r3",
               "pubmedqa"],
              ["openbookqa", "arc_easy", "arc_challenge", "sciq", "swag",
               "piqa", "hellaswag"],
              ["glue_mnli", "glue_mnli_mismatched", "glue_rte", "glue_qnli",
               "glue_sst", "glue_wnli", "mathqa", "mc_taco", "mutual",
               "mutual_plus", "qa4mre_2011", "qa4mre_2012", "qa4mre_2013",
               "toxigen"])
    bundles = {
        "all_tasks_0s": shared[0] + shared[1] + crows + shared[2],
        "all_tasks_5s": shared[0] + blimp + shared[1] + shared[2]
                        + ["triviaqa"],
        "test_tasks": [],
    }
    if "anli" in tasks:
        tasks.remove("anli")
        tasks += ["anli_r1", "anli_r2", "anli_r3"]
    if "blimp" in tasks:
        tasks.remove("blimp")
        tasks += blimp
    if "arc" in tasks:
        tasks.remove("arc")
        tasks += ["arc_easy", "arc_challenge"]
    for bundle, expansion in bundles.items():
        if bundle in tasks and len(tasks) == 1:
            tasks = list(expansion)
    return tasks


def evaluate_tasks(model: Model, tokenizer, eval_tasks, num_shot=0, fused=True,
                   max_docs=None, seed=1234,
                   allow_empty=False) -> Dict[str, Dict[str, float]]:
    from . import lmeval_tasks  # noqa: F401  (registry side-effect)

    eval_tasks = expand_task_names(eval_tasks)
    lm = LMEvalModel(model, tokenizer, fused=fused)
    rng = np.random.default_rng(seed)
    results = {}
    for name in eval_tasks:
        if name not in TASK_REGISTRY:
            raise ValueError(f"unknown lm-eval task {name!r}; have {sorted(TASK_REGISTRY)}")
        task = TASK_REGISTRY[name]()
        docs = task.docs()
        if not docs:
            # never let a run "succeed" while evaluating nothing
            if not allow_empty:
                raise RuntimeError(
                    f"lm-eval task {name!r} produced 0 docs (dataset missing/"
                    "offline?); pass allow_empty=True to record n=0 instead")
            results[name] = {"n": 0}
            log.warning("lmeval[%s] had no docs — recorded n=0", name)
            continue
        if max_docs:
            docs = docs[:max_docs]
        metrics = []
        for doc in docs:
            ctx = task.fewshot_context(doc, num_shot, rng)
            reqs = task.construct_requests(doc, ctx)
            if task.request_type == "loglikelihood":
                res = lm.loglikelihood(reqs)
            elif task.request_type == "loglikelihood_rolling":
                res = lm.loglikelihood_rolling([reqs])[0]
            elif task.request_type == "mixed":
                # per-request typed dispatch (reference tasks like squad2 /
                # qasper mix greedy_until and loglikelihood in one doc)
                res = [lm.loglikelihood([payload])[0] if kind == "loglikelihood"
                       else lm.greedy_until([payload])[0]
                       for kind, payload in reqs]
            else:
                res = lm.greedy_until(reqs)
            metrics.append(task.process_results(doc, res))
        results[name] = dict(task.aggregate(metrics), n=len(metrics))
        log.info("lmeval[%s] = %s", name, results[name])
    return results
