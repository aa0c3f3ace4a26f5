"""Offline-runnable lm-eval tasks over the bundled corpora.

The reference registers ~190 remote-dataset tasks
(benchmark/lmeval/tasks/__init__.py:45-262); those need network. Here we
register the task *shapes* the harness exercises — multiple-choice (C-Eval /
CMMLU via loglikelihood over the four choice strings, the standard
hendrycks-style MC protocol) and rolling perplexity (wikitext) — over data
that resolves offline. Remote lm-eval task definitions can be added through
the same register_task hook when network/datasets are available.
"""
from __future__ import annotations

from typing import List

from ..datasets import mcqa as D
from .lmeval import MultipleChoiceTask, PerplexityTask, register_task


class _McqaBase(MultipleChoiceTask):
    bench = "ceval"
    subject_filter = "all"
    split = "val"

    def docs(self) -> List[dict]:
        docs = []
        for sub in D.get_subjects(self.bench, self.subject_filter):
            rows_fn = D._rows_ceval if self.bench == "ceval" else D._rows_cmmlu
            for r in rows_fn(sub, self.split):
                if str(r.get("answer", "")).strip().upper() in "ABCD" and r.get("question"):
                    docs.append(r)
        return docs

    def fewshot_context(self, doc, num_shot, rng):
        ctx = ""
        if num_shot:
            shots = D.get_questions(self.bench, subject=self.subject_filter,
                                    split=self.split, question=num_shot, answer=True)
            ctx = "\n\n".join(shots[:num_shot]) + "\n\n"
        return ctx + f"{doc['question']}\n答案："

    def choices(self, doc):
        return [doc[c] for c in "ABCD"]

    def gold(self, doc):
        return "ABCD".index(str(doc["answer"]).strip().upper())


@register_task("ceval_mc")
class CevalMC(_McqaBase):
    bench = "ceval"
    split = "val"


@register_task("cmmlu_mc")
class CmmluMC(_McqaBase):
    bench = "cmmlu"
    split = "test"


@register_task("wikitext")
class WikitextPPL(PerplexityTask):
    def docs(self):
        from ..datasets.calibration import _load_arrow_split, find_data_path

        path = find_data_path("wikitext")
        if path is None:
            return []
        ds = _load_arrow_split(path, "test")
        text = "\n\n".join(ds["text"])
        # split the corpus into paragraph docs like lm-eval's wikitext task
        return [{"text": t} for t in text.split("\n\n") if len(t) > 200][:64]


# ---------------------------------------------------------------------------
# standard harness tasks (HF datasets — resolved on demand; environments
# without network/caches simply get an empty doc list + a clear log line)
# ---------------------------------------------------------------------------

import logging

log = logging.getLogger(__name__)


def _hf_docs(path, name, split):
    try:
        from datasets import load_dataset

        return list(load_dataset(path, name, split=split))
    except Exception as e:  # offline / no cache
        log.warning("lm-eval task dataset %s unavailable (%s)", path, e)
        return []


class _HFMultipleChoice(MultipleChoiceTask):
    """Generic hendrycks-style MC task over a HF dataset."""

    path: str
    name = None
    split = "validation"

    def docs(self):
        return _hf_docs(self.path, self.name, self.split)

    def fewshot_context(self, doc, num_shot, rng):
        shots = ""
        if num_shot:
            docs = self.docs()
            idx = rng.choice(len(docs), size=min(num_shot, len(docs)), replace=False)
            shots = "\n\n".join(
                self.query(docs[i]) + " " + self.choices(docs[i])[self.gold(docs[i])]
                for i in idx
            ) + "\n\n"
        return shots + self.query(doc)

    def query(self, doc) -> str:
        raise NotImplementedError


@register_task("hellaswag")
class HellaSwag(_HFMultipleChoice):
    path = "hellaswag"

    def query(self, doc):
        return doc["ctx"]

    def choices(self, doc):
        return doc["endings"]

    def gold(self, doc):
        return int(doc["label"])


@register_task("piqa")
class PiQA(_HFMultipleChoice):
    path = "piqa"

    def query(self, doc):
        return f"Question: {doc['goal']}\nAnswer:"

    def choices(self, doc):
        return [doc["sol1"], doc["sol2"]]

    def gold(self, doc):
        return int(doc["label"])


@register_task("winogrande")
class Winogrande(_HFMultipleChoice):
    path = "winogrande"
    name = "winogrande_xl"

    def query(self, doc):
        return doc["sentence"].split("_")[0].strip()

    def choices(self, doc):
        tail = doc["sentence"].split("_")[1]
        return [doc["option1"] + tail, doc["option2"] + tail]

    def gold(self, doc):
        return int(doc["answer"]) - 1


@register_task("arc_easy")
class ArcEasy(_HFMultipleChoice):
    path = "ai2_arc"
    name = "ARC-Easy"
    split = "validation"

    def query(self, doc):
        return f"Question: {doc['question']}\nAnswer:"

    def choices(self, doc):
        return doc["choices"]["text"]

    def gold(self, doc):
        return doc["choices"]["label"].index(doc["answerKey"])


@register_task("arc_challenge")
class ArcChallenge(ArcEasy):
    name = "ARC-Challenge"


@register_task("boolq")
class BoolQ(_HFMultipleChoice):
    path = "super_glue"
    name = "boolq"

    def query(self, doc):
        return f"{doc['passage']}\nQuestion: {doc['question']}?\nAnswer:"

    def choices(self, doc):
        return ["no", "yes"]

    def gold(self, doc):
        return int(doc["label"])
