"""Generation-task protocols, metrics, and offline dataset builders."""
import json

import numpy as np
import pytest

from mi_optimize_tpu.datasets import lmdatasets
from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer
from mi_optimize_tpu.eval.lmeval import TASK_REGISTRY, evaluate_tasks
from mi_optimize_tpu.eval import lmeval_tasks  # noqa: F401  registry side-effect
from mi_optimize_tpu.eval.lmeval_gen_tasks import (
    CoQA, DROP, GSM8K, TriviaQA, drop_metrics, gsm8k_extract,
)
from mi_optimize_tpu.models.model import Model


def test_registry_breadth():
    assert len(TASK_REGISTRY) >= 120
    gen = {n for n, c in TASK_REGISTRY.items()
           if getattr(c, "request_type", "") == "greedy_until"}
    assert {"coqa", "drop", "gsm8k"} <= gen
    assert sum(n.startswith("blimp_") for n in TASK_REGISTRY) == 67
    assert sum(n.startswith("crows_pairs_") for n in TASK_REGISTRY) == 22


# ---------------------------------------------------------------------------
# metric golden values (reference tasks/drop.py, coqa.py, gsm8k.py semantics)
# ---------------------------------------------------------------------------

def test_drop_metrics_golden():
    # exact match after normalization (articles/punct/case/float form)
    em, f1 = drop_metrics("The Eagles.", ("eagles",))
    assert em == 1.0 and f1 == 1.0
    # numbers must match for a bag to score at all
    em, f1 = drop_metrics("12 points", ("15 points",))
    assert em == 0.0 and f1 == 0.0
    # number normalization: 12 == 12.0
    em, f1 = drop_metrics("12.0", ("12",))
    assert em == 1.0 and f1 == 1.0
    # multi-span gold aligned 1-1 against a single pred span
    em, f1 = drop_metrics("Smith", ("Smith", "Jones"))
    assert em == 0.0 and 0.0 < f1 < 1.0


def test_coqa_multi_answer_scores():
    # single gold: plain max; squad normalization strips articles -> exact
    em, f1 = CoQA._scores(["white house"], "the white house")
    assert em == 1.0 and f1 == 1.0
    # token overlap only -> partial F1
    em, f1 = CoQA._scores(["white house"], "big white house")
    assert em == 0.0 and 0.6 < f1 < 1.0
    # multiple golds: leave-one-out average (coqa.py:106-117)
    em, f1 = CoQA._scores(["yes", "yeah"], "yes")
    assert em == 0.5 and f1 == 0.5


def test_gsm8k_extraction():
    assert gsm8k_extract("blah blah #### 1,234") == "1234"
    assert gsm8k_extract("no marker") == "[invalid]"


def test_coqa_conversation_prompt():
    doc = {
        "story": "S.",
        "questions": {"input_text": ["q1", "q2"]},
        "answers": {"input_text": ["a1", "a2"]},
    }
    ctx = CoQA().fewshot_context(doc, 0, None)
    assert ctx == "S.\n\nQ: q1\n\nA: a1\n\nQ: q2\n\nA:"
    assert CoQA().construct_requests(doc, ctx) == [(ctx, ["\nQ:"])]


def test_triviaqa_prefix_dedup():
    assert TriviaQA._remove_prefixes(["abc", "ab", "xyz"]) == ["ab", "xyz"]


# ---------------------------------------------------------------------------
# offline builders parse the official raw formats
# ---------------------------------------------------------------------------

def _with_data_dir(tmp_path, monkeypatch, task, fname, payload, text=False):
    d = tmp_path / "lmeval" / task
    d.mkdir(parents=True)
    p = d / fname
    p.write_text(payload if text else json.dumps(payload), encoding="utf-8")
    monkeypatch.setenv("MI_TPU_DATA_DIR", str(tmp_path))


def test_offline_coqa_builder(tmp_path, monkeypatch):
    raw = {"data": [{
        "id": "x", "source": "s", "story": "Once.",
        "questions": [{"input_text": "Who?", "turn_id": 1}],
        "answers": [{"input_text": "Bob", "turn_id": 1,
                     "span_start": 0, "span_end": 3, "span_text": "Bob"}],
        "additional_answers": {"0": [{"input_text": "Bobby", "turn_id": 1,
                                      "span_start": 0, "span_end": 3,
                                      "span_text": "Bob"}]},
    }]}
    _with_data_dir(tmp_path, monkeypatch, "coqa", "coqa-dev-v1.0.json", raw)
    docs = lmdatasets.load_docs("coqa")
    assert docs[0]["story"] == "Once."
    assert CoQA._answers(docs[0]) == ["Bob", "Bobby"]


def test_offline_drop_builder(tmp_path, monkeypatch):
    raw = {"sec1": {"passage": "P.", "qa_pairs": [{
        "question": "How many?", "query_id": "q1",
        "answer": {"number": "3", "date": {}, "spans": []},
        "validated_answers": [{"number": "", "date": {}, "spans": ["three"]}],
    }]}}
    _with_data_dir(tmp_path, monkeypatch, "drop", "drop_dataset_dev.json", raw)
    task = DROP()
    docs = task.docs()
    assert docs[0]["answers"] == [("3",), ("three",)]
    assert task.fewshot_context(docs[0], 0, None) == \
        "Passage: P.\nQuestion: How many?\nAnswer:"


def test_offline_triviaqa_builder(tmp_path, monkeypatch):
    raw = {"Data": [{"QuestionId": "1", "Question": "Q?", "QuestionSource": "",
                     "Answer": {"Aliases": ["A", "An answer"], "Value": "A"},
                     "SearchResults": []}]}
    _with_data_dir(tmp_path, monkeypatch, "triviaqa", "unfiltered-web-dev.json", raw)
    docs = lmdatasets.load_docs("triviaqa")
    assert docs[0]["answer"]["aliases"] == ["A", "An answer"]


def test_offline_gsm8k_builder(tmp_path, monkeypatch):
    lines = "\n".join(json.dumps({"question": f"q{i}", "answer": f"#### {i}"})
                      for i in range(3))
    _with_data_dir(tmp_path, monkeypatch, "gsm8k", "test.jsonl", lines, text=True)
    docs = lmdatasets.load_docs("gsm8k")
    assert len(docs) == 3 and gsm8k_extract(docs[2]["answer"]) == "2"


def test_offline_webqs_builder(tmp_path, monkeypatch):
    raw = [{"utterance": "what is x?",
            "targetValue": '(list (description "A") (description B))'}]
    _with_data_dir(tmp_path, monkeypatch, "webqs",
                   "webquestions.examples.test.json", raw)
    docs = lmdatasets.load_docs("webqs")
    assert docs[0] == {"question": "what is x?", "answers": ["A", "B"]}


# ---------------------------------------------------------------------------
# end-to-end greedy_until through evaluate_tasks on a tiny model
# ---------------------------------------------------------------------------

def test_greedy_until_task_end_to_end(tmp_path, monkeypatch):
    raw = {"data": [{
        "id": "x", "source": "s", "story": "A story.",
        "questions": [{"input_text": "Who?", "turn_id": 1}],
        "answers": [{"input_text": "Bob", "turn_id": 1, "span_start": 0,
                     "span_end": 3, "span_text": "Bob"}],
    }]}
    _with_data_dir(tmp_path, monkeypatch, "coqa", "dev.json", raw)
    m = Model.tiny_llama(max_seq_len=512, vocab_size=300)
    res = evaluate_tasks(m, ByteTokenizer(), ["coqa"], fused=False)
    assert res["coqa"]["n"] == 1
    assert 0.0 <= res["coqa"]["f1"] <= 1.0 and 0.0 <= res["coqa"]["em"] <= 1.0


@pytest.mark.slow  # r5 re-tier: fast representative = other lmeval_gen error paths
def test_empty_task_hard_fails(monkeypatch):
    # offline mode makes the HF fallback fail instantly instead of paying
    # ~20s of connection retries for the expected miss
    monkeypatch.setenv("HF_DATASETS_OFFLINE", "1")
    monkeypatch.delenv("MI_TPU_DATA_DIR", raising=False)
    m = Model.tiny_llama(max_seq_len=256, vocab_size=300)
    with pytest.raises(RuntimeError, match="0 docs"):
        evaluate_tasks(m, ByteTokenizer(), ["triviaqa"], fused=False)
