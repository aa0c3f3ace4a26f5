"""Round-3 lm-eval completeness: reference-registry superset, alias/bundle
expansion (load_lmeval.py:15-32), the 5 added tasks, and the remaining
offline raw-format builders."""
import json

import numpy as np
import pytest

from mi_optimize_tpu.datasets import lmdatasets
from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer
from mi_optimize_tpu.eval.lmeval import (
    TASK_REGISTRY, evaluate_tasks, expand_task_names)
from mi_optimize_tpu.eval import lmeval_tasks  # noqa: F401 registry side-effect
from mi_optimize_tpu.eval.lmeval_more_tasks import MCTACO, SQuAD2
from mi_optimize_tpu.models.model import Model


# ---------------------------------------------------------------------------
# registry: superset of the reference's ACTIVE names
# ---------------------------------------------------------------------------

def _reference_active_names():
    import re

    src = open("/root/reference/benchmark/lmeval/tasks/__init__.py").read()
    body = src.split("TASK_REGISTRY = {", 1)[1].split("\nALL_TASKS", 1)[0]
    names = []
    for raw in body.splitlines():
        s = raw.strip()
        if s and not s.startswith("#"):
            m = re.match(r'"([^"]+)"\s*:', s)
            if m:
                names.append(m.group(1))
    return names


def test_registry_superset_of_reference():
    ref = _reference_active_names()
    assert len(ref) == 133
    missing = [t for t in ref if t not in TASK_REGISTRY]
    assert not missing, f"reference-active tasks unregistered: {missing}"


def test_reference_name_aliases_resolve_to_same_protocol():
    # glue_* / lambada / headqa are the reference registry names for the
    # classes we also register under short names (tasks/__init__.py:54,155-166)
    assert TASK_REGISTRY["glue_sst"] is TASK_REGISTRY["sst"]
    assert TASK_REGISTRY["glue_mnli"] is TASK_REGISTRY["mnli"]
    assert TASK_REGISTRY["lambada"] is TASK_REGISTRY["lambada_standard"]
    assert TASK_REGISTRY["headqa"] is TASK_REGISTRY["headqa_es"]


def test_expand_task_names_bundles():
    assert expand_task_names("wikitext") == ["wikitext"]
    assert set(expand_task_names(["anli"])) == {"anli_r1", "anli_r2", "anli_r3"}
    assert set(expand_task_names(["arc"])) == {"arc_easy", "arc_challenge"}
    assert len(expand_task_names(["blimp"])) == 67
    a0 = expand_task_names(["all_tasks_0s"])
    a5 = expand_task_names(["all_tasks_5s"])
    assert len(a0) == 50 and len(a5) == 96  # load_lmeval.py:86-93 lists
    assert all(t in TASK_REGISTRY for t in a0 + a5)
    # bundles expand only when they are the sole entry (len==1 guard)
    assert expand_task_names(["all_tasks_0s", "piqa"]) == ["all_tasks_0s", "piqa"]


# ---------------------------------------------------------------------------
# offline builders (reference benchmark/lmeval/lmdatasets/ raw formats)
# ---------------------------------------------------------------------------

def _data_dir(tmp_path, monkeypatch, task, fname, payload, text=False):
    d = tmp_path / "lmeval" / task
    d.mkdir(parents=True, exist_ok=True)
    p = d / fname
    p.write_text(payload if text else json.dumps(payload), encoding="utf-8")
    monkeypatch.setenv("MI_TPU_DATA_DIR", str(tmp_path))
    return p


def test_offline_asdiv_builder(tmp_path, monkeypatch):
    xml = """<Machine-Reading-Corpus-File><ProblemSet>
      <Problem ID="1" Grade="1" Source="x">
        <Body>Seven red apples.</Body>
        <Question>How many apples?</Question>
        <Solution-Type>Addition</Solution-Type>
        <Answer>7 (apples)</Answer>
        <Formula>7=7</Formula>
      </Problem></ProblemSet></Machine-Reading-Corpus-File>"""
    _data_dir(tmp_path, monkeypatch, "asdiv", "ASDiv.xml", xml, text=True)
    docs = lmdatasets.load_docs("asdiv")
    assert docs == [{"body": "Seven red apples.",
                     "question": "How many apples?",
                     "solution_type": "Addition", "answer": "7 (apples)",
                     "formula": "7=7"}]


def test_offline_headqa_builder(tmp_path, monkeypatch):
    raw = {"exams": {"e1": {
        "name": "Exam ", "year": "2016 ", "category": "medicine ",
        "data": [{"qid": " 1", "qtext": " What? ", "ra": " 2",
                  "answers": [{"aid": 1, "atext": " a1 "},
                              {"aid": 2, "atext": " a2 "}]}],
    }}}
    _data_dir(tmp_path, monkeypatch, "headqa_en", "test_HEAD_EN.json", raw)
    docs = lmdatasets.load_docs("headqa_en")
    assert docs[0]["qtext"] == "What?" and docs[0]["ra"] == 2
    assert docs[0]["answers"][1] == {"aid": 2, "atext": "a2"}


def test_offline_logiqa_builder(tmp_path, monkeypatch):
    raw = ("b\ncontext one.\nwhich?\nA.first\nB.second\nC.third\nD.fourth\n\n"
           "a\ncontext two.\nwhat?\nA.w\nB.x\nC.y\nD.z")
    _data_dir(tmp_path, monkeypatch, "logiqa", "Eval.txt", raw, text=True)
    docs = lmdatasets.load_docs("logiqa")
    assert len(docs) == 2
    assert docs[0]["correct_option"] == 1
    assert docs[0]["options"][0] == "first"
    assert docs[1]["label"] == "a" and docs[1]["query"] == "what?"


def test_offline_mutual_builder(tmp_path, monkeypatch):
    d = tmp_path / "lmeval" / "mutual" / "dev"
    d.mkdir(parents=True)
    (d / "dev_1.txt").write_text(json.dumps({
        "answers": "B", "options": ["m: no", "f: yes", "m: hm", "f: ok"],
        "article": "m: hi . f: hello .", "id": "dev_1"}), encoding="utf-8")
    (d / "empty.txt").write_text("", encoding="utf-8")
    monkeypatch.setenv("MI_TPU_DATA_DIR", str(tmp_path))
    docs = lmdatasets.load_docs("mutual")
    assert len(docs) == 1 and docs[0]["answers"] == "B"


def test_offline_ethics_builders(tmp_path, monkeypatch):
    _data_dir(tmp_path, monkeypatch, "ethics_commonsense", "cm_test.csv",
              "label,input,is_short,edited\n1,He lied.,True,False\n", text=True)
    docs = lmdatasets.load_docs("ethics_commonsense")
    assert docs == [{"label": "1", "input": "He lied.", "is_short": "True",
                     "edited": "False"}]
    _data_dir(tmp_path, monkeypatch, "ethics_virtue", "virtue_test.csv",
              "label,scenario\n1,He helped. [SEP] kind\n", text=True)
    docs = lmdatasets.load_docs("ethics_virtue")
    assert docs[0]["scenario"] == "He helped." and docs[0]["trait"] == "kind"
    _data_dir(tmp_path, monkeypatch, "ethics_utilitarianism", "util_test.csv",
              "I ate pie.,I ate mud.\n", text=True)
    docs = lmdatasets.load_docs("ethics_utilitarianism")
    assert docs[0]["activity"] == "I ate pie."


def test_offline_math_builder(tmp_path, monkeypatch):
    d = tmp_path / "lmeval" / "hendrycks_math" / "test"
    d.mkdir(parents=True)
    (d / "1.json").write_text(json.dumps({
        "problem": "1+1?", "level": "Level 1", "type": "Algebra",
        "solution": "2"}), encoding="utf-8")
    monkeypatch.setenv("MI_TPU_DATA_DIR", str(tmp_path))
    docs = lmdatasets.load_docs("hendrycks_math")
    assert docs[0]["solution"] == "2"


def test_offline_pile_builder(tmp_path, monkeypatch):
    raw = "\n".join(json.dumps({"text": t, "meta": {"pile_set_name": n}})
                    for t, n in (("a", "ArXiv"), ("b", "Github")))
    _data_dir(tmp_path, monkeypatch, "pile", "val.jsonl", raw, text=True)
    docs = lmdatasets.load_docs("pile")
    assert [d["pile_set_name"] for d in docs] == ["ArXiv", "Github"]
    p = tmp_path / "lmeval" / "pile" / "val.jsonl"
    assert [d["text"] for d in lmdatasets.build_pile(p, "ArXiv")] == ["a"]


def test_offline_sat_builder(tmp_path, monkeypatch):
    raw = ("# comment\n190 FROM REAL SATs\nlegend:ceremony\n"
           "drawing:blueprint\nfurniture:chair\nmusic:instrument\n"
           "hero:worship\nfood:banquet\nb\n")
    _data_dir(tmp_path, monkeypatch, "sat_analogies", "SAT-package-V3.txt",
              raw, text=True)
    docs = lmdatasets.load_docs("sat_analogies")
    assert docs[0]["stem"] == "legend:ceremony"
    assert len(docs[0]["choices"]) == 5 and docs[0]["solution"] == "b"


def test_offline_unscramble_builder(tmp_path, monkeypatch):
    raw = json.dumps({"context": "claude = ", "completion": "claude"})
    _data_dir(tmp_path, monkeypatch, "unscramble",
              "cycle_letters_in_word.jsonl", raw, text=True)
    docs = lmdatasets.load_docs("unscramble")
    assert docs == [{"context": "claude = ", "completion": "claude"}]


def test_offline_squad2_builder(tmp_path, monkeypatch):
    raw = {"data": [{"title": "T", "paragraphs": [{
        "context": "Paris is in France.",
        "qas": [
            {"id": "q1", "question": "Where is Paris?",
             "answers": [{"text": "France", "answer_start": 12}]},
            {"id": "q2", "question": "Where is Mars?", "answers": [],
             "is_impossible": True},
        ]}]}]}
    _data_dir(tmp_path, monkeypatch, "squad2", "dev-v2.0.json", raw)
    docs = lmdatasets.load_docs("squad2")
    assert len(docs) == 2
    assert docs[0]["answers"]["text"] == ["France"]
    assert docs[1]["answers"]["text"] == []


def test_offline_mc_taco_builder(tmp_path, monkeypatch):
    raw = ("He ate.\tHow long?\t5 minutes\tyes\tEvent Duration\n"
           "He ate.\tHow long?\t5 centuries\tno\tEvent Duration\n")
    _data_dir(tmp_path, monkeypatch, "mc_taco", "dev_3783.tsv", raw, text=True)
    docs = lmdatasets.load_docs("mc_taco")
    assert [d["label"] for d in docs] == [1, 0]
    assert docs[0]["answer"] == "5 minutes"


def test_offline_qasper_builder(tmp_path, monkeypatch):
    raw = {"paper1": {"title": "A Paper", "abstract": "We study X.",
                      "qas": [{"question": "What is X?",
                               "answers": [{"answer": {
                                   "unanswerable": False, "yes_no": None,
                                   "free_form_answer": "a thing",
                                   "extractive_spans": []}}]}]}}
    _data_dir(tmp_path, monkeypatch, "qasper", "qasper-dev-v0.3.json", raw)
    docs = lmdatasets.load_docs("qasper")
    assert docs[0]["qas"]["question"] == ["What is X?"]
    assert docs[0]["qas"]["answers"][0]["answer"][0]["free_form_answer"] == "a thing"


def test_offline_toxigen_builder(tmp_path, monkeypatch):
    raw = ("text,target_group,toxicity_ai,toxicity_human\n"
           "hello there,none,1.0,1.0\nbad stuff,g,4.0,4.3\n")
    _data_dir(tmp_path, monkeypatch, "toxigen", "annotated_test.csv", raw,
              text=True)
    docs = lmdatasets.load_docs("toxigen")
    assert len(docs) == 2 and docs[1]["toxicity_ai"] == 4.0


# ---------------------------------------------------------------------------
# metric golden values
# ---------------------------------------------------------------------------

def test_squad2_aggregate_golden():
    task = SQuAD2()
    docs = [
        {"id": "a", "answers": {"text": ["France"], "answer_start": [0]}},
        {"id": "b", "answers": {"text": [], "answer_start": []}},
    ]
    metrics = [
        task.process_results(docs[0], ["France", (-0.5, False)]),
        task.process_results(docs[1], ["Jupiter", (-0.05, False)]),
    ]
    out = task.aggregate(metrics)
    # q_a exact; q_b (unanswerable, gold "") mismatched by "Jupiter"
    assert out["exact"] == 50.0 and out["f1"] == 50.0
    assert out["HasAns_exact"] == 100.0 and out["NoAns_exact"] == 0.0
    # best threshold flips q_b (the HIGHER na_prob) to no-answer -> 100
    assert out["best_exact"] == 100.0


def test_mc_taco_aggregate_golden():
    task = MCTACO()
    # one question, two candidates: one right, one wrong -> em 0, f1 2/3
    metrics = [
        {"gold": 1, "pred": 1, "question": "q1"},
        {"gold": 0, "pred": 1, "question": "q1"},
        # second question fully right -> em picks up 1/2
        {"gold": 1, "pred": 1, "question": "q2"},
    ]
    out = task.aggregate(metrics)
    assert out["em"] == 0.5
    assert np.isclose(out["f1"], np.mean([2 / 3, 1.0]))


# ---------------------------------------------------------------------------
# end-to-end on a tiny model (mixed request types included)
# ---------------------------------------------------------------------------

def test_squad2_end_to_end(tmp_path, monkeypatch):
    raw = {"data": [{"title": "T", "paragraphs": [{
        "context": "Paris is in France.",
        "qas": [{"id": "q1", "question": "Where is Paris?",
                 "answers": [{"text": "France", "answer_start": 12}]}]}]}]}
    _data_dir(tmp_path, monkeypatch, "squad2", "dev-v2.0.json", raw)
    m = Model.tiny_llama(max_seq_len=512, vocab_size=300)
    res = evaluate_tasks(m, ByteTokenizer(), ["squad2"], fused=False)
    assert res["squad2"]["n"] == 1
    for k in ("exact", "f1", "best_exact", "best_f1"):
        assert 0.0 <= res["squad2"][k] <= 100.0


def test_mc_taco_toxigen_asdiv_end_to_end(tmp_path, monkeypatch):
    _data_dir(tmp_path, monkeypatch, "mc_taco", "dev_3783.tsv",
              "He ate.\tHow long?\t5 minutes\tyes\tEvent Duration\n"
              "He ate.\tHow long?\t5 centuries\tno\tEvent Duration\n",
              text=True)
    _data_dir(tmp_path, monkeypatch, "toxigen", "annotated_test.csv",
              "text,toxicity_ai,toxicity_human\nhi there,1.0,1.0\n"
              "awful text,4.0,4.0\n", text=True)
    xml = """<R><Problem ID="1"><Body>Two cats.</Body>
      <Question>How many?</Question><Solution-Type>A</Solution-Type>
      <Answer>2 (cats)</Answer><Formula>2=2</Formula></Problem></R>"""
    _data_dir(tmp_path, monkeypatch, "asdiv", "ASDiv.xml", xml, text=True)

    m = Model.tiny_llama(max_seq_len=512, vocab_size=300)
    res = evaluate_tasks(m, ByteTokenizer(),
                         ["mc_taco", "toxigen", "math_asdiv"], fused=False)
    assert res["mc_taco"]["n"] == 2 and 0.0 <= res["mc_taco"]["f1"] <= 1.0
    assert res["toxigen"]["n"] == 2 and 0.0 <= res["toxigen"]["acc"] <= 1.0
    assert res["math_asdiv"]["n"] == 1


def test_qasper_end_to_end(tmp_path, monkeypatch):
    raw = {"p": {"title": "A Paper", "abstract": "We study X.",
                 "qas": [
                     {"question": "What is X?",
                      "answers": [{"answer": {
                          "unanswerable": False, "yes_no": None,
                          "free_form_answer": "a thing",
                          "extractive_spans": []}}]},
                     {"question": "Is X good?",
                      "answers": [{"answer": {
                          "unanswerable": False, "yes_no": True,
                          "free_form_answer": "",
                          "extractive_spans": []}}]},
                 ]}}
    _data_dir(tmp_path, monkeypatch, "qasper", "qasper-dev-v0.3.json", raw)
    m = Model.tiny_llama(max_seq_len=512, vocab_size=300)
    res = evaluate_tasks(m, ByteTokenizer(), ["qasper"], fused=False)
    assert res["qasper"]["n"] == 2  # free-form + bool docs both flattened
    assert 0.0 <= res["qasper"]["f1_abstractive"] <= 1.0


def test_headqa_alias_end_to_end(tmp_path, monkeypatch):
    raw = {"exams": {"e1": {"name": "E", "year": "2016", "category": "m",
                            "data": [{"qid": "1", "qtext": "Q?", "ra": "1",
                                      "answers": [{"aid": 1, "atext": "x"},
                                                  {"aid": 2, "atext": "y"}]}]}}}
    _data_dir(tmp_path, monkeypatch, "headqa_es", "test_HEAD.json", raw)
    m = Model.tiny_llama(max_seq_len=256, vocab_size=300)
    res = evaluate_tasks(m, ByteTokenizer(), ["headqa"], fused=False)
    assert res["headqa"]["n"] == 1
