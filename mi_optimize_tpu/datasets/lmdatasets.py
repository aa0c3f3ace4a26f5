"""Offline dataset builders for lm-eval tasks (role parity with the
reference's vendored HF builder scripts, /root/reference/benchmark/lmeval/
lmdatasets/ — coqa/coqa.py, drop/drop.py, triviaqa/triviaqa.py etc.).

The reference ships datasets.GeneratorBasedBuilder scripts that download the
official raw files and emit HF rows; in an offline TPU pod that download step
never runs. Here the same raw formats are parsed directly from a local data
directory so evaluation works with zero network:

    $MI_TPU_DATA_DIR/lmeval/<task>/<file>     (official raw JSON/JSONL)

Resolution order per task: (1) local raw file via its builder below,
(2) `datasets.load_dataset` (HF cache / network when available),
(3) empty list — `evaluate_tasks` hard-fails on empty docs unless the caller
opts into allow_empty, so an offline miss is loud, never a silent 0-doc "pass".

Each builder emits rows with the SAME schema the corresponding HF dataset (and
therefore the task protocol) expects, mirroring the reference builders'
_generate_examples field mappings.
"""
from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Dict, List, Optional

log = logging.getLogger(__name__)


def data_root() -> Optional[Path]:
    root = os.environ.get("MI_TPU_DATA_DIR")
    return Path(root) / "lmeval" if root else None


def _find(task: str, names) -> Optional[Path]:
    root = data_root()
    if root is None:
        return None
    for n in names:
        p = root / task / n
        if p.exists():
            return p
    return None


# ---------------------------------------------------------------------------
# raw-format parsers (one per official release format)
# ---------------------------------------------------------------------------

def build_coqa(path: Path) -> List[dict]:
    """Official coqa-dev-v1.0.json -> HF-columnar rows
    (reference lmdatasets/coqa/coqa.py::_generate_examples)."""
    data = json.loads(path.read_text(encoding="utf-8"))["data"]
    docs = []
    for row in data:
        doc = {
            "id": row["id"],
            "story": row["story"],
            "questions": {"input_text": [q["input_text"] for q in row["questions"]]},
            "answers": {"input_text": [a["input_text"] for a in row["answers"]]},
        }
        extra = row.get("additional_answers")
        if extra:
            doc["additional_answers"] = {
                k: {"input_text": [a["input_text"] for a in v]}
                for k, v in extra.items()
            }
        docs.append(doc)
    return docs


def build_drop(path: Path) -> List[dict]:
    """Official drop_dataset_dev.json -> one row per qa_pair with HF-columnar
    validated_answers (reference lmdatasets/drop/drop.py::_generate_examples)."""
    data = json.loads(path.read_text(encoding="utf-8"))
    docs = []
    for section_id, example in data.items():
        for qa in example["qa_pairs"]:
            ans = qa["answer"]
            validated = qa.get("validated_answers", [])
            docs.append({
                "section_id": section_id,
                "query_id": qa["query_id"],
                "passage": example["passage"],
                "question": qa["question"],
                "answer": {
                    "number": str(ans.get("number", "")),
                    "date": {k: str(ans.get("date", {}).get(k, ""))
                             for k in ("day", "month", "year")},
                    "spans": list(ans.get("spans", [])),
                },
                "validated_answers": {
                    "number": [str(v.get("number", "")) for v in validated],
                    "date": [{k: str(v.get("date", {}).get(k, ""))
                              for k in ("day", "month", "year")} for v in validated],
                    "spans": [list(v.get("spans", [])) for v in validated],
                },
            })
    return docs


def build_triviaqa(path: Path) -> List[dict]:
    """Official unfiltered-web-dev.json -> question/answer rows
    (reference lmdatasets/triviaqa/triviaqa.py::_generate_examples)."""
    data = json.loads(path.read_text(encoding="utf-8"))["Data"]
    return [{
        "question_id": d["QuestionId"],
        "question": d["Question"],
        "answer": {"aliases": list(d["Answer"]["Aliases"]),
                   "value": d["Answer"]["Value"]},
    } for d in data]


def build_gsm8k(path: Path) -> List[dict]:
    """Official test.jsonl ({question, answer} per line)."""
    docs = []
    with path.open(encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                docs.append(json.loads(line))
    return docs


def build_webqs(path: Path) -> List[dict]:
    """Official webquestions test JSON (url/targetValue rows) or a plain
    [{question, answers}] list."""
    data = json.loads(path.read_text(encoding="utf-8"))
    docs = []
    for d in data:
        if "answers" in d:
            docs.append({"question": d["question"], "answers": list(d["answers"])})
        else:  # original targetValue "(list (description A) (description B))"
            tv = d.get("targetValue", "")
            answers = [s.strip().rstrip(")").strip()
                       for s in tv.split("(description ")[1:]]
            answers = [a[1:-1] if a.startswith('"') and a.endswith('"') else a
                       for a in answers]
            docs.append({"question": d.get("utterance", d.get("question", "")),
                         "answers": answers})
    return docs


_BUILDERS: Dict[str, tuple] = {
    # task -> (candidate raw filenames, parser)
    "coqa": (("coqa-dev-v1.0.json", "dev.json", "validation.json"), build_coqa),
    "drop": (("drop_dataset_dev.json", "dev.json", "validation.json"), build_drop),
    "triviaqa": (("unfiltered-web-dev.json", "dev.json", "validation.json"),
                 build_triviaqa),
    "gsm8k": (("test.jsonl", "grade_school_math_test.jsonl"), build_gsm8k),
    "webqs": (("webquestions.examples.test.json", "test.json"), build_webqs),
}


def load_docs(task: str, hf_path: Optional[str] = None, hf_name: Optional[str] = None,
              split: str = "validation") -> List[dict]:
    """Offline-first docs for `task`; see module docstring for the order."""
    ent = _BUILDERS.get(task)
    if ent is not None:
        p = _find(task, ent[0])
        if p is not None:
            docs = ent[1](p)
            log.info("lmdatasets[%s]: %d docs from %s", task, len(docs), p)
            return docs
    if hf_path is not None:
        try:
            from datasets import load_dataset

            return list(load_dataset(hf_path, hf_name, split=split))
        except Exception as e:  # offline / no cache
            log.warning("lmdatasets[%s]: HF %s unavailable (%s)", task, hf_path, e)
    return []
