"""Data-layer + MCQA evaluation pipeline tests (offline, byte tokenizer)."""
import numpy as np
import pytest

from mi_optimize_tpu.datasets import mcqa as D
from mi_optimize_tpu.datasets.calibration import (
    find_data_path, get_calibrate_loader, get_wikitext2,
)
from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.quant.config import CalibrationConfig

needs_data = pytest.mark.skipif(
    find_data_path("wikitext") is None, reason="bundled corpora not available"
)
needs_ceval = pytest.mark.skipif(
    find_data_path("ceval-exam") is None, reason="ceval data not available"
)


@needs_data
def test_wikitext_loader_shapes():
    tok = ByteTokenizer()
    tr = get_wikitext2(tok, split="train", nsamples=3, seqlen=64)
    assert len(tr) == 3 and tr[0].shape == (1, 64)


@needs_data
def test_calibrate_loader_dispatch():
    tok = ByteTokenizer()
    cfg = CalibrationConfig(name="wikitext2", split="train", nsamples=2, seqlen=64)
    batches = get_calibrate_loader(tok, cfg)
    assert len(batches) == 2


def test_subject_maps_sizes():
    assert len(D.CEVAL_TASK2CTG) == 52
    assert len(D.CMMLU_TASK2CTG) == 67
    assert len(D.get_subjects("ceval", "hm")) == 11
    assert len(D.get_subjects("ceval", "st")) == 20


@needs_ceval
def test_ceval_prompt_format():
    qs = D.get_questions("ceval", subject="all", split="val", question=1)
    assert qs and qs[0].rstrip().endswith("答案：")
    assert "A. " in qs[0] and "D. " in qs[0]


@needs_ceval
def test_ceval_calibrate_tokens():
    tok = ByteTokenizer()
    data = D.get_calibrate("ceval", tok, subject="hm", nsamples=1, seqlen=256)
    assert data and data[0].ndim == 2


def test_extract_cot_answer():
    q = "题目\nA. 甲\nB. 乙\nC. 丙\nD. 丁\n答案："
    assert D.extract_cot_answer(q, "所以答案是B。") == "B"
    assert D.extract_cot_answer(q, "答案为C") == "C"
    assert D.extract_cot_answer(q, "我认为应该选 A") == "A"
    assert D.extract_cot_answer(q, "没有答案") == "-"


@needs_ceval
def test_mcqa_eval_tiny_model():
    from mi_optimize_tpu.eval.mcqa import eval_ceval

    m = Model.tiny_llama(max_seq_len=2048)
    tok = ByteTokenizer()
    res = eval_ceval(m, tok, subject="hm", num_shot=0, split="val",
                     fused=False, max_questions=2, max_len=1024)
    assert "categories" in res and "Humanities" in res["categories"]
    assert 0.0 <= res["categories"]["Humanities"]["ratio"] <= 1.0
