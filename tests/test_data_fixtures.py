"""Self-contained data layer (round 4, VERDICT item 6): the checked-in
`data/` fixtures must serve the wikitext/PTB/C-Eval/CMMLU/BOSS loaders with
the reference mount REMOVED from the search path and no MI_TPU_DATA_DIR —
the reference's bundled-data posture (SURVEY §2.5)."""
import os

import numpy as np
import pytest

from mi_optimize_tpu.datasets import calibration as C
from mi_optimize_tpu.datasets import mcqa as D
from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


@pytest.fixture()
def bare(monkeypatch):
    """Search path = the checked-in data/ dir ONLY (no env, no reference)."""
    monkeypatch.delenv("MI_TPU_DATA_DIR", raising=False)
    monkeypatch.setattr(C, "_search_dirs", lambda: (DATA,))


def test_wikitext_ptb_from_fixtures(bare):
    tok = ByteTokenizer()
    tr = C.get_wikitext2(tok, split="train", nsamples=2, seqlen=128)
    assert len(tr) == 2 and tr[0].shape == (1, 128)
    te = C.get_wikitext2(tok, split="test", nsamples=2, seqlen=128)
    assert te and te[0].shape == (1, 128)
    pt = C.get_ptb(tok, split="test", seqlen=128)
    assert pt and pt[0].shape == (1, 128)


def test_ceval_cmmlu_from_fixtures(bare):
    qs = D.get_questions("ceval", subject="all", split="val", question=1)
    assert len(qs) == 52 and qs[0].rstrip().endswith("答案：")
    qs = D.get_questions("cmmlu", subject="hm", split="test", question=1)
    assert qs and "A. " in qs[0]
    # every cmmlu subject resolves in some fixture split
    missing = [s for s in D.CMMLU_TASK2CTG
               if not any(D._rows_cmmlu(s, sp)
                          for sp in ("test", "test-source"))]
    assert not missing, missing


def test_boss_from_fixtures(bare):
    from mi_optimize_tpu.datasets.boss import get_testdata_boss

    prompts, answers = get_testdata_boss("QuestionAnswering", "advqa")
    assert prompts and len(prompts) == len(answers)


def test_ppl_eval_from_fixtures(bare):
    from mi_optimize_tpu.eval.benchmark import Benchmark
    from mi_optimize_tpu.models.model import Model

    m = Model.tiny_llama(max_seq_len=256, vocab_size=300)
    res = Benchmark().eval_ppl(m, ByteTokenizer(), ["wikitext2"],
                               seqlen=128, nsamples=2)
    assert np.isfinite(res["wikitext2"]) and res["wikitext2"] > 1.0


def test_mcqa_eval_from_fixtures(bare):
    from mi_optimize_tpu.eval.mcqa import eval_ceval
    from mi_optimize_tpu.models.model import Model

    m = Model.tiny_llama(max_seq_len=2048)
    res = eval_ceval(m, ByteTokenizer(), subject="hm", num_shot=0,
                     split="val", fused=False, max_questions=2, max_len=1024)
    assert "categories" in res and "Humanities" in res["categories"]
