"""lm-eval adapter + BOSS evaluation pipeline tests (offline, tiny model)."""
import numpy as np
import pytest

from mi_optimize_tpu.datasets.calibration import find_data_path
from mi_optimize_tpu.datasets.tokenizer import ByteTokenizer
from mi_optimize_tpu.models.model import Model


def tiny():
    return Model.tiny_llama(max_seq_len=512, vocab_size=300)


def test_loglikelihood_executor_consistency():
    """ll(ctx, cont) must equal the sum of per-token logprobs from a raw forward."""
    import jax.numpy as jnp

    from mi_optimize_tpu.eval.lmeval import LMEvalModel
    from mi_optimize_tpu.models import llama
    import jax

    m = tiny()
    tok = ByteTokenizer()
    lm = LMEvalModel(m, tok, fused=False, max_length=256)
    (ll, greedy), = lm.loglikelihood([("Hello wor", "ld")])
    ids = tok.encode("Hello world")
    logits = llama.forward(m.params, m.config, jnp.asarray([ids]), fused=False)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    nctx = len(tok.encode("Hello wor"))
    expect = sum(float(lp[0, t - 1, ids[t]]) for t in range(nctx, len(ids)))
    assert abs(ll - expect) < 1e-3


def test_rolling_windows_protocol():
    """Reference get_rolling_token_windows(context_len=1)+make_disjoint_window
    semantics (lmeval.py:73-95): continuations partition the doc (EVERY token
    scored exactly once, incl. the first behind a BOS prefix)."""
    from mi_optimize_tpu.eval.lmeval import LMEvalModel

    m = tiny()
    lm = LMEvalModel(m, ByteTokenizer(), fused=False, max_length=8)
    toks = list(range(1, 21))  # 20 tokens, max_length 8
    windows = list(lm._rolling_windows(toks))
    # continuations partition the doc
    assert sum((c for _, c in windows), []) == toks
    # first window: [bos] context, full first chunk scored
    assert len(windows[0][0]) == 1 and windows[0][1] == toks[:8]
    # later windows: context abuts the continuation and the model input
    # (ctx+cont)[:-1] fills up to max_length tokens (reference pred_len calc)
    for ctx, cont in windows[1:]:
        assert ctx[-1] == toks[toks.index(cont[0]) - 1]
        assert len(ctx) + len(cont) == 9  # == max_length + 1


def test_rolling_ll_matches_hand_computed_nll():
    """Summed rolling ll == teacher-forced NLL of [bos]+doc from a raw forward."""
    import jax
    import jax.numpy as jnp

    from mi_optimize_tpu.eval.lmeval import LMEvalModel
    from mi_optimize_tpu.models import llama

    m = tiny()
    tok = ByteTokenizer()
    lm = LMEvalModel(m, tok, fused=False, max_length=64)
    text = "The quick brown fox"
    (ll,) = lm.loglikelihood_rolling([text])
    # the reference hardcodes prefix token id 2 (lmeval.py:101)
    ids = [2] + list(tok.encode(text))
    logits = llama.forward(m.params, m.config, jnp.asarray([ids[:-1]]), fused=False)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    expect = sum(float(lp[0, t - 1, ids[t]]) for t in range(1, len(ids)))
    assert abs(ll - expect) < 1e-3


def test_greedy_until_stops():
    from mi_optimize_tpu.eval.lmeval import LMEvalModel

    m = tiny()
    lm = LMEvalModel(m, ByteTokenizer(), fused=False, max_length=128)
    out = lm.greedy_until([("abc", ["\n"])], max_new_tokens=8)
    assert isinstance(out[0], str)


@pytest.mark.skipif(find_data_path("ceval-exam") is None, reason="no ceval data")
def test_lmeval_mc_task():
    from mi_optimize_tpu.eval.lmeval import evaluate_tasks

    m = tiny()
    res = evaluate_tasks(m, ByteTokenizer(), ["ceval_mc"], num_shot=0,
                         fused=False, max_docs=3)
    assert "acc" in res["ceval_mc"] and 0 <= res["ceval_mc"]["acc"] <= 1


@pytest.mark.skipif(find_data_path("wikitext") is None, reason="no wikitext data")
def test_lmeval_rolling_ppl_task():
    from mi_optimize_tpu.eval.lmeval import evaluate_tasks

    m = tiny()
    res = evaluate_tasks(m, ByteTokenizer(), ["wikitext"], fused=False, max_docs=2)
    assert res["wikitext"]["word_perplexity"] > 1


@pytest.mark.skipif(find_data_path("BOSS") is None, reason="no BOSS data")
def test_boss_qa_eval():
    from mi_optimize_tpu.eval.boss import eval_boss

    m = tiny()
    res = eval_boss(m, ByteTokenizer(), "QuestionAnswering_advqa", split="test",
                    num_shot=0, fused=False, max_questions=2, max_len=512)
    assert "f1" in res and "exact_match" in res


def test_boss_metrics_golden():
    from mi_optimize_tpu.eval.boss import compute_metric, normalize_answer

    assert normalize_answer("NaturalLanguageInference", "Ent") == "entailment"
    assert normalize_answer("ToxicDetection", "to") == "toxic"
    r = compute_metric("QuestionAnswering", ["25 years"], [["25 years", "a while"]])
    assert r["exact_match"] == 100.0
    r2 = compute_metric("SentimentAnalysis", ["positive", "negative"],
                        ["positive", "neutral"])
    assert r2["accuracy"] == 50.0
