"""Planted-structure models (round 4): greedy decoding must follow the
planted token map on every path, and the spec-dec draft/target accept rate
must track the planted disagreement fraction."""
import numpy as np
import pytest

import jax.numpy as jnp

from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, generate
from mi_optimize_tpu.utils.planted import (
    build_planted_llama, planted_map, planted_pair)


def _cfg(**kw):
    d = dict(vocab_size=128, hidden_size=512, intermediate_size=1024,
             num_layers=2, num_heads=4, num_kv_heads=2, head_dim=128,
             max_seq_len=512)
    d.update(kw)
    return LlamaConfig(**d)


def test_greedy_follows_planted_map():
    cfg = _cfg()
    m = planted_map(cfg.vocab_size, seed=3)
    model = Model(config=cfg, params=build_planted_llama(cfg, m),
                  family="llama")
    prompt = np.array([[5, 17, 99]])
    n = 6
    out = generate(model, prompt, max_new_tokens=n, fused=False,
                   cache_dtype=jnp.int8, max_len=256)[0, prompt.shape[1]:]
    want, t = [], 99
    for _ in range(n):
        t = int(m[t])
        want.append(t)
    assert np.asarray(out).tolist() == want


def test_planted_follows_on_megakernel_path():
    from mi_optimize_tpu.serving import init_cache, prefill
    from mi_optimize_tpu.serving.megadecode import (
        decode_loop_model, stack_cache, stack_serving)

    cfg = _cfg()
    m = planted_map(cfg.vocab_size, seed=5)
    model = fuse_for_serving(Model(config=cfg,
                                   params=build_planted_llama(cfg, m),
                                   family="llama"))
    st = stack_serving(model)
    assert st is not None
    prompt = np.array([[7, 42]])
    cache = init_cache(cfg, 1, 256, jnp.int8)
    logits, cache = prefill(model.params, cfg, jnp.asarray(prompt), cache,
                            False)
    first = int(np.argmax(np.asarray(logits[0])))
    assert first == int(m[42])
    toks, _ = decode_loop_model(model.params, st[0], st[1], cfg,
                                jnp.asarray([[first]]), stack_cache(cache),
                                jnp.asarray(2), 4, interpret=True)
    want, t = [], first
    for _ in range(4):
        t = int(m[t])
        want.append(t)
    assert np.asarray(toks[0]).tolist() == want


def test_spec_scan_flat_segments_exact():
    """The round-4 scan-segment spec loop (flat-kernel draft + chunk-
    megakernel verify, fixed-m lax.scan instead of while_loop) must emit the
    target's exact greedy chain and report accept rate ~1 for an agreeing
    draft."""
    from mi_optimize_tpu.serving.speculative import speculative_generate

    cfg = _cfg()
    target, draft, m_t, _ = planted_pair(cfg, draft_layers=1,
                                         disagree_frac=0.0)
    target, draft = fuse_for_serving(target), fuse_for_serving(draft)
    prompt = np.array([[9, 77]])
    toks, stats = speculative_generate(target, draft, prompt,
                                       max_new_tokens=11, k=3, fused=False,
                                       cache_dtype=jnp.int8,
                                       draft_megakernel=True)
    assert stats.get("scan_segments"), "flat scan path should be taken"
    want, t = [], 77
    for _ in range(11):
        t = int(m_t[t])
        want.append(t)
    assert np.asarray(toks).reshape(-1)[2:2 + 11].tolist() == want
    assert stats["accept_rate"] > 0.99


# frac=0.5 bound: a disagreement at position i of a k-chunk rejects the rest,
# so accepted/proposed ~ (q+q^2+q^3)/3 ~ 0.29 at per-token agreement q=0.5,
# with wide variance over a 12-token orbit
@pytest.mark.parametrize("frac,lo,hi", [(0.0, 0.99, 1.01), (0.5, 0.03, 0.8)])
def test_spec_accept_rate_tracks_disagreement(frac, lo, hi):
    from mi_optimize_tpu.serving.speculative import speculative_generate

    cfg = _cfg()
    target, draft, m_t, _ = planted_pair(cfg, draft_layers=1,
                                         disagree_frac=frac)
    target, draft = fuse_for_serving(target), fuse_for_serving(draft)
    prompt = np.array([[11, 23]])
    toks, stats = speculative_generate(target, draft, prompt,
                                       max_new_tokens=12, k=3, fused=False,
                                       cache_dtype=jnp.int8,
                                       draft_megakernel=False,
                                       on_device=False)
    # target-greedy output must follow m_t regardless of the draft
    want, t = [], 23
    for _ in range(12):
        t = int(m_t[t])
        want.append(t)
    assert np.asarray(toks).reshape(-1)[2:2 + 12].tolist() == want
    assert lo <= stats["accept_rate"] <= hi


@pytest.mark.parametrize("frac,expect_k", [
    # the measured v5e round-cost table (ADAPT_COST) makes k=8 optimal at
    # q=1 since the C<=6 fused-lm gate cut its round to 17.4 ms (vs 11.7
    # for k=4): 9/17.4 > 5/11.7 — matching the recorded steady state
    # (517.3 tok/s k=8 vs 424.8 k=4 at accept 1.0, BENCH_DETAILS r5)
    (0.0, 8),
    # r5 re-tier: the low-q variant needs many more dispatches/compiles
    pytest.param(0.9, 2, marks=pytest.mark.slow),
])
def test_adaptive_k_tracks_accept_rate(frac, expect_k):
    """k="auto" (round 5): the scan-flat path estimates the per-token
    agreement q by truncated-geometric MLE between dispatches and re-picks
    k from ADAPT_KSET via the measured round-cost table — an agreeing draft
    settles on the table's high-q optimum, a mostly-disagreeing one on the
    smallest k, and the emitted chain stays the target's exact greedy chain
    either way."""
    from mi_optimize_tpu.serving.speculative import speculative_generate

    cfg = _cfg()
    target, draft, m_t, _ = planted_pair(cfg, draft_layers=1,
                                         disagree_frac=frac)
    target, draft = fuse_for_serving(target), fuse_for_serving(draft)
    prompt = np.array([[9, 77]])
    n = 60   # > (adaptive dispatch cap 8)*(k+1): forces >=2 dispatches
    toks, stats = speculative_generate(target, draft, prompt,
                                       max_new_tokens=n, k="auto",
                                       fused=False, cache_dtype=jnp.int8,
                                       draft_megakernel=True)
    assert stats.get("scan_segments")
    want, t = [], 77
    for _ in range(n):
        t = int(m_t[t])
        want.append(t)
    assert np.asarray(toks).reshape(-1)[2:2 + n].tolist() == want
    hist = stats["adaptive_k"]
    assert len(hist) >= 2, "need at least two dispatches to adapt"
    assert hist[-1] == expect_k, (hist, stats["q_hat"])
