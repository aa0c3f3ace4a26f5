"""Speculative decoding composed with page-pool serving (round 3 serving
composition: "paged + speculative", ROADMAP item 4).

1. `model_step_chunk_batch_paged` (chunk verify through the page table) is
   bit-identical to the dense `model_step_chunk_batch` on mirrored state,
   including the scattered KV rows' (page, offset) placement.
2. `PagedSpeculativeBatcher` emits exactly the plain PagedMegaBatcher's
   greedy sequences (greedy spec-dec is exact) while recycling pages, with
   draft == target and with a degraded draft.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.serving import init_cache, prefill
from mi_optimize_tpu.serving.megadecode import (
    init_pool_batched, model_step_chunk_batch, model_step_chunk_batch_paged,
    stack_cache_batched, stack_serving)
from mi_optimize_tpu.serving.paged import PagedMegaBatcher, PagedSpeculativeBatcher
from tests.test_model_fused_batch import _mega_model


@pytest.mark.slow  # r5 re-tier: fast representative = test_parallel_sampling_forks_share_pages_exact
def test_paged_chunk_verify_matches_dense():
    """Same slot state in pool+table vs dense B-slot cache -> identical
    chunk-verify logits, and the C new rows land at the right (page, off)."""
    model = _mega_model(seed=21)
    cfg = model.config
    stack, meta = stack_serving(model)

    B, C, P, nt = 2, 3, 128, 2
    T = P * nt
    rng = np.random.default_rng(23)
    prefixes = np.array([9, 140])   # slot 1's history spans two pages
    prompts = [rng.integers(0, 128, (1, int(p))) for p in prefixes]
    chunks = rng.integers(0, 128, (B, C))

    cache = init_cache(cfg, B, T, jnp.int8)
    for b, p in enumerate(prompts):
        one = init_cache(cfg, 1, T, jnp.int8)
        _, one = prefill(model.params, cfg, jnp.asarray(p), one, False)
        for c, o in zip(cache, one):
            for f in c:
                c[f] = c[f].at[b].set(o[f][0])
    sc = stack_cache_batched(cache)

    # mirror the dense cache into a page pool
    pool = init_pool_batched(cfg, 1 + B * nt, P)
    table = np.zeros((B, nt), np.int32)
    pg = 1
    for b in range(B):
        for t in range(nt):
            table[b, t] = pg
            for f in pool:
                pool[f] = pool[f].at[:, pg].set(
                    sc[f][:, b, :, t * P:(t + 1) * P])
            pg += 1

    logits_d, sc2 = model_step_chunk_batch(
        model.params, stack, meta, cfg, jnp.asarray(chunks), sc,
        jnp.asarray(prefixes), interpret=True)
    logits_p, pool2 = model_step_chunk_batch_paged(
        model.params, stack, meta, cfg, jnp.asarray(chunks), pool,
        jnp.asarray(table), jnp.asarray(prefixes), interpret=True)

    np.testing.assert_array_equal(np.asarray(logits_p), np.asarray(logits_d))

    # every written chunk row matches the dense write's placement
    for b in range(B):
        for c in range(C):
            pos = int(prefixes[b]) + c
            page, off = table[b, pos // P], pos % P
            np.testing.assert_array_equal(
                np.asarray(pool2["k"][:, page, :, off]),
                np.asarray(sc2["k"][:, b, :, pos]))
            np.testing.assert_array_equal(
                np.asarray(pool2["v_scale"][:, page, :, off]),
                np.asarray(sc2["v_scale"][:, b, :, pos]))


def _run(b, prompts, n_new):
    got = b.run_all(list(prompts), max_new_tokens=n_new)
    return got


@pytest.mark.slow
def test_paged_speculative_batcher_exact_and_recycles():
    """Spec rounds through the page pool == plain paged greedy; pages
    recycle across the two request waves."""
    model = _mega_model(seed=22)
    rng = np.random.default_rng(29)
    prompts = [rng.integers(0, 128, (100 + 7 * i,)) for i in range(4)]
    new = 10

    ref = _run(PagedMegaBatcher(model, n_slots=2, max_len=256, page_size=128,
                                n_pages=6), prompts, new)

    # draft == target: every proposal accepted, still must be exact
    sb = PagedSpeculativeBatcher(model, model, k=3, n_slots=2, max_len=256,
                                 page_size=128, n_pages=6)
    got = _run(sb, prompts, new)
    assert set(got) == set(ref)
    for rid in ref:
        assert got[rid] == ref[rid], f"request {rid} diverged"
    assert sb.accepted == sb.proposed  # perfect draft accepts everything
    assert sb.rounds > 0
    assert sorted(sb.free_pages) == list(range(1, 6))
    assert (sb.table == 0).all()


@pytest.mark.slow
def test_paged_speculative_batcher_degraded_draft_exact():
    """A WRONG draft (different random init) still emits the target's exact
    greedy sequences — only the accept rate suffers."""
    model = _mega_model(seed=22)
    draft = _mega_model(seed=5)
    rng = np.random.default_rng(31)
    prompts = [rng.integers(0, 128, (60,)), rng.integers(0, 128, (75,))]
    new = 8

    ref = _run(PagedMegaBatcher(model, n_slots=2, max_len=256, page_size=128,
                                n_pages=7), prompts, new)
    sb = PagedSpeculativeBatcher(model, draft, k=3, n_slots=2, max_len=256,
                                 page_size=128, n_pages=7)
    got = _run(sb, prompts, new)
    for rid in ref:
        assert got[rid] == ref[rid], f"request {rid} diverged"
    assert sb.accepted < sb.proposed


def test_parallel_sampling_forks_share_pages_exact():
    """n=3 parallel-sampling forks with top_k=1 (degenerate-to-greedy) must
    each emit exactly the plain greedy sequence — validating that forks read
    the SHARED full prompt pages and the per-fork copied tail page bit-
    exactly — while page refcounts track the sharing."""
    model = _mega_model(seed=22)
    rng = np.random.default_rng(41)
    prompt = rng.integers(0, 128, (150,))   # S=150: one full shared page +
    new = 6                                 # a mid-page tail to copy

    ref_b = PagedMegaBatcher(model, n_slots=1, max_len=256, page_size=128,
                             n_pages=4)
    ref = list(ref_b.run_all([prompt], max_new_tokens=new).values())[0]

    pb = PagedMegaBatcher(model, n_slots=3, max_len=256, page_size=128,
                          n_pages=8)
    rids = pb.add_request(prompt, max_new_tokens=new, n=3, temperature=1.0,
                          top_k=1, seed=0)
    assert len(rids) == 3
    # one full prompt page shared by all 3 forks; tails are private
    shared = pb.table[0, 0]
    assert (pb.table[:, 0] == shared).all()
    assert pb.page_refs[shared] == 3
    tails = pb.table[:, 1]
    assert len(set(int(t) for t in tails)) == 3
    reqs = [r for r in pb.slot_req if r is not None]
    while any(r is not None for r in pb.slot_req):
        pb.step()
    for r in reqs:
        assert r.tokens == ref, "fork diverged from greedy"
    # every page recycled exactly once
    assert sorted(pb.free_pages) == list(range(1, 8))
    assert (pb.page_refs[1:] == 0).all()


def test_parallel_sampling_diverges_and_is_deterministic():
    """temperature=1 forks diverge from each other; the same seed reproduces
    the same samples."""
    model = _mega_model(seed=22)
    rng = np.random.default_rng(43)
    prompt = rng.integers(0, 128, (40,))

    def run(seed):
        pb = PagedMegaBatcher(model, n_slots=4, max_len=256, page_size=128,
                              n_pages=12)
        pb.add_request(prompt, max_new_tokens=6, n=4, temperature=1.0,
                       top_p=0.95, seed=seed)
        reqs = [r for r in pb.slot_req if r is not None]
        while any(r is not None for r in pb.slot_req):
            pb.step()
        return [tuple(r.tokens) for r in reqs]

    a = run(7)
    assert len(set(a)) > 1, "all forks identical at temperature 1"
    assert a == run(7), "same seed must reproduce"
