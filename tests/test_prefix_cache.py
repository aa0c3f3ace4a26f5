"""Automatic prefix caching on the paged megakernel batcher (round 3).

vLLM-style: full prompt pages are registered under a chain hash of the whole
prefix; a later request that starts with a cached chain maps those pages
(refcount++, no recompute) and prefills only its suffix through the paged
whole-model CHUNK megakernel (megadecode.model_step_chunk_batch_paged),
attending to the hit pages through the page table. Refcount-0 cached pages
stay resident on an LRU list and are evicted only under allocator pressure.

Exactness: the hit pages hold byte-identical KV (same tokens, same absolute
positions, deterministic prefill), so a cache-enabled batcher must emit the
same greedy sequences as a cache-disabled one.
"""
import numpy as np
import pytest

from mi_optimize_tpu.serving.paged import PagedMegaBatcher
from tests.test_model_fused_batch import _mega_model


def _prompts_with_shared_page(rng, n_tail=3):
    shared = rng.integers(0, 128, (128,))          # exactly one full page
    return [np.concatenate([shared, rng.integers(0, 128, (10 + 3 * i,))])
            for i in range(n_tail)]


@pytest.mark.slow
def test_prefix_cache_matches_uncached_and_shares_pages():
    model = _mega_model(seed=9)
    rng = np.random.default_rng(21)
    prompts = _prompts_with_shared_page(rng)
    new = 6

    ref = PagedMegaBatcher(model, n_slots=1, max_len=256,
                           page_size=128).run_all(list(prompts), new)

    pb = PagedMegaBatcher(model, n_slots=1, max_len=256, page_size=128,
                          prefix_cache=True)
    got = pb.run_all(list(prompts), new)

    assert set(got) == set(ref)
    for rid in ref:
        assert got[rid] == ref[rid], f"request {rid} diverged"

    # requests 2 and 3 hit request 1's first page: one full page each
    st = pb.prefix_cache_stats()
    assert st["hit_tokens"] == 2 * 128
    assert st["miss_tokens"] == sum(len(p) for p in prompts) - 2 * 128
    assert st["cached_pages"] >= 1
    # all requests retired -> cached pages sit on the LRU list, not freed
    assert st["evictable_pages"] == st["cached_pages"]
    free_and_evictable = sorted(pb.free_pages + list(pb._pc_lru))
    assert free_and_evictable == list(range(1, len(pb.page_refs)))
    assert (pb.page_refs == 0).all()


@pytest.mark.slow  # r5 re-tier: fast representative = test_prefix_cache_hit_pages_pinned_before_alloc
def test_prefix_cache_page_identity_and_refcounts():
    """The hit request's table must literally point at the first request's
    page while both are live, with the refcount tracking both."""
    model = _mega_model(seed=10)
    rng = np.random.default_rng(23)
    p1, p2 = _prompts_with_shared_page(rng, n_tail=2)

    pb = PagedMegaBatcher(model, n_slots=2, max_len=256, page_size=128,
                          prefix_cache=True)
    r1 = pb.add_request(p1, max_new_tokens=8)
    r2 = pb.add_request(p2, max_new_tokens=8)
    assert r1 is not None and r2 is not None
    shared_pg = int(pb.table[0, 0])
    assert int(pb.table[1, 0]) == shared_pg
    assert pb.page_refs[shared_pg] == 2
    assert int(pb.table[1, 1]) != int(pb.table[0, 1])  # private tails

    while any(r is not None for r in pb.slot_req):
        pb.step()
    assert pb.page_refs[shared_pg] == 0
    assert shared_pg in pb._pc_lru                      # resident, evictable


def test_prefix_cache_eviction_under_pressure():
    """A pool too small to keep cold cached pages must evict them (LRU),
    deregister, and still serve an unrelated prompt correctly."""
    model = _mega_model(seed=11)
    rng = np.random.default_rng(29)
    pa, pb_prompt = _prompts_with_shared_page(rng, n_tail=2)
    other = rng.integers(0, 128, (140,))
    new = 4

    ref = PagedMegaBatcher(model, n_slots=1, max_len=256,
                           page_size=128).run_all([pa, pb_prompt, other], new)

    # 4 usable pages: request admission needs 2-3, so the cached page from
    # the first wave must be evicted to admit `other`
    pb = PagedMegaBatcher(model, n_slots=1, max_len=256, page_size=128,
                          n_pages=5, prefix_cache=True)
    got = pb.run_all([pa, pb_prompt, other], new)
    for rid in ref:
        assert got[rid] == ref[rid]
    st = pb.prefix_cache_stats()
    assert st["hit_tokens"] == 128                      # pb_prompt hit pa's page
    # `other` (no shared prefix) forced eviction at some point
    assert st["cached_pages"] <= 3


def test_prefix_cache_hit_pages_pinned_before_alloc():
    """Regression (r4 / ADVICE r3-high): _alloc's LRU eviction must never
    evict the pages the in-flight hit lookup just resolved — they are pinned
    first, and when the pool can't cover the suffix with them pinned, the
    request falls back to a full cache-miss prefill instead of crashing
    (KeyError) or aliasing a hit page as a fresh writable page."""
    model = _mega_model(seed=13)
    rng = np.random.default_rng(37)
    shared = rng.integers(0, 128, (128,))
    p_small = np.concatenate([shared, rng.integers(0, 128, (10,))])   # 2 pages
    p_big = np.concatenate([shared, rng.integers(0, 128, (200,))])    # 3 pages
    new = 4

    ref = PagedMegaBatcher(model, n_slots=1, max_len=512,
                           page_size=128).run_all([p_small, p_big], new)

    # 3 usable pages: after p_small retires, its registered shared page sits
    # on the LRU; p_big resolves it as a hit but then needs 2 fresh pages
    # from {1 free + the hit page itself} — the old code evicted the hit page
    # inside _alloc and crashed mapping it
    pb = PagedMegaBatcher(model, n_slots=1, max_len=512, page_size=128,
                          n_pages=4, prefix_cache=True)
    got = pb.run_all([p_small, p_big], new)
    for rid in ref:
        assert got[rid] == ref[rid]
    # every page accounted for: refcounts all zero, free+LRU = whole pool
    assert (pb.page_refs == 0).all()
    assert sorted(pb.free_pages + list(pb._pc_lru)) == [1, 2, 3]


def test_prefix_cache_rejection_rolls_back_pins_and_stats():
    """An inadmissible request must leave refcounts, the LRU, and the
    hit/miss stats exactly as they were (stats count only admitted work)."""
    model = _mega_model(seed=14)
    rng = np.random.default_rng(41)
    shared = rng.integers(0, 128, (128,))
    p1 = np.concatenate([shared, rng.integers(0, 128, (10,))])

    pb = PagedMegaBatcher(model, n_slots=2, max_len=512, page_size=128,
                          n_pages=3, prefix_cache=True)
    r1 = pb.add_request(p1, max_new_tokens=4)
    assert r1 is not None                                  # uses both pages
    st0 = pb.prefix_cache_stats()
    refs0 = pb.page_refs.copy()
    # shares the prefix but pool is exhausted -> must be rejected cleanly
    p2 = np.concatenate([shared, rng.integers(0, 128, (200,))])
    assert pb.add_request(p2, max_new_tokens=4) is None
    assert pb.prefix_cache_stats() == st0
    assert (pb.page_refs == refs0).all()


@pytest.mark.slow
def test_prefix_cache_composes_with_parallel_sampling():
    """n>1 forks of a cache-hit request: hit pages are shared by every fork
    (refcount == n) and sampling stays deterministic per seed."""
    model = _mega_model(seed=12)
    rng = np.random.default_rng(31)
    p1, p2 = _prompts_with_shared_page(rng, n_tail=2)

    pb = PagedMegaBatcher(model, n_slots=3, max_len=256, page_size=128,
                          prefix_cache=True)
    r1 = pb.add_request(p1, max_new_tokens=8)
    rids = pb.add_request(p2, max_new_tokens=8, n=2, temperature=0.8, seed=7)
    assert r1 is not None and isinstance(rids, list) and len(rids) == 2
    shared_pg = int(pb.table[0, 0])
    assert int(pb.table[1, 0]) == shared_pg == int(pb.table[2, 0])
    assert pb.page_refs[shared_pg] == 3
    while any(r is not None for r in pb.slot_req):
        pb.step()
    assert (pb.page_refs == 0).all()
