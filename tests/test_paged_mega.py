"""Paged batched megakernel == dense batched megakernel, and page recycling
(round 3, VERDICT item 8).

The paged mode changes ONLY where KV blocks are fetched from / scattered to
(a shared page pool indexed through a scalar-prefetched page table,
ops/model_fused.py::model_decode_mega_batch `table=`); compute is identical,
so logits must match the dense batched step exactly and the PagedMegaBatcher
must emit exactly the ContinuousBatcher's greedy sequences while recycling
pages across requests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.serving import init_cache, prefill
from mi_optimize_tpu.serving.batching import ContinuousBatcher
from mi_optimize_tpu.serving.megadecode import (
    init_pool_batched, model_step_batch, model_step_batch_paged,
    stack_cache_batched, stack_serving)
from mi_optimize_tpu.serving.paged import PagedMegaBatcher
from tests.test_model_fused_batch import _mega_model


def test_paged_step_matches_dense_batched():
    """Same state in pool+table vs dense cache -> bit-identical step."""
    model = _mega_model(seed=7)
    cfg = model.config
    stack, meta = stack_serving(model)

    B, P, nt = 2, 128, 2
    T = P * nt
    rng = np.random.default_rng(11)
    positions = np.array([9, 140])  # slot 1 spans two pages
    prompts = [rng.integers(0, 128, (1, int(p))) for p in positions]

    cache = init_cache(cfg, B, T, jnp.int8)
    last = np.zeros((B, 1), np.int64)
    for b, p in enumerate(prompts):
        one = init_cache(cfg, 1, T, jnp.int8)
        logits, one = prefill(model.params, cfg, jnp.asarray(p), one, False)
        last[b, 0] = int(np.argmax(np.asarray(logits[0])))
        for c, o in zip(cache, one):
            for f in c:
                c[f] = c[f].at[b].set(o[f][0])
    sc = stack_cache_batched(cache)

    # mirror the dense cache into a page pool (page t of slot b <- block t)
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

    logits_d, sc2 = model_step_batch(
        model.params, stack, meta, cfg, jnp.asarray(last), sc,
        jnp.asarray(positions), interpret=True)
    logits_p, pool2 = model_step_batch_paged(
        model.params, stack, meta, cfg, jnp.asarray(last), pool,
        jnp.asarray(table), jnp.asarray(positions), interpret=True)

    np.testing.assert_array_equal(np.asarray(logits_p), np.asarray(logits_d))

    # the new KV row landed in the right (page, offset)
    for b in range(B):
        pos = int(positions[b])
        page, off = table[b, pos // P], pos % P
        np.testing.assert_array_equal(
            np.asarray(pool2["k"][:, page, :, off]),
            np.asarray(sc2["k"][:, b, :, pos]))
        np.testing.assert_array_equal(
            np.asarray(pool2["k_scale"][:, page, :, off]),
            np.asarray(sc2["k_scale"][:, b, :, pos]))


@pytest.mark.slow
def test_paged_mega_batcher_recycles_and_matches_dense():
    """4 requests × 2 pages each through a pool with only 5 pages (2 slots):
    completing requests must return pages for the next wave, and every
    emitted greedy sequence must equal the dense ContinuousBatcher's."""
    model = _mega_model(seed=8)
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, 128, (120 + 3 * i,)) for i in range(4)]
    new = 12  # positions cross 128 -> second page allocated lazily mid-run

    dense = ContinuousBatcher(model, n_slots=2, max_len=256,
                              cache_dtype=jnp.int8, use_megakernel=True)
    ref = dense.run_all(list(prompts), max_new_tokens=new)

    # 4 requests x 2 pages = 8 page-uses through a 5-page pool
    pb = PagedMegaBatcher(model, n_slots=2, max_len=256, page_size=128,
                          n_pages=6)
    got = pb.run_all(list(prompts), max_new_tokens=new)

    assert set(got) == set(ref)
    for rid in ref:
        assert got[rid] == ref[rid], f"request {rid} diverged"
    # all pages recycled back to the free list
    assert sorted(pb.free_pages) == list(range(1, 6))
    assert (pb.table == 0).all()


@pytest.mark.slow  # r5 re-tier: fast representative = dryrun_multichip + test_paged_step_matches_dense_batched
def test_paged_tp_matches_single_device():
    """Paged + in-kernel TP (round 3 serving composition): the page-pool
    batched megakernel sharded over 'model' (heads + MLP intermediate, pool
    sharded on Hkv, table replicated, in-kernel ring all-reduces) must match
    the single-device paged step — logits and scattered (page, offset) rows.

    ntp=2 only: wider interpret-mode DMA rings are prohibitively slow on CPU
    (see test_tp_batched_megakernel_matches_single_device)."""
    from mi_optimize_tpu.parallel import make_mesh
    from mi_optimize_tpu.serving.megadecode import (
        model_step_batch_paged_tp, stack_serving_tp)

    model = _mega_model(seed=7)
    cfg = model.config
    stack, meta = stack_serving(model)
    tp = stack_serving_tp(model, 2)
    assert tp is not None
    gstack, meta_tp, _ = tp
    assert meta_tp == meta

    B, P, nt = 2, 128, 2
    T = P * nt
    rng = np.random.default_rng(19)
    positions = np.array([9, 140])
    prompts = [rng.integers(0, 128, (1, int(p))) for p in positions]

    cache = init_cache(cfg, B, T, jnp.int8)
    last = np.zeros((B, 1), np.int64)
    for b, p in enumerate(prompts):
        one = init_cache(cfg, 1, T, jnp.int8)
        logits, one = prefill(model.params, cfg, jnp.asarray(p), one, False)
        last[b, 0] = int(np.argmax(np.asarray(logits[0])))
        for c, o in zip(cache, one):
            for f in c:
                c[f] = c[f].at[b].set(o[f][0])
    sc = stack_cache_batched(cache)

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

    ref_logits, ref_pool = model_step_batch_paged(
        model.params, stack, meta, cfg, jnp.asarray(last), pool,
        jnp.asarray(table), jnp.asarray(positions), interpret=True)

    mesh = make_mesh(n_model=2, n_data=1)
    tp_logits, tp_pool = model_step_batch_paged_tp(
        model.params, gstack, meta, cfg, jnp.asarray(last), pool,
        jnp.asarray(table), jnp.asarray(positions), mesh, interpret=True)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)
    for b in range(B):
        assert (int(np.argmax(np.asarray(tp_logits)[b]))
                == int(np.argmax(np.asarray(ref_logits)[b]))), b
        pos = int(positions[b])
        page, off = table[b, pos // P], pos % P
        for f in ("k", "v"):
            np.testing.assert_array_equal(
                np.asarray(tp_pool[f][:, page, :, off]),
                np.asarray(ref_pool[f][:, page, :, off]))


def test_paged_wave_split_matches_dense():
    """n_slots above the wave size: the batcher must step in wave_slots-
    sized launches over the shared pool (r5: aggregate throughput falls
    beyond ~8 rows/launch on v5e — _wave_size) and still emit exactly the
    dense ContinuousBatcher's greedy sequences, including short final
    waves (pad = repeated slot) and mid-run retirements."""
    model = _mega_model(seed=9)
    rng = np.random.default_rng(17)
    prompts = [rng.integers(0, 128, (100 + 5 * i,)) for i in range(3)]
    new = 10

    dense = ContinuousBatcher(model, n_slots=3, max_len=256,
                              cache_dtype=jnp.int8, use_megakernel=True)
    ref = dense.run_all(list(prompts), max_new_tokens=new)

    pb = PagedMegaBatcher(model, n_slots=3, max_len=256, page_size=128,
                          wave_slots=2)   # 3 slots -> waves of 2 + 1(pad)
    got = pb.run_all(list(prompts), max_new_tokens=new)

    assert set(got) == set(ref)
    for rid in ref:
        assert got[rid] == ref[rid], f"request {rid} diverged"
