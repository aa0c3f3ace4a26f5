"""Batched whole-model megakernel == per-slot single-stream decode (interpret).

The B-slot kernel (ops/model_fused.py::model_decode_mega_batch) streams every
weight block once for all slots; each slot must still produce exactly what the
B=1 whole-model kernel (and the unfused path) produces for its own prefix and
position.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill
from mi_optimize_tpu.serving.megadecode import (
    model_step_batch, stack_cache_batched, stack_serving, unstack_cache_batched)
from tests.test_block_fused import _mk_cfg, _mk_params


def _mega_model(seed=0, **cfg_kw):
    cfg = _mk_cfg(num_layers=2, max_seq_len=512, **cfg_kw)
    return fuse_for_serving(Model(config=cfg, params=_mk_params(cfg, seed=seed),
                                  family="llama"))


@pytest.mark.parametrize("B", [2, 4])
def test_batched_megakernel_matches_per_slot(B):
    model = _mega_model()
    cfg = model.config
    st = stack_serving(model)
    assert st is not None, "megakernel contract not satisfied"
    stack, meta = st

    rng = np.random.default_rng(3)
    T = 128
    positions = np.array([5 + 11 * b for b in range(B)])
    prompts = [rng.integers(0, 128, (1, int(p))) for p in positions]

    # per-slot prefill into a B-slot cache (positions differ per slot)
    cache = init_cache(cfg, B, T, jnp.int8)
    last = np.zeros((B, 1), np.int64)
    for b, p in enumerate(prompts):
        one = init_cache(cfg, 1, T, jnp.int8)
        logits, one = prefill(model.params, cfg, jnp.asarray(p), one, False)
        last[b, 0] = int(np.argmax(np.asarray(logits[0])))
        for c, o in zip(cache, one):
            for f in c:
                c[f] = c[f].at[b].set(o[f][0])

    # reference: B=1 single-slot decode per slot (unfused path on CPU)
    from mi_optimize_tpu.serving.engine import decode_step

    ref_logits = []
    for b in range(B):
        slot_cache = [{f: c[f][b:b + 1] for f in c} for c in cache]
        lg, _ = decode_step(model.params, cfg, jnp.asarray(last[b:b + 1]),
                            slot_cache, jnp.asarray(int(positions[b])), False)
        ref_logits.append(np.asarray(lg[0]))

    sc = stack_cache_batched(cache)
    logits_b, sc2 = model_step_batch(
        model.params, stack, meta, cfg, jnp.asarray(last), sc,
        jnp.asarray(positions), interpret=True)
    logits_b = np.asarray(logits_b)

    # 4e-2: the batched kernel's grouped dot runs a single bf16 MXU pass
    # for bsz>1 (r5, MI_DEQ_DOT_B — the f32 3-pass dot was the batched
    # step's binding MXU cost); activations round at 2^-9 on top of the
    # int4 grid, worst logit measured 3.3e-2 rel in interpret mode
    for b in range(B):
        np.testing.assert_allclose(logits_b[b], ref_logits[b],
                                   rtol=4e-2, atol=4e-2, err_msg=f"slot {b}")
        assert int(np.argmax(logits_b[b])) == int(np.argmax(ref_logits[b])), b

    # per-slot KV rows landed at each slot's own position
    back = unstack_cache_batched(sc2, cfg.num_layers)
    for b in range(B):
        row = np.asarray(back[0]["k"][b, int(positions[b])])
        assert np.abs(row).sum() > 0, f"slot {b} row not written"
        ahead = np.asarray(back[0]["k"][b, int(positions[b]) + 1:])
        assert np.abs(ahead).sum() == 0, f"slot {b} wrote past its position"


def test_batched_megakernel_multi_step_greedy():
    """3 greedy steps through the batched kernel == per-slot generate."""
    model = _mega_model(seed=1)
    cfg = model.config
    stack, meta = stack_serving(model)
    rng = np.random.default_rng(5)
    B, T = 2, 128
    positions = np.array([7, 19])
    prompts = [rng.integers(0, 128, (1, int(p))) for p in positions]

    from mi_optimize_tpu.serving import generate

    refs = [generate(model, p, max_new_tokens=4, fused=False,
                     cache_dtype=jnp.int8, max_len=T)[0, p.shape[1]:]
            for p in prompts]

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
    pos = jnp.asarray(positions)
    toks = [last[:, 0].copy()]
    cur = jnp.asarray(last)
    for _ in range(3):
        logits, sc = model_step_batch(model.params, stack, meta, cfg, cur, sc,
                                      pos, interpret=True)
        cur = jnp.argmax(logits, -1).astype(cur.dtype)[:, None]
        pos = pos + 1
        toks.append(np.asarray(cur[:, 0]))
    got = np.stack(toks, axis=1)  # [B, 4]
    for b in range(B):
        np.testing.assert_array_equal(got[b], np.asarray(refs[b]),
                                      err_msg=f"slot {b}")


def test_continuous_batcher_megakernel_path():
    """ContinuousBatcher with use_megakernel=True: per-request tokens match
    generate(), including a mid-flight join (interpret mode on CPU)."""
    from mi_optimize_tpu.serving import generate
    from mi_optimize_tpu.serving.batching import ContinuousBatcher

    model = _mega_model(seed=2)
    rng = np.random.default_rng(7)
    p1 = rng.integers(0, 128, (9,))
    p2 = rng.integers(0, 128, (14,))
    p3 = rng.integers(0, 128, (6,))
    ref = {i: list(generate(model, p[None, :], max_new_tokens=4, fused=False,
                            cache_dtype=jnp.int8, max_len=128)[0, len(p):])
           for i, p in enumerate([p1, p2, p3])}

    b = ContinuousBatcher(model, n_slots=2, max_len=128, fused=True,
                          cache_dtype=jnp.int8, use_megakernel=True)
    assert b._mega is not None
    r1 = b.add_request(p1, max_new_tokens=4)
    r2 = b.add_request(p2, max_new_tokens=4)
    reqs = {r1: b.slot_req[0], r2: b.slot_req[1]}
    r3 = req3 = None
    for _ in range(20):
        b.step()
        if r3 is None and None in b.slot_req:
            r3 = b.add_request(p3, max_new_tokens=4)
            req3 = [r for r in b.slot_req if r and r.rid == r3][0]
        if all(s is None for s in b.slot_req):
            break
    assert reqs[r1].tokens == ref[0]
    assert reqs[r2].tokens == ref[1]
    assert req3 is not None and req3.tokens == ref[2]


@pytest.mark.slow  # r5 re-tier: fast representative = dryrun_multichip TP-megakernel exactness
@pytest.mark.parametrize("ntp", [2])
def test_tp_batched_megakernel_matches_single_device(ntp):
    """TENSOR-PARALLEL batched megakernel (heads + MLP intermediate sharded,
    in-kernel ring all-reduce of the o/down partials over simulated remote
    DMAs) == the single-device batched kernel, logits and KV rows.

    ntp=2 only: the TPU-interpret DMA simulation makes wider rings
    prohibitively slow on CPU (ntp=4 ran >25 min); the ring loop is
    D-generic (same code path as parallel/overlap.py, tested at D=4)."""
    from mi_optimize_tpu.parallel import make_mesh
    from mi_optimize_tpu.serving.megadecode import (
        model_step_batch_tp, stack_serving_tp)

    model = _mega_model(seed=3)
    cfg = model.config
    stack, meta = stack_serving(model)
    tp = stack_serving_tp(model, ntp)
    assert tp is not None, "TP sharding contract not satisfied"
    gstack, meta_tp, _ = tp
    assert meta_tp == meta

    rng = np.random.default_rng(9)
    B, T = 2, 128
    positions = np.array([6, 17])
    cache = init_cache(cfg, B, T, jnp.int8)
    last = np.zeros((B, 1), np.int64)
    prompts = [rng.integers(0, 128, (1, int(p))) for p in positions]
    for b, p in enumerate(prompts):
        one = init_cache(cfg, 1, T, jnp.int8)
        logits, one = prefill(model.params, cfg, jnp.asarray(p), one, False)
        last[b, 0] = int(np.argmax(np.asarray(logits[0])))
        for c, o in zip(cache, one):
            for f in c:
                c[f] = c[f].at[b].set(o[f][0])

    sc = stack_cache_batched(cache)
    ref_logits, ref_cache = model_step_batch(
        model.params, stack, meta, cfg, jnp.asarray(last), sc,
        jnp.asarray(positions), interpret=True)

    mesh = make_mesh(n_model=ntp, n_data=1)
    tp_logits, tp_cache = model_step_batch_tp(
        model.params, gstack, meta, cfg, jnp.asarray(last), sc,
        jnp.asarray(positions), mesh, interpret=True)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)
    for b in range(B):
        assert (int(np.argmax(np.asarray(tp_logits)[b]))
                == int(np.argmax(np.asarray(ref_logits)[b]))), b
    # KV rows written at each slot's position match the single-device kernel
    for f in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(tp_cache[f][:, 0, :, int(positions[0])]),
            np.asarray(ref_cache[f][:, 0, :, int(positions[0])]))
