"""Whole-model CHUNK megakernel == per-layer prefill_chunk (round 3).

model_step_chunk scores C consecutive tokens of one sequence in one pallas
launch (intra-chunk causal attention inside the kernel, shared history blocks
streamed once). It must match the per-layer prefill_chunk path: same greedy
verdicts per chunk position, same written KV rows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.serving import init_cache, prefill
from mi_optimize_tpu.serving.engine import prefill_chunk
from mi_optimize_tpu.serving.megadecode import (
    model_step_chunk, stack_cache_batched, stack_serving)
from tests.test_model_fused_batch import _mega_model


@pytest.mark.slow  # r5 re-tier: fast representative = test_chunk_mega_batched_matches_per_slot
def test_chunk_mega_matches_prefill_chunk():
    model = _mega_model(seed=9)
    cfg = model.config
    stack, meta = stack_serving(model)
    rng = np.random.default_rng(17)
    T, S, C = 256, 70, 5
    prompt = rng.integers(0, 128, (1, S))
    chunk = rng.integers(0, 128, (1, C))

    # reference: per-layer fp prefill + prefill_chunk
    ref_cache = init_cache(cfg, 1, T, jnp.float32)
    _, ref_cache = prefill(model.params, cfg, jnp.asarray(prompt), ref_cache,
                           False)
    ref_logits, ref_c2 = prefill_chunk(model.params, cfg, jnp.asarray(chunk),
                                       ref_cache, jnp.asarray(S), False)
    ref_logits = np.asarray(ref_logits[0])                    # [C, V]

    # chunk megakernel: int8 1-slot stacked cache
    one = init_cache(cfg, 1, T, jnp.int8)
    _, one = prefill(model.params, cfg, jnp.asarray(prompt), one, False)
    sc = stack_cache_batched(one)
    logits, sc2 = model_step_chunk(model.params, stack, meta, cfg,
                                   jnp.asarray(chunk), sc, jnp.asarray(S),
                                   interpret=True)
    logits = np.asarray(logits)

    assert logits.shape == ref_logits.shape
    np.testing.assert_allclose(logits, ref_logits, rtol=3e-2, atol=3e-2)
    for c in range(C):
        assert int(np.argmax(logits[c])) == int(np.argmax(ref_logits[c])), c

    # the C rows landed at prefix..prefix+C-1 (dequantized ≈ the fp rows)
    kq = np.asarray(sc2["k"][0, 0, :, S:S + C]).astype(np.float32)
    ks = np.asarray(sc2["k_scale"][0, 0, :, S:S + C])
    ref_rows = np.asarray(ref_c2[0][0][0, S:S + C])           # [C, Hkv, D]
    np.testing.assert_allclose(kq * ks[..., None],
                               np.swapaxes(ref_rows, 0, 1),
                               rtol=5e-2, atol=5e-2)
    # nothing written past the chunk
    assert np.abs(np.asarray(sc2["k"][0, 0, :, S + C:])).sum() == 0


def test_chunk_mega_batched_matches_per_slot():
    """B-slot chunk verify (one launch) == per-slot single-chunk calls."""
    from mi_optimize_tpu.serving.megadecode import model_step_chunk_batch

    model = _mega_model(seed=11)
    cfg = model.config
    stack, meta = stack_serving(model)
    rng = np.random.default_rng(23)
    B, T, C = 2, 128, 4
    prefixes = np.array([9, 41])
    chunks = rng.integers(0, 128, (B, C))

    slot_caches = []
    ref_logits = []
    for b in range(B):
        one = init_cache(cfg, 1, T, jnp.int8)
        p = rng.integers(0, 128, (1, int(prefixes[b])))
        _, one = prefill(model.params, cfg, jnp.asarray(p), one, False)
        sc1 = stack_cache_batched(one)
        lg, _ = model_step_chunk(model.params, stack, meta, cfg,
                                 jnp.asarray(chunks[b:b + 1]), sc1,
                                 jnp.asarray(int(prefixes[b])), interpret=True)
        ref_logits.append(np.asarray(lg))
        slot_caches.append(sc1)

    cache = {f: jnp.concatenate([c[f] for c in slot_caches], axis=1)
             for f in slot_caches[0]}
    logits, c2 = model_step_chunk_batch(
        model.params, stack, meta, cfg, jnp.asarray(chunks), cache,
        jnp.asarray(prefixes), interpret=True)
    logits = np.asarray(logits)
    for b in range(B):
        np.testing.assert_allclose(logits[b], ref_logits[b],
                                   rtol=1e-4, atol=1e-4, err_msg=f"slot {b}")
        # rows written at the slot's own prefix range, not beyond
        assert np.abs(np.asarray(
            c2["k"][0, b, :, prefixes[b] + C:])).sum() == 0


@pytest.mark.slow
def test_spec_batcher_mega_verify_matches_dense():
    """SpeculativeBatcher with the chunk-megakernel verify emits exactly the
    dense megakernel ContinuousBatcher's greedy sequences."""
    from mi_optimize_tpu.serving.batching import (
        ContinuousBatcher, SpeculativeBatcher)

    model = _mega_model(seed=12)
    rng = np.random.default_rng(29)
    prompts = [rng.integers(0, 128, (10 + 3 * i,)) for i in range(3)]

    dense = ContinuousBatcher(model, n_slots=2, max_len=256,
                              cache_dtype=jnp.int8, use_megakernel=True)
    ref = dense.run_all(list(prompts), max_new_tokens=8)

    sb = SpeculativeBatcher(model, model, k=3, n_slots=2, max_len=256,
                            cache_dtype=jnp.int8, use_megakernel=True,
                            use_draft_megakernel=True)
    got = sb.run_all(list(prompts), max_new_tokens=8)
    assert set(got) == set(ref)
    for rid in ref:
        assert got[rid] == ref[rid], f"request {rid} diverged"
    # draft == target: every proposal accepted
    assert sb.accepted == sb.proposed


def test_chunk_mega_empty_history():
    """prefix at the very start of a sequence: only intra-chunk attention."""
    model = _mega_model(seed=10)
    cfg = model.config
    stack, meta = stack_serving(model)
    rng = np.random.default_rng(19)
    T, C = 128, 4
    chunk = rng.integers(0, 128, (1, C))

    ref_cache = init_cache(cfg, 1, T, jnp.float32)
    ref_logits, _ = prefill_chunk(model.params, cfg, jnp.asarray(chunk),
                                  ref_cache, jnp.asarray(0), False)
    ref_logits = np.asarray(ref_logits[0])

    sc = stack_cache_batched(init_cache(cfg, 1, T, jnp.int8))
    logits, _ = model_step_chunk(model.params, stack, meta, cfg,
                                 jnp.asarray(chunk), sc, jnp.asarray(0),
                                 interpret=True)
    logits = np.asarray(logits)
    # tolerance: the kernel's intra-chunk rows go through the int8 KV grid
    # (like every cached row) while the per-layer reference keeps the chunk's
    # own k/v in fp — inherent ~raw-quantization-level noise, and argmax may
    # flip only on a near-tie
    np.testing.assert_allclose(logits, ref_logits, rtol=6e-2, atol=6e-2)
    for c in range(C):
        pick = int(np.argmax(logits[c]))
        gap = float(ref_logits[c].max() - ref_logits[c][pick])
        assert gap < 0.06, (c, gap)
