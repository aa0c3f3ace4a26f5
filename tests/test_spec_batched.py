"""B-slot speculative decoding composed with continuous batching (round 3,
VERDICT item 4).

1. `prefill_chunk_batched` (per-slot chunk positions) is token-exact against
   per-slot `prefill_chunk` — the batched-verify primitive.
2. `SpeculativeBatcher` emits exactly the plain ContinuousBatcher's greedy
   sequences (greedy spec-dec is exact), with draft==target and a degraded
   draft, on the XLA draft path and on the batched draft megakernel.
3. `speculative_generate(draft_megakernel=True)` (single-stream megakernel
   drafting) matches plain greedy generate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import generate, init_cache, prefill
from mi_optimize_tpu.serving.batching import ContinuousBatcher, SpeculativeBatcher
from mi_optimize_tpu.serving.engine import prefill_chunk, prefill_chunk_batched
from tests.test_model_fused_batch import _mega_model


def test_prefill_chunk_batched_matches_per_slot():
    """Batched verify == per-slot prefill_chunk: logits and written KV rows."""
    m = Model.tiny_llama()
    cfg = m.config
    rng = np.random.default_rng(5)
    B, C, T = 2, 3, 64
    positions = np.array([6, 11])
    prompts = [rng.integers(0, 256, (1, int(p))) for p in positions]
    chunks = rng.integers(0, 256, (B, C))

    # reference: per-slot caches, scalar-pos prefill_chunk
    ref_logits, ref_rows = [], []
    slot_caches = []
    for b in range(B):
        cache = init_cache(cfg, 1, T, jnp.float32)
        _, cache = prefill(m.params, cfg, jnp.asarray(prompts[b]), cache, False)
        slot_caches.append(cache)
        lg, c2 = prefill_chunk(m.params, cfg, jnp.asarray(chunks[b:b + 1]),
                               cache, jnp.asarray(int(positions[b])), False)
        ref_logits.append(np.asarray(lg[0]))
        ref_rows.append(np.asarray(
            c2[0][0][0, positions[b]:positions[b] + C]))  # layer-0 k rows

    # batched: one shared B-slot cache
    cache = init_cache(cfg, B, T, jnp.float32)
    cache = [tuple(
        jnp.concatenate([slot_caches[b][l][i] for b in range(B)], axis=0)
        for i in range(2)) for l in range(cfg.num_layers)]
    logits, c2 = prefill_chunk_batched(
        m.params, cfg, jnp.asarray(chunks), cache, jnp.asarray(positions),
        False)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(logits[b]), ref_logits[b],
                                   rtol=1e-5, atol=1e-5)
        assert (np.argmax(np.asarray(logits[b]), -1)
                == np.argmax(ref_logits[b], -1)).all()
        np.testing.assert_allclose(
            np.asarray(c2[0][0][b, positions[b]:positions[b] + C]),
            ref_rows[b], rtol=1e-5, atol=1e-5)


def _run_batcher(b, prompts, n_new):
    reqs = []
    for p in prompts:
        rid = b.add_request(p, max_new_tokens=n_new)
        reqs.append([r for r in b.slot_req if r and r.rid == rid][0])
    for _ in range(40):
        b.step()
        if all(s is None for s in b.slot_req):
            break
    return [r.tokens for r in reqs]


def test_speculative_batcher_exact_xla_draft():
    """Spec batcher (XLA draft path) == plain batcher, draft == target and a
    degraded int8 draft."""
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.quant.config import QuantConfig

    m = Model.tiny_llama()
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 256, (6,)), rng.integers(0, 256, (9,))]

    ref = _run_batcher(
        ContinuousBatcher(m, n_slots=2, max_len=64, fused=False,
                          use_megakernel=False), prompts, 6)

    got = _run_batcher(
        SpeculativeBatcher(m, m, k=2, n_slots=2, max_len=64, fused=False,
                           use_draft_megakernel=False), prompts, 6)
    assert got == ref

    draft = mt.quantize(m, QuantConfig(algo="rtn", wbit="int8",
                                       w_qtype="per_channel", pack=False),
                        calib_data=[prompts[0][None, :]])
    b = SpeculativeBatcher(m, draft, k=2, n_slots=2, max_len=64, fused=False,
                           use_draft_megakernel=False)
    got2 = _run_batcher(b, prompts, 6)
    assert got2 == ref
    assert b.rounds > 0 and 0 <= b.accepted <= b.proposed


@pytest.mark.slow
def test_speculative_batcher_megakernel_draft():
    """Spec batcher drafting on the BATCHED whole-model megakernel (interpret)
    == plain batcher on the same packed model."""
    model = _mega_model(seed=2)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 128, (5,)), rng.integers(0, 128, (8,))]

    ref = _run_batcher(
        ContinuousBatcher(model, n_slots=2, max_len=128, fused=False,
                          use_megakernel=False), prompts, 4)

    b = SpeculativeBatcher(model, model, k=2, n_slots=2, max_len=128,
                           fused=False, use_draft_megakernel=True)
    assert b._dmega is not None, "draft megakernel contract must hold"
    got = _run_batcher(b, prompts, 4)
    assert got == ref


@pytest.mark.slow  # r5 re-tier: fast representative = test_planted.py::test_spec_scan_flat_segments_exact
def test_speculative_generate_megakernel_draft():
    """Single-stream spec-dec with megakernel drafting == plain greedy."""
    from mi_optimize_tpu.serving.speculative import speculative_generate

    model = _mega_model(seed=4)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 128, (1, 7))
    ref = generate(model, prompt, max_new_tokens=6, fused=False)

    out, stats = speculative_generate(model, model, prompt, max_new_tokens=6,
                                      k=2, fused=False, draft_megakernel=True)
    assert stats.get("draft_megakernel") is True
    np.testing.assert_array_equal(out, ref)
