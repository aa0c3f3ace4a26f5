"""Multi-token FLAT segment kernel (round 5): k greedy tokens per launch
with in-kernel next-token embedding DMA and VMEM segment attention, vs the
per-token flat kernel. Interpret mode, f32 — greedy tokens must match
exactly and the KV rows written for the segment must equal the per-token
path's rows (both store int8-rounded values)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mi_optimize_tpu.serving import init_cache, prefill
from mi_optimize_tpu.serving.flatdecode import (
    _flat_seg_step, decode_loop_flat, decode_loop_flat_seg, stack_cache_flat,
    stack_flat)
from tests.test_model_flat import _flat_model


def _prep(seed=3, prompt_len=17, T=256):
    model = _flat_model(seed=seed)
    cfg = model.config
    fstack, fmeta = stack_flat(model)
    rng = np.random.default_rng(seed + 100)
    prompt = rng.integers(0, cfg.vocab_size, (1, prompt_len))
    cache = init_cache(cfg, 1, T, jnp.int8)
    logits, cache = prefill(model.params, cfg, jnp.asarray(prompt), cache,
                            False)
    tok = jnp.argmax(logits, -1)[:, None]
    return model, fstack, fmeta, tok, stack_cache_flat(cache), prompt.shape[1]


def test_seg_matches_per_token_flat():
    model, fstack, fmeta, tok, cache, pos0 = _prep()
    cfg = model.config
    kseg, nseg = 4, 2
    n = kseg * nseg

    ref_toks, ref_cache = decode_loop_flat(
        model.params, fstack, fmeta, cfg, tok, cache, jnp.asarray(pos0), n,
        interpret=True)
    got_toks, got_cache = decode_loop_flat_seg(
        model.params, fstack, fmeta, cfg, tok, cache, jnp.asarray(pos0), n,
        kseg=kseg, interpret=True)

    assert np.asarray(got_toks).tolist() == np.asarray(ref_toks).tolist()
    # the segment path's cache rows (int8 + scales) must match bit-exactly
    sl = slice(pos0, pos0 + n)
    np.testing.assert_array_equal(np.asarray(got_cache["kv"][:, sl]),
                                  np.asarray(ref_cache["kv"][:, sl]))
    np.testing.assert_allclose(np.asarray(got_cache["kv_scale"][:, sl]),
                               np.asarray(ref_cache["kv_scale"][:, sl]),
                               rtol=1e-6)


@pytest.mark.slow  # r5 re-tier: fast representative = test_seg_matches_per_token_flat
def test_seg_single_launch_continues_sequence():
    """One kseg=6 launch equals six per-token launches, and a SECOND segment
    launched from the scattered cache continues identically (validates that
    segment attention + the one-shot scatter reproduce the incremental
    cache)."""
    model, fstack, fmeta, tok, cache, pos0 = _prep(seed=9, prompt_len=23)
    cfg = model.config
    k = 6

    ref_toks, _ = decode_loop_flat(model.params, fstack, fmeta, cfg, tok,
                                   cache, jnp.asarray(pos0), 2 * k,
                                   interpret=True)
    toks1, cache1 = _flat_seg_step(model.params, fstack, fmeta, cfg, tok,
                                   cache, pos0, k, True)
    toks2, _ = _flat_seg_step(model.params, fstack, fmeta, cfg,
                              toks1[k - 1].reshape(1, 1), cache1, pos0 + k,
                              k, True)
    got = np.asarray(toks1).tolist() + np.asarray(toks2).tolist()
    assert got == np.asarray(ref_toks[0]).tolist()
