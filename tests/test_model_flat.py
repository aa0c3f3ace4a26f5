"""FLAT whole-model megakernel (round 4): all layers + fused lm_head +
in-kernel argmax in one launch, vs the model_fused kernel + XLA lm_head.

Both run in interpret mode on CPU with f32 math, so greedy tokens must match
exactly and logits to tight tolerance (the summation orders differ: the flat
kernel accumulates the unembed in CH-sized K chunks)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill
from mi_optimize_tpu.serving.flatdecode import (
    decode_loop_flat, stack_cache_flat, stack_flat)
from mi_optimize_tpu.serving.megadecode import (
    decode_loop_model, stack_cache, stack_serving)
from tests.test_block_fused import _mk_cfg, _mk_params


def _flat_model(seed=0, bits=4, groupsize=128, **cfg_kw):
    cfg = _mk_cfg(num_layers=2, max_seq_len=512, **cfg_kw)
    params = _mk_params(cfg, bits=bits, groupsize=groupsize, seed=seed)
    return fuse_for_serving(Model(config=cfg, params=params, family="llama"))


@pytest.mark.parametrize("bits,groupsize", [
    (4, 128),
    pytest.param(8, 128, marks=pytest.mark.slow),
])
def test_flat_matches_model_fused(bits, groupsize):
    model = _flat_model(seed=3, bits=bits, groupsize=groupsize)
    cfg = model.config
    st = stack_serving(model)
    assert st is not None
    fl = stack_flat(model, st)
    assert fl is not None, "flat contract should hold for this config"
    fstack, fmeta = fl

    rng = np.random.default_rng(7)
    T, n_dec = 256, 6
    prompt = rng.integers(0, cfg.vocab_size, (1, 19))
    cache = init_cache(cfg, 1, T, jnp.int8)
    logits, cache = prefill(model.params, cfg, jnp.asarray(prompt), cache,
                            False)
    tok = jnp.argmax(logits, -1)[:, None]
    pos0 = jnp.asarray(prompt.shape[1])

    stack, meta = st
    ref_toks, _ = decode_loop_model(model.params, stack, meta, cfg, tok,
                                    stack_cache(cache), pos0, n_dec,
                                    interpret=True)
    got_toks, _ = decode_loop_flat(model.params, fstack, fmeta, cfg, tok,
                                   stack_cache_flat(cache), pos0, n_dec,
                                   interpret=True)
    assert np.asarray(got_toks).tolist() == np.asarray(ref_toks).tolist()


def test_flat_logits_and_argmax_per_step():
    """Step-level: the flat kernel's logits row equals rms_norm+unembed of
    the model_fused residual output, and its in-kernel argmax equals
    jnp.argmax of its own logits (first-index tie-break)."""
    from mi_optimize_tpu.models import llama
    from mi_optimize_tpu.ops.model_fused import model_decode_mega
    from mi_optimize_tpu.serving.flatdecode import _flat_step

    model = _flat_model(seed=11)
    cfg = model.config
    stack, meta = stack_serving(model)
    fstack, fmeta = stack_flat(model)

    rng = np.random.default_rng(13)
    T = 256
    prompt = rng.integers(0, cfg.vocab_size, (1, 33))
    cache = init_cache(cfg, 1, T, jnp.int8)
    logits, cache = prefill(model.params, cfg, jnp.asarray(prompt), cache,
                            False)
    tok = jnp.argmax(logits, -1)[:, None]
    pos = jnp.asarray(prompt.shape[1])

    # reference: model_fused kernel + out-of-kernel rms/unembed
    scache = stack_cache(cache)
    x = llama.embed(model.params, tok)
    cos, sin = llama.rope_tables(cfg, pos[None])
    xo, *_ = model_decode_mega(
        stack, x, cos.reshape(-1)[-cfg.head_dim:],
        sin.reshape(-1)[-cfg.head_dim:], scache, pos, cfg, meta,
        interpret=True)
    h = llama.rms_norm(xo, model.params["final_norm"], cfg.rms_eps)
    ref_logits = np.asarray(
        llama.unembed(model.params, cfg, h, fused=False)[0, 0])

    nt, got_logits, _ = _flat_step(model.params, fstack, fmeta, cfg, tok,
                                   stack_cache_flat(cache), pos, True)
    got_logits = np.asarray(got_logits[0])
    np.testing.assert_allclose(got_logits, ref_logits, rtol=2e-4, atol=2e-4)
    assert int(nt) == int(np.argmax(got_logits))


def test_flat_matches_unfused_generate():
    """End-to-end greedy sequence vs the unfused per-layer engine path."""
    from mi_optimize_tpu.serving import generate

    model = _flat_model(seed=5)
    cfg = model.config
    fstack, fmeta = stack_flat(model)

    rng = np.random.default_rng(23)
    prompt = rng.integers(0, cfg.vocab_size, (1, 12))
    n_dec = 5
    T = 256

    ref = generate(model, prompt, max_new_tokens=n_dec, fused=False,
                   cache_dtype=jnp.int8, max_len=T)[0, prompt.shape[1]:]

    cache = init_cache(cfg, 1, T, jnp.int8)
    logits, cache = prefill(model.params, cfg, jnp.asarray(prompt), cache,
                            False)
    tok = jnp.argmax(logits, -1)[:, None]
    toks, _ = decode_loop_flat(model.params, fstack, fmeta, cfg, tok,
                               stack_cache_flat(cache),
                               jnp.asarray(prompt.shape[1]), n_dec - 1,
                               interpret=True)
    got = [int(tok[0, 0])] + np.asarray(toks[0]).tolist()
    assert got == np.asarray(ref).tolist()


def test_flat_fallback_on_asymmetric():
    """Asymmetric grids (varying zeros) must be rejected by stack_flat."""
    model = _flat_model(seed=9)
    lm = model.params["lm_head"]
    z = jnp.asarray(lm.w_zero)
    model.params["lm_head"] = lm.replace(
        w_zero=z.at[jnp.unravel_index(0, z.shape)].add(1.0))
    assert stack_flat(model) is None
