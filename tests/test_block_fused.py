"""Decode block megakernel (ops/block_fused.py) equivalence tests.

Validates the one-launch-per-block decode kernel against the stock
block_apply path (fused=False: jnp dequant + XLA attention) in interpret
mode, per SURVEY.md §4.3 (Pallas kernel vs jnp reference equivalence).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.core import packing, qparams
from mi_optimize_tpu.core.qparams import qrange
from mi_optimize_tpu.models import llama
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.models.quant_linear import QuantSpec, QuantizedLinear
from mi_optimize_tpu.serving import fuse_for_serving, init_cache
from mi_optimize_tpu.serving.engine import decode_step, prefill


def _mk_cfg(**kw):
    d = dict(vocab_size=128, hidden_size=512, intermediate_size=1024,
             num_layers=2, num_heads=4, num_kv_heads=2, head_dim=128,
             max_seq_len=64)
    d.update(kw)
    return LlamaConfig(**d)


def _mk_lin(key, out_f, in_f, bits=4, groupsize=128):
    rng = qrange(bits, True)
    spec = QuantSpec(wbit=bits, w_qtype="per_group", w_groupsize=groupsize,
                     w_packed=True)
    w = jax.random.normal(key, (out_f, in_f), jnp.float32) * (in_f ** -0.5)
    fake, scale, zero = qparams.quantize_dequantize(w, bits, "per_group", groupsize)
    ints = qparams.quantize_to_int(fake, scale, zero, bits, "per_group", groupsize)
    packed = packing.pack_weight_device(ints, bits, rng)
    return QuantizedLinear(spec=spec, out_features=out_f, in_features=in_f,
                           packed=packed, w_scale=scale, w_zero=zero)


def _mk_params(cfg, bits=4, groupsize=128, seed=0):
    key = jax.random.PRNGKey(seed)
    h = cfg.hidden_size
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    layers = []
    for _ in range(cfg.num_layers):
        key, *ks = jax.random.split(key, 8)
        layers.append({
            "input_norm": 1.0 + 0.1 * jax.random.normal(ks[5], (h,), jnp.float32),
            "post_norm": 1.0 + 0.1 * jax.random.normal(ks[6], (h,), jnp.float32),
            "q_proj": _mk_lin(ks[0], q_dim, h, bits, groupsize),
            "k_proj": _mk_lin(ks[0], kv_dim, h, bits, groupsize),
            "v_proj": _mk_lin(ks[1], kv_dim, h, bits, groupsize),
            "o_proj": _mk_lin(ks[2], h, q_dim, bits, groupsize),
            "gate_proj": _mk_lin(ks[3], cfg.intermediate_size, h, bits, groupsize),
            "up_proj": _mk_lin(ks[4], cfg.intermediate_size, h, bits, groupsize),
            "down_proj": _mk_lin(ks[2], h, cfg.intermediate_size, bits, groupsize),
        })
    key, k1, k2 = jax.random.split(key, 3)
    return {
        "embed": jax.random.normal(k1, (cfg.vocab_size, h), jnp.float32) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((h,), jnp.float32),
        "lm_head": _mk_lin(k2, cfg.vocab_size, h, bits, groupsize),
    }


@pytest.mark.parametrize("bits,groupsize", [(4, 128), (8, 128), (4, 512)])
def test_block_mega_matches_reference(bits, groupsize):
    cfg = _mk_cfg()
    params = _mk_params(cfg, bits=bits, groupsize=groupsize)
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    blk = model.params["layers"][0]
    assert "mega" in blk, "megakernel should be enabled for this config"
    blk_ref = params["layers"][0]

    T = 128  # megakernel flash phase needs a 128-multiple cache
    pos = 7
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 1, cfg.hidden_size), jnp.float32)
    cache = {
        "k": jax.random.randint(key, (1, T, cfg.num_kv_heads, cfg.head_dim),
                                -90, 90, jnp.int8),
        "v": jax.random.randint(key, (1, T, cfg.num_kv_heads, cfg.head_dim),
                                -90, 90, jnp.int8),
        "k_scale": jnp.abs(jax.random.normal(
            key, (1, T, cfg.num_kv_heads), jnp.float32)) * 0.02 + 1e-3,
        "v_scale": jnp.abs(jax.random.normal(
            key, (1, T, cfg.num_kv_heads), jnp.float32)) * 0.02 + 1e-3,
    }
    cos, sin = llama.rope_tables(cfg, jnp.asarray(pos)[None])
    mask = (jnp.arange(T)[None, :] <= pos)[None, :]

    y_ref, cache_ref, _ = llama.block_apply(
        blk_ref, x, cos, sin, mask, cfg, kv_cache=cache,
        cache_index=jnp.asarray(pos), fused=False)
    y_mega, cache_mega, _ = llama.block_apply(
        blk, x, cos, sin, mask, cfg, kv_cache=cache,
        cache_index=jnp.asarray(pos), fused=True)

    np.testing.assert_allclose(np.asarray(y_mega), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    # appended cache rows match (int8 values may differ by 1 ulp at ties)
    for f in ("k", "v"):
        a = np.asarray(cache_mega[f][0, pos], np.int32)
        b = np.asarray(cache_ref[f][0, pos], np.int32)
        assert np.abs(a - b).max() <= 1
        s_a = np.asarray(cache_mega[f + "_scale"][0, pos])
        s_b = np.asarray(cache_ref[f + "_scale"][0, pos])
        np.testing.assert_allclose(s_a, s_b, rtol=1e-5)
        # untouched slots unchanged
        np.testing.assert_array_equal(
            np.asarray(cache_mega[f][0, :pos]), np.asarray(cache_ref[f][0, :pos]))


def test_generation_with_megakernel_matches_unfused():
    cfg = _mk_cfg()
    params = _mk_params(cfg)
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    assert all("mega" in b for b in model.params["layers"])

    prompt = jnp.asarray([[3, 17, 42, 9, 88, 21, 5, 63]])
    S = prompt.shape[1]

    def run(params_, fused):
        cache = init_cache(cfg, 1, 128, jnp.int8)
        logits, cache = prefill(params_, cfg, prompt, cache, fused)
        toks = []
        tok = jnp.argmax(logits, -1)[:, None]
        for i in range(6):
            toks.append(int(tok[0, 0]))
            logits, cache = decode_step(params_, cfg, tok, cache,
                                        jnp.asarray(S + i), fused)
            tok = jnp.argmax(logits, -1)[:, None]
        return toks

    assert run(model.params, True) == run(params, False)


def test_mega_not_enabled_for_unaligned_shapes():
    cfg = _mk_cfg(hidden_size=256, num_heads=2, intermediate_size=512)
    params = _mk_params(cfg, groupsize=64)
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    assert all("mega" not in b for b in model.params["layers"])
    # and the fallback path still decodes
    cache = init_cache(cfg, 1, 16, jnp.int8)
    logits, cache = prefill(model.params, cfg, jnp.asarray([[1, 2, 3]]), cache, True)
    assert logits.shape == (1, cfg.vocab_size)


@pytest.mark.parametrize("pos", [0, 127, 130, 255])
def test_block_mega_flash_multiblock(pos):
    """Flash phase across multiple 128-token history blocks (incl. the
    live-prefix clamp skipping dead blocks, and pos exactly on a boundary)."""
    cfg = _mk_cfg(max_seq_len=512)
    params = _mk_params(cfg)
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    blk = model.params["layers"][0]
    blk_ref = params["layers"][0]

    T = 256
    key = jax.random.PRNGKey(pos + 1)
    x = jax.random.normal(key, (1, 1, cfg.hidden_size), jnp.float32)
    cache = {
        "k": jax.random.randint(key, (1, T, cfg.num_kv_heads, cfg.head_dim),
                                -90, 90, jnp.int8),
        "v": jax.random.randint(key, (1, T, cfg.num_kv_heads, cfg.head_dim),
                                -90, 90, jnp.int8),
        "k_scale": jnp.abs(jax.random.normal(
            key, (1, T, cfg.num_kv_heads), jnp.float32)) * 0.02 + 1e-3,
        "v_scale": jnp.abs(jax.random.normal(
            key, (1, T, cfg.num_kv_heads), jnp.float32)) * 0.02 + 1e-3,
    }
    cos, sin = llama.rope_tables(cfg, jnp.asarray(pos)[None])
    mask = (jnp.arange(T)[None, :] <= pos)[None, :]
    y_ref, _, _ = llama.block_apply(
        blk_ref, x, cos, sin, mask, cfg, kv_cache=cache,
        cache_index=jnp.asarray(pos), fused=False)
    y_mega, _, _ = llama.block_apply(
        blk, x, cos, sin, mask, cfg, kv_cache=cache,
        cache_index=jnp.asarray(pos), fused=True)
    np.testing.assert_allclose(np.asarray(y_mega), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
