"""Whole-model decode kernel (ops/model_fused.py) equivalence tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving, init_cache
from mi_optimize_tpu.serving.engine import decode_loop, prefill
from mi_optimize_tpu.serving.megadecode import (
    decode_loop_model,
    stack_cache,
    stack_serving,
)
from tests.test_block_fused import _mk_cfg, _mk_params


@pytest.mark.slow  # r5 re-tier: fast representative = test_model_flat.py::test_flat_matches_unfused_generate (truth chain via flat)
def test_model_kernel_matches_per_layer_loop():
    cfg = _mk_cfg(num_layers=3)
    params = _mk_params(cfg)
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    st = stack_serving(model)
    assert st is not None
    stack, meta = st

    prompt = jnp.asarray([[3, 17, 42, 9, 88, 21, 5, 63]])
    S = prompt.shape[1]
    n = 6

    cache = init_cache(cfg, 1, 128, jnp.int8)
    logits, cache = prefill(model.params, cfg, prompt, cache, True)
    tok = jnp.argmax(logits, -1)[:, None]

    toks_ref, _ = decode_loop(model.params, cfg, tok, cache, jnp.asarray(S), n, True)

    scache = stack_cache(cache)
    toks_mega, scache2 = decode_loop_model(
        model.params, stack, meta, cfg, tok, scache, jnp.asarray(S), n,
        interpret=jax.default_backend() != "tpu")

    assert toks_mega.tolist() == toks_ref.tolist()
    # cache rows written at the decoded positions
    assert int(jnp.abs(scache2["k"][:, S:S + n]).sum()) > 0


@pytest.mark.slow
def test_model_kernel_padded_intermediate():
    """inter % TIM != 0 exercises the zero-padded MLP tail tile."""
    cfg = _mk_cfg(num_layers=2, intermediate_size=1280)  # pads to 1536
    params = _mk_params(cfg)
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    st = stack_serving(model)
    assert st is not None
    stack, meta = st

    prompt = jnp.asarray([[5, 9, 101, 44, 2, 77, 13, 60]])
    S = prompt.shape[1]
    cache = init_cache(cfg, 1, 128, jnp.int8)
    logits, cache = prefill(model.params, cfg, prompt, cache, True)
    tok = jnp.argmax(logits, -1)[:, None]

    toks_ref, _ = decode_loop(model.params, cfg, tok, cache, jnp.asarray(S), 5, True)
    scache = stack_cache(cache)
    toks_mega, _ = decode_loop_model(
        model.params, stack, meta, cfg, tok, scache, jnp.asarray(S), 5,
        interpret=jax.default_backend() != "tpu")
    assert toks_mega.tolist() == toks_ref.tolist()


def test_model_kernel_long_cache_tb256():
    """max_len >= 1024 engages the 256-token adaptive flash block."""
    cfg = _mk_cfg(num_layers=2)
    params = _mk_params(cfg)
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    stack, meta = stack_serving(model)

    prompt = jnp.asarray([[7, 3, 19, 250, 4, 99, 6, 42]])
    S = prompt.shape[1]
    cache = init_cache(cfg, 1, 1024, jnp.int8)
    logits, cache = prefill(model.params, cfg, prompt, cache, True)
    tok = jnp.argmax(logits, -1)[:, None]

    # stock jnp path (fused=False) as the oracle: both kernels use tb=256 here
    toks_ref, _ = decode_loop(model.params, cfg, tok, cache, jnp.asarray(S), 4, False)
    scache = stack_cache(cache)
    toks_mega, _ = decode_loop_model(
        model.params, stack, meta, cfg, tok, scache, jnp.asarray(S), 4,
        interpret=jax.default_backend() != "tpu")
    assert toks_mega.tolist() == toks_ref.tolist()


def test_stack_serving_rejects_heterogeneous():
    cfg = _mk_cfg(num_layers=2)
    params = _mk_params(cfg, groupsize=128)
    params["layers"][1] = _mk_params(cfg, groupsize=512)["layers"][1]
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    assert stack_serving(model) is None


def test_model_kernel_asymmetric_zero_tables():
    """Asymmetric grids (per-group varying zeros) must take the streamed
    bias-table path; symmetric grids take the constant-zero path (no bias
    traffic). Both must match the per-layer reference loop."""
    from mi_optimize_tpu.core import packing, qparams
    from mi_optimize_tpu.core.qparams import qrange

    cfg = _mk_cfg(num_layers=2)
    params = _mk_params(cfg)

    # re-quantize every linear asymmetrically (varying zero per group)
    def asym(lin, key):
        rng = qrange(lin.spec.wbit, True)
        w = jax.random.normal(key, (lin.out_features, lin.in_features),
                              jnp.float32) * (lin.in_features ** -0.5) + 0.02
        fake, scale, zero = qparams.quantize_dequantize(
            w, lin.spec.wbit, "per_group", lin.spec.w_groupsize,
            symmetric=False)
        ints = qparams.quantize_to_int(fake, scale, zero, lin.spec.wbit,
                                       "per_group", lin.spec.w_groupsize)
        return lin.replace(packed=packing.pack_weight_device(
            ints, lin.spec.wbit, rng), w_scale=scale, w_zero=zero)

    key = jax.random.PRNGKey(11)
    for blk in params["layers"]:
        for name in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                     "up_proj", "down_proj"):
            key, k = jax.random.split(key)
            blk[name] = asym(blk[name], k)

    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    st = stack_serving(model)
    assert st is not None
    stack, meta = st
    # all four zero-constants must be None (tables streamed)
    assert meta[5:] == (None, None, None, None)

    prompt = jnp.asarray([[3, 17, 42, 9]])
    S = prompt.shape[1]
    cache = init_cache(cfg, 1, 128, jnp.int8)
    logits, cache = prefill(model.params, cfg, prompt, cache, True)
    tok = jnp.argmax(logits, -1)[:, None]
    toks_ref, _ = decode_loop(model.params, cfg, tok, cache, jnp.asarray(S), 4, True)
    toks_mega, _ = decode_loop_model(
        model.params, stack, meta, cfg, tok, stack_cache(cache),
        jnp.asarray(S), 4, interpret=jax.default_backend() != "tpu")
    assert toks_mega.tolist() == toks_ref.tolist()


def test_stack_serving_detects_symmetric_zero_consts():
    cfg = _mk_cfg(num_layers=2)
    params = _mk_params(cfg)  # symmetric default grid: zero == 8 everywhere
    model = fuse_for_serving(Model(config=cfg, params=params, family="llama"))
    _, meta = stack_serving(model)
    assert meta[5:] == (8.0, 8.0, 8.0, 8.0)
