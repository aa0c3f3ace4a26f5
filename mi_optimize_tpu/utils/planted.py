"""Planted-structure quantized models: deterministic greedy token maps with
logit margins that dwarf both quantization and bf16-pass noise.

Round-4 tooling for two VERDICT items that random-init weights cannot serve:

* Spec-dec demonstration (item 3): random weights give a degenerate
  draft/target accept rate (~1/V), so every recorded spec-dec run to date
  LOST. A planted model makes greedy decoding follow a fixed token map
  m(t) (an n-gram machine of order 1): target and draft built from the SAME
  embed/σ agree at rate ~1, and a draft built with a fraction of σ entries
  redirected agrees at rate ~1-frac — a *controllable* accept rate with a
  genuinely cheaper draft (fewer layers), so the spec-dec win/loss can be
  measured honestly on-chip at realistic α.

* On-chip exactness protocol (item 4): chunk-megakernel vs dense-prefill
  logits differ by ~1.7e-2 rel on-chip (bf16 MXU passes), so random-init
  near-tie argmaxes can flip between serving paths. The planted margins
  (self-dot ≈ h·s² vs cross-dot ≈ √h·s², a ~60σ gap at 7B scale) survive
  that noise, so every path — dense, flat, paged, prefix-cache, spec-verify
  — must emit the SAME greedy sequence on real hardware, and any mismatch
  is a real bug, not noise.

Construction: embed rows are random gaussians; every o_proj / down_proj is
exactly zero (a zero matrix quantizes to exactly zero), so the residual
stream carries embed[t] through all layers untouched; the packed lm_head is
W = scatter(m)ᵀ·embed, making logits_j = embed[t]·W[j] peak at j = m(t).
qkv / gate / up stay random — their full weight traffic is streamed, they
just contribute nothing to the residual, so decode COST is identical to a
real checkpoint of the same shape.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _make_lin(w, bits, groupsize):
    from ..core import packing, qparams
    from ..core.qparams import qrange
    from ..models.quant_linear import QuantSpec, QuantizedLinear

    rng = qrange(bits, True)
    spec = QuantSpec(wbit=bits, w_qtype="per_group", w_groupsize=groupsize,
                     w_packed=True)

    @partial(jax.jit, static_argnames=())
    def pack(w):
        fake, scale, zero = qparams.quantize_dequantize(
            w, bits, "per_group", groupsize)
        ints = qparams.quantize_to_int(fake, scale, zero, bits, "per_group",
                                       groupsize)
        return packing.pack_weight_device(ints, bits, rng), scale, zero

    packed, scale, zero = pack(w)
    return QuantizedLinear(spec=spec, out_features=w.shape[0],
                           in_features=w.shape[1], packed=packed,
                           w_scale=scale, w_zero=zero)


def planted_map(vocab: int, seed: int = 0, disagree_frac: float = 0.0,
                disagree_seed: int = 1) -> np.ndarray:
    """Token map m [V] int32: a permutation σ, with `disagree_frac` of the
    entries redirected to random tokens (host-side, deterministic)."""
    rng = np.random.default_rng(seed)
    m = rng.permutation(vocab).astype(np.int32)
    if disagree_frac > 0:
        rng2 = np.random.default_rng(disagree_seed)
        n = int(disagree_frac * vocab)
        idx = rng2.choice(vocab, n, replace=False)
        m[idx] = rng2.integers(0, vocab, n)
    return m


def build_planted_llama(cfg, m: np.ndarray, bits: int = 4,
                        groupsize: int = 128, dtype=jnp.bfloat16,
                        embed_seed: int = 0, noise_seed: int = 7):
    """Params for a packed int-quantized llama whose greedy next token is
    m[t] for every context ending in token t. Same shapes/traffic as
    bench.build_quantized_llama_on_device; weights built ON device."""
    h = cfg.hidden_size
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    V = cfg.vocab_size
    key = jax.random.PRNGKey(noise_seed)

    embed = jax.random.normal(jax.random.PRNGKey(embed_seed), (V, h),
                              jnp.float32) * 0.02
    # W[j] = sum_{t: m(t)=j} embed[t]; rows no t maps to stay ~zero (their
    # logits never win). Quantization noise << the self-dot margin.
    w_lm = jnp.zeros((V, h), jnp.float32).at[jnp.asarray(m)].add(embed)

    def rand(key, out_f, in_f):
        return jax.random.normal(key, (out_f, in_f), jnp.float32) * (in_f ** -0.5)

    layers = []
    for _ in range(cfg.num_layers):
        key, *ks = jax.random.split(key, 6)
        layers.append({
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
            "q_proj": _make_lin(rand(ks[0], q_dim, h), bits, groupsize),
            "k_proj": _make_lin(rand(ks[1], kv_dim, h), bits, groupsize),
            "v_proj": _make_lin(rand(ks[2], kv_dim, h), bits, groupsize),
            # zero o/down: the residual stream stays embed[t] exactly
            "o_proj": _make_lin(jnp.zeros((h, q_dim), jnp.float32),
                                bits, groupsize),
            "gate_proj": _make_lin(rand(ks[3], cfg.intermediate_size, h),
                                   bits, groupsize),
            "up_proj": _make_lin(rand(ks[4], cfg.intermediate_size, h),
                                 bits, groupsize),
            "down_proj": _make_lin(
                jnp.zeros((h, cfg.intermediate_size), jnp.float32),
                bits, groupsize),
        })
    return {
        "embed": embed.astype(dtype),
        "layers": layers,
        "final_norm": jnp.ones((h,), jnp.float32 if dtype == jnp.float32
                               else dtype),
        "lm_head": _make_lin(w_lm, bits, groupsize),
    }


def planted_pair(cfg, draft_layers: int = 2, bits: int = 4,
                 draft_bits: int = 4, groupsize: int = 128,
                 disagree_frac: float = 0.0, dtype=jnp.bfloat16):
    """(target Model, draft Model, m_target, m_draft): same embed/map family,
    draft has `draft_layers` layers and `disagree_frac` of its map entries
    redirected — accept rate ~ 1 - disagree_frac along the greedy chain."""
    from ..models.model import Model

    m_t = planted_map(cfg.vocab_size)
    m_d = planted_map(cfg.vocab_size, disagree_frac=disagree_frac)
    dcfg = dataclasses.replace(cfg, num_layers=draft_layers)
    target = Model(config=cfg,
                   params=build_planted_llama(cfg, m_t, bits, groupsize, dtype),
                   family="llama")
    draft = Model(config=dcfg,
                  params=build_planted_llama(dcfg, m_d, draft_bits, groupsize,
                                             dtype),
                  family="llama")
    return target, draft, m_t, m_d
