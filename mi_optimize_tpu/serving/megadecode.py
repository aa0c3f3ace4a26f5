"""Model-level decode: the whole decoder stack as ONE kernel per token.

Builds on ops/model_fused.py. The serving flow is:

    model = fuse_for_serving(model)            # per-layer megakernel prep
    stack, meta = stack_serving(model)         # [L, ...] weight stacks
    cache = init_cache_stacked(cfg, max_len)   # [L, T, Hkv, D] int8 + scales
    prefill (per-layer path) -> stack_cache
    decode_loop_model(...)                     # scan: 1 pallas call / token

Falls back transparently (returns None from stack_serving) when any block
fails the megakernel contract; callers then use serving.engine.decode_loop.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from ..models import llama
from ..models.model import Model


def _grp(lin):
    s = lin.spec
    return s.w_groupsize if s.w_qtype == "per_group" and s.w_groupsize > 0 else lin.in_features


def _zconst(layers, name):
    """Constant (zero - qmin) shared by `name` across ALL layers, else None.

    Symmetric grids (RTN midpoint zero, absmax grids) have one zero for the
    whole model; the kernel then never streams the bias tables — on 7B g128
    that is ~200MB/token of the ~3.6GB weight read. One small device
    reduction + scalar pull (host<->device is slow here; see CLAUDE.md)."""
    import numpy as np

    from ..core.qparams import qrange

    zs = [jnp.asarray(b[name].w_zero, jnp.float32).reshape(-1) for b in layers]
    z = jnp.concatenate(zs)
    res = np.asarray(jnp.stack([jnp.all(z == z[0]).astype(jnp.float32), z[0]]))
    if res[0] != 1.0:
        return None
    lin = layers[0][name]
    rng = qrange(lin.spec.wbit, lin.spec.w_unsigned)
    return float(res[1]) - float(rng.qmin)


def stack_serving(model: Model):
    """(stack dict, meta tuple) for the whole-model kernel, or None."""
    from ..ops.model_fused import stack_decode_params

    stack = stack_decode_params(model)
    if stack is None:
        return None
    layers = model.params["layers"]
    b0 = layers[0]
    def key(b):  # w_unsigned included: _zconst shifts by layer-0's qmin
        return (b["qkv_proj"].spec.wbit, b["qkv_proj"].spec.w_unsigned,
                _grp(b["qkv_proj"]), _grp(b["o_proj"]),
                _grp(b["gateup_proj"]), _grp(b["down_proj"]))

    # homogeneity check: every layer must share the meta
    for b in layers[1:]:
        if key(b) != key(b0):
            return None
    k0 = key(b0)
    meta = (k0[0],) + k0[2:]
    meta = meta + tuple(
        _zconst(layers, n)
        for n in ("qkv_proj", "o_proj", "gateup_proj", "down_proj"))
    return stack, meta


def init_cache_stacked(cfg, max_len: int):
    """Stacked int8 KV cache: [L, T, Hkv, D] values + [L, T, Hkv] scales."""
    shape = (cfg.num_layers, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "v": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(shape[:3], jnp.float32),
        "v_scale": jnp.zeros(shape[:3], jnp.float32),
    }


def stack_cache(cache_list):
    """Per-layer cache list (engine.init_cache dtype=int8, batch=1) -> stacked."""
    return {
        f: jnp.stack([c[f][0] for c in cache_list])
        for f in ("k", "v", "k_scale", "v_scale")
    }


def _model_step(params, stack, meta, cfg, tok, cache, pos, interpret):
    from ..ops.model_fused import model_decode_mega

    x = llama.embed(params, tok)  # [1, 1, h]
    cos, sin = llama.rope_tables(cfg, pos[None])
    x, krows, vrows, ksr, vsr = model_decode_mega(
        stack, x, cos.reshape(-1)[-cfg.head_dim:], sin.reshape(-1)[-cfg.head_dim:],
        cache, pos, cfg, meta, interpret=interpret)
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier((krows, vrows, ksr, vsr))
    upd = lambda buf, new: jax.lax.dynamic_update_slice(
        buf, new[:, None].astype(buf.dtype), (0, pos) + (0,) * (buf.ndim - 2))
    cache = {
        "k": upd(cache["k"], krows),
        "v": upd(cache["v"], vrows),
        "k_scale": upd(cache["k_scale"], ksr),
        "v_scale": upd(cache["v_scale"], vsr),
    }
    h = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, h, fused=not interpret)[:, 0]
    return logits, cache


@partial(jax.jit, static_argnames=("cfg", "meta", "n", "interpret"))
def decode_loop_model(params, stack, meta, cfg, token, cache, pos0, n,
                      interpret=False):
    """Greedy-decode n tokens; ONE whole-model pallas call per token."""

    def step(carry, _):
        tok, cache, pos = carry
        logits, cache = _model_step(params, stack, meta, cfg, tok, cache, pos,
                                    interpret)
        nt = jnp.argmax(logits, -1).astype(tok.dtype)[:, None]
        return (nt, cache, pos + 1), nt[:, 0]

    (tok, cache, pos), toks = jax.lax.scan(step, (token, cache, pos0), None,
                                           length=n)
    return jnp.swapaxes(toks, 0, 1), cache


# ---------------------------------------------------------------------------
# batched (B-slot) whole-model decode — continuous batching fast path
# ---------------------------------------------------------------------------

def stack_cache_batched(cache_list):
    """Per-layer multi-slot cache (engine.init_cache dtype=int8, batch=B) ->
    HEAD-TRANSPOSED stacked dict for the batched kernel:
    k/v [L, B, Hkv, T, D], scales [L, B, Hkv, T]."""
    k = jnp.stack([c["k"] for c in cache_list])            # [L, B, T, H, D]
    v = jnp.stack([c["v"] for c in cache_list])
    ks = jnp.stack([c["k_scale"] for c in cache_list])     # [L, B, T, H]
    vs = jnp.stack([c["v_scale"] for c in cache_list])
    return {
        "k": jnp.swapaxes(k, 2, 3),
        "v": jnp.swapaxes(v, 2, 3),
        "k_scale": jnp.swapaxes(ks, 2, 3),
        "v_scale": jnp.swapaxes(vs, 2, 3),
    }


def unstack_cache_batched(cache, n_layers):
    """Inverse of stack_cache_batched (back to the per-layer engine layout)."""
    out = []
    for l in range(n_layers):
        out.append({
            "k": jnp.swapaxes(cache["k"][l], 1, 2),
            "v": jnp.swapaxes(cache["v"][l], 1, 2),
            "k_scale": jnp.swapaxes(cache["k_scale"][l], 1, 2),
            "v_scale": jnp.swapaxes(cache["v_scale"][l], 1, 2),
        })
    return out


def _scatter_rows_batched(cache, krows, vrows, ksr, vsr, positions):
    """Write each slot's new KV row at its own position (vmap over slots)."""
    def upd_kv(buf, new):  # buf [L,B,H,T,D], new [L,B,H,D]
        def one(bufb, newb, p):
            return jax.lax.dynamic_update_slice(
                bufb, newb[:, :, None].astype(bufb.dtype), (0, 0, p, 0))
        return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(buf, new, positions)

    def upd_s(buf, new):  # buf [L,B,H,T], new [L,B,H]
        def one(bufb, newb, p):
            return jax.lax.dynamic_update_slice(
                bufb, newb[:, :, None].astype(bufb.dtype), (0, 0, p))
        return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(buf, new, positions)

    return {
        "k": upd_kv(cache["k"], krows),
        "v": upd_kv(cache["v"], vrows),
        "k_scale": upd_s(cache["k_scale"], ksr),
        "v_scale": upd_s(cache["v_scale"], vsr),
    }


@partial(jax.jit, static_argnames=("cfg", "meta", "interpret"))
def model_step_batch(params, stack, meta, cfg, tokens, cache, positions,
                     interpret=False):
    """One B-slot decode step: tokens [B,1], positions [B] -> (logits [B,V],
    cache). ONE pallas launch for the whole decoder stack — weights stream
    once for all B slots."""
    from ..ops.model_fused import model_decode_mega_batch

    B = tokens.shape[0]
    x = llama.embed(params, tokens)                     # [B, 1, h]
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    x, krows, vrows, ksr, vsr = model_decode_mega_batch(
        stack, x, cos.reshape(B, -1)[:, -cfg.head_dim:],
        sin.reshape(B, -1)[:, -cfg.head_dim:],
        cache, positions, cfg, meta, interpret=interpret)
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier(
        (krows, vrows, ksr, vsr))
    cache = _scatter_rows_batched(cache, krows, vrows, ksr, vsr, positions)
    h = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, h, fused=not interpret)[:, 0]
    return logits, cache
