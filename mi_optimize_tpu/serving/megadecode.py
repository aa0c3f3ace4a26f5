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


def stack_lm(model: Model, meta, cap: int = 1280):
    """(lm arrays dict, static lm_meta) for the batched kernel's terminal
    lm_head rows (r5), or None — same contract as the flat kernel's lm
    phase (ops/model_flat.stack_flat_params): packed symmetric-grid
    lm_head, all-layer-constant zero, group divisible by values/word.

    cap: lm tile ceiling. The batched kernels default to 1280, NOT the
    flat kernel's 3200: at B=8 the 2x6.5MB tv=3200 double-buffer crosses
    the VMEM pipeline cliff (19.7 ms/step vs 15.1 at tv=1280, which beats
    the XLA lm_head's 16.25 — exp_lm_tile_c9.py r5). MI_TV overrides."""
    from ..core.qparams import qrange
    from ..ops.block_fused import _pad_rows8, _scales_t
    from ..ops.model_flat import _pick_tv

    bits = meta[0]
    lin = model.params.get("lm_head")
    cfg = model.config
    if lin is None or getattr(lin, "packed", None) is None:
        return None
    s = lin.spec
    if s.wbit != bits or s.abit is not None or lin.bias is not None \
            or lin.smooth_factor is not None or lin.perm is not None:
        return None
    if s.w_qtype not in ("per_group", "per_channel"):
        return None
    g_ue = (s.w_groupsize if s.w_qtype == "per_group" and s.w_groupsize > 0
            else lin.in_features)
    vpw = 32 // bits
    if g_ue % vpw or cfg.hidden_size % g_ue:
        return None
    from ..ops.block_fused import CH

    if cfg.hidden_size % CH:
        return None
    tv = _pick_tv(lin.out_features, cap=cap)
    if not tv:
        return None
    z = jnp.reshape(lin.w_zero, (-1,))
    if not bool(jax.device_get(jnp.all(z == z[0]))):
        return None
    zc_ue = float(jax.device_get(z[0])) - float(
        qrange(s.wbit, s.w_unsigned).qmin)
    ues, _, _ = _scales_t(lin)
    lm = {"ue": lin.packed, "ues": _pad_rows8(ues),
          "fnorm": jnp.reshape(model.params["final_norm"], (1, -1))}
    return lm, (g_ue, zc_ue, lin.out_features, tv)


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

def default_lm(model: Model, meta):
    """Fused terminal-lm default for the batchers/beam: OFF — opt in with
    MI_FUSED_LM=1. With the unrolled-DUS scatter the non-fused B=8 step
    measures 12.5 ms vs the fused 15.1 (exp_batched_breakdown r5): the
    XLA lm_head (1.9 ms standalone) OVERLAPS the scan glue while the
    in-kernel lm rows serialize ~3 ms after the last layer, at every lm
    tile size swept (640/1280/3200 — exp_lm_tile_c9.py). The fused rows
    stay the win for the spec-dec chunk verify at C <= 6, where the C-row
    lm glue is serial (speculative.py). Returns (lm, lm_meta)."""
    import os

    if os.environ.get("MI_FUSED_LM") == "1":
        res = stack_lm(model, meta)
        return res if res is not None else (None, None)
    return None, None


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
    """Write each slot's new KV row at its own position.

    UNROLLED per-slot dynamic_update_slice chain, NOT a vmap: vmapped DUS
    with per-slot start indices lowers to an XLA scatter, and a scatter on
    the multi-GB carried cache forces a full-buffer copy every step
    (measured ~3.9 ms at B=8 T=512 — exp_batched_breakdown r5). A chain of
    plain DUS with a static slot index and one dynamic position is the form
    XLA's while-loop buffer aliasing updates in place (the B=1 flat path
    already relies on this)."""
    B = krows.shape[1]

    def upd_kv(buf, new):  # buf [L,B,H,T,D], new [L,B,H,D]
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, new[:, b:b + 1, :, None].astype(buf.dtype),
                (0, b, 0, positions[b], 0))
        return buf

    def upd_s(buf, new):  # buf [L,B,H,T], new [L,B,H]
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, new[:, b:b + 1, :, None].astype(buf.dtype),
                (0, b, 0, positions[b]))
        return buf

    return {
        "k": upd_kv(cache["k"], krows),
        "v": upd_kv(cache["v"], vrows),
        "k_scale": upd_s(cache["k_scale"], ksr),
        "v_scale": upd_s(cache["v_scale"], vsr),
    }


def init_pool_batched(cfg, n_pages: int, page_size: int):
    """Shared KV page POOL for the paged batched megakernel: one pool of
    `n_pages` pages of `page_size` tokens each, shared by every layer of
    every slot via a per-slot page table (ops/model_fused.py paged mode).
    Page 0 is the scratch page: never allocated, absorbs dead slots' reads
    and writes. Layout mirrors stack_cache_batched with the page axis
    replacing the (slot, block) axes."""
    Hkv, D = cfg.num_kv_heads, cfg.head_dim
    return {
        "k": jnp.zeros((cfg.num_layers, n_pages, Hkv, page_size, D), jnp.int8),
        "v": jnp.zeros((cfg.num_layers, n_pages, Hkv, page_size, D), jnp.int8),
        "k_scale": jnp.ones((cfg.num_layers, n_pages, Hkv, page_size),
                            jnp.float32),
        "v_scale": jnp.ones((cfg.num_layers, n_pages, Hkv, page_size),
                            jnp.float32),
    }


def _scatter_rows_paged(pool, krows, vrows, ksr, vsr, table, positions):
    """Write each slot's new KV row into its (page, offset): page =
    table[b, pos // P], offset = pos % P. Rows of slots whose table entry is
    0 land in the scratch page (retired slots)."""
    P = pool["k"].shape[3]
    L, B = krows.shape[:2]
    # unrolled per-slot DUS chain (same reason as _scatter_rows_batched:
    # an index-array scatter on the carried multi-GB pool forces a
    # full-buffer copy; a plain-DUS chain updates in place)
    pg = table[jnp.arange(B), positions // P]                     # [B]
    off = positions % P                                           # [B]

    def upd_kv(buf, new):  # buf [L,npg,H,P,D], new [L,B,H,D]
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, new[:, b:b + 1, :, None].astype(buf.dtype),
                (0, pg[b], 0, off[b], 0))
        return buf

    def upd_s(buf, new):  # buf [L,npg,H,P], new [L,B,H]
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, new[:, b:b + 1, :, None].astype(buf.dtype),
                (0, pg[b], 0, off[b]))
        return buf

    return {
        "k": upd_kv(pool["k"], krows),
        "v": upd_kv(pool["v"], vrows),
        "k_scale": upd_s(pool["k_scale"], ksr),
        "v_scale": upd_s(pool["v_scale"], vsr),
    }


def _scatter_chunk_rows(cache, krows, vrows, ksr, vsr, prefix):
    """Write C consecutive rows at prefix into a 1-slot batched cache.
    krows/vrows [L, C, Hkv, D], ksr/vsr [L, C, Hkv]."""
    def kv(buf, new):   # buf [L,1,Hkv,T,D]
        return jax.lax.dynamic_update_slice(
            buf, jnp.swapaxes(new, 1, 2)[:, None].astype(buf.dtype),
            (0, 0, 0, prefix, 0))

    def sc(buf, new):   # buf [L,1,Hkv,T]
        return jax.lax.dynamic_update_slice(
            buf, jnp.swapaxes(new, 1, 2)[:, None].astype(buf.dtype),
            (0, 0, 0, prefix))

    return {
        "k": kv(cache["k"], krows), "v": kv(cache["v"], vrows),
        "k_scale": sc(cache["k_scale"], ksr),
        "v_scale": sc(cache["v_scale"], vsr),
    }


@partial(jax.jit, static_argnames=("cfg", "meta", "interpret", "lm_meta"))
def model_step_chunk(params, stack, meta, cfg, tokens, cache, prefix,
                     interpret=False, lm=None, lm_meta=None):
    """Whole-model CHUNK step (round 3): score C consecutive tokens of ONE
    sequence (positions prefix..prefix+C-1) in one pallas launch — ONE weight
    stream for the whole chunk, with intra-chunk causal attention inside the
    kernel (ops/model_fused.py chunk mode).

    tokens [1, C]; cache: 1-slot batched stacked layout ([L,1,Hkv,T,D] int8 +
    scales — stack_cache_batched of a batch-1 engine cache). Returns
    (logits [C, V], cache with the C rows written). This is the speculative-
    decoding VERIFY primitive: the per-layer prefill_chunk streams weights at
    per-layer-path cost (~16 ms on 7B int4); this runs at megakernel cost."""
    from ..ops.model_fused import model_decode_mega_batch

    C = tokens.shape[1]
    h = cfg.hidden_size
    x = llama.embed(params, tokens).reshape(C, 1, h)
    positions = prefix + jnp.arange(C, dtype=jnp.int32)
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    outs = model_decode_mega_batch(
        stack, x, cos.reshape(C, -1)[:, -cfg.head_dim:],
        sin.reshape(C, -1)[:, -cfg.head_dim:],
        cache, positions, cfg, meta, interpret=interpret, chunk=C,
        lm=lm, lm_meta=lm_meta)
    xo, krows, vrows, ksr, vsr = outs[:5]
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier(
        (krows, vrows, ksr, vsr))
    cache = _scatter_chunk_rows(cache, krows, vrows, ksr, vsr, prefix)
    if lm is not None:          # r5: C-row lm_head fused in terminal rows
        return outs[5], cache
    hh = llama.rms_norm(xo.reshape(1, C, h), params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, hh, fused=not interpret)[0]
    return logits, cache


def _scatter_chunk_rows_batched(cache, krows, vrows, ksr, vsr, prefixes, C):
    """Write each slot's C consecutive rows at its own prefix.
    krows/vrows [L, B*C, Hkv, D] (slot-major rows), prefixes [B]."""
    L = krows.shape[0]
    B = prefixes.shape[0]

    # unrolled per-slot DUS chain (see _scatter_rows_batched: vmapped DUS
    # lowers to a copying scatter on the multi-GB cache)
    def kv(buf, new):   # buf [L,B,Hkv,T,D]
        new = jnp.swapaxes(new.reshape(L, B, C, new.shape[2], new.shape[3]),
                           2, 3)                       # [L,B,Hkv,C,D]
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, new[:, b:b + 1].astype(buf.dtype),
                (0, b, 0, prefixes[b], 0))
        return buf

    def sc(buf, new):   # buf [L,B,Hkv,T]
        new = jnp.swapaxes(new.reshape(L, B, C, new.shape[2]), 2, 3)
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, new[:, b:b + 1].astype(buf.dtype),
                (0, b, 0, prefixes[b]))
        return buf

    return {
        "k": kv(cache["k"], krows), "v": kv(cache["v"], vrows),
        "k_scale": sc(cache["k_scale"], ksr),
        "v_scale": sc(cache["v_scale"], vsr),
    }


@partial(jax.jit, static_argnames=("cfg", "meta", "interpret"))
def model_step_chunk_batch(params, stack, meta, cfg, tokens, cache, prefixes,
                           interpret=False):
    """B-slot chunk verify in ONE whole-model launch (round 3): tokens [B, C]
    — slot b's chunk sits at positions prefixes[b]..prefixes[b]+C-1 against
    its own cache slot. Returns (logits [B, C, V], cache with all B*C rows
    written). The speculative-decoding verify primitive for continuous
    batching: one weight stream scores every slot's chunk (the per-layer
    prefill_chunk_batched streams weights at per-layer-path cost)."""
    from ..ops.model_fused import model_decode_mega_batch

    B, C = tokens.shape
    h = cfg.hidden_size
    x = llama.embed(params, tokens).reshape(B * C, 1, h)
    positions = (prefixes[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
                 ).reshape(B * C)
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    xo, krows, vrows, ksr, vsr = model_decode_mega_batch(
        stack, x, cos.reshape(B * C, -1)[:, -cfg.head_dim:],
        sin.reshape(B * C, -1)[:, -cfg.head_dim:],
        cache, positions, cfg, meta, interpret=interpret, chunk=C)
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier(
        (krows, vrows, ksr, vsr))
    cache = _scatter_chunk_rows_batched(cache, krows, vrows, ksr, vsr,
                                        prefixes, C)
    hh = llama.rms_norm(xo.reshape(B, C, h), params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, hh, fused=not interpret)
    return logits, cache


@partial(jax.jit, static_argnames=("cfg", "meta", "interpret"))
def model_step_chunk_batch_paged(params, stack, meta, cfg, tokens, pool,
                                 table, prefixes, interpret=False):
    """B-slot chunk verify over the shared KV page POOL (round 3 serving
    composition): model_step_chunk_batch with the per-slot caches replaced by
    pool pages reached through `table` [B, pps] — speculative decoding's
    batched verify primitive under page-pool memory management. tokens
    [B, C]; each slot's C rows scatter into (page, offset) via its table row
    (the scheduler must have pages allocated through position prefix+C-1).
    Returns (logits [B, C, V], pool)."""
    from ..ops.model_fused import model_decode_mega_batch

    B, C = tokens.shape
    h = cfg.hidden_size
    x = llama.embed(params, tokens).reshape(B * C, 1, h)
    positions = (prefixes[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
                 ).reshape(B * C)
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    xo, krows, vrows, ksr, vsr = model_decode_mega_batch(
        stack, x, cos.reshape(B * C, -1)[:, -cfg.head_dim:],
        sin.reshape(B * C, -1)[:, -cfg.head_dim:],
        pool, positions, cfg, meta, interpret=interpret, chunk=C, table=table)
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier(
        (krows, vrows, ksr, vsr))
    # rows are slot-major [L, B*C, ...]; each row's (page, offset) comes from
    # its slot's table row at its own position — _scatter_rows_paged over the
    # flattened B*C "virtual slots"
    pool = _scatter_rows_paged(pool, krows, vrows, ksr, vsr,
                               jnp.repeat(table, C, axis=0), positions)
    hh = llama.rms_norm(xo.reshape(B, C, h), params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, hh, fused=not interpret)
    return logits, pool


@partial(jax.jit, static_argnames=("cfg", "meta", "interpret", "lm_meta"))
def model_step_batch_paged(params, stack, meta, cfg, tokens, pool, table,
                           positions, interpret=False, lm=None,
                           lm_meta=None):
    """model_step_batch over a shared KV page pool (round 3, VERDICT item 8):
    tokens [B,1], table [B, pps], positions [B] -> (logits [B,V], pool).
    Same one-launch weight stream; attention blocks fetch through the page
    table and the new rows scatter into (page, offset)."""
    from ..ops.model_fused import model_decode_mega_batch

    B = tokens.shape[0]
    x = llama.embed(params, tokens)
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    outs = model_decode_mega_batch(
        stack, x, cos.reshape(B, -1)[:, -cfg.head_dim:],
        sin.reshape(B, -1)[:, -cfg.head_dim:],
        pool, positions, cfg, meta, interpret=interpret, table=table,
        lm=lm, lm_meta=lm_meta)
    x, krows, vrows, ksr, vsr = outs[:5]
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier(
        (krows, vrows, ksr, vsr))
    pool = _scatter_rows_paged(pool, krows, vrows, ksr, vsr, table, positions)
    if lm is not None:          # r5: B-row lm_head fused in terminal rows
        return outs[5], pool
    h = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, h, fused=not interpret)[:, 0]
    return logits, pool


@partial(jax.jit, static_argnames=("cfg",))
def scatter_prefill_pages(pool, kvs, pages, valid, cfg):
    """Scatter one prefilled request's per-layer int8 KV slabs into its
    allocated pages. kvs: engine.init_cache/prefill output (batch-1, int8,
    T padded to a page multiple); pages [npg] int32 pool pages; valid [npg]
    bool (guards partially-filled allocations: invalid entries redirect to
    the scratch page 0). Returns the updated pool."""
    P = pool["k"].shape[3]
    k = jnp.stack([c["k"][0] for c in kvs]).swapaxes(1, 2)        # [L,Hkv,T,D]
    v = jnp.stack([c["v"][0] for c in kvs]).swapaxes(1, 2)
    ks = jnp.stack([c["k_scale"][0] for c in kvs]).swapaxes(1, 2)  # [L,Hkv,T]
    vs = jnp.stack([c["v_scale"][0] for c in kvs]).swapaxes(1, 2)
    L, Hkv, T, D = k.shape
    npg = T // P
    pg = jnp.where(valid, pages, 0)

    def rs(a):  # [L,Hkv,T,...] -> [L,npg,Hkv,P,...]
        return a.reshape((L, Hkv, npg, P) + a.shape[3:]).swapaxes(1, 2)

    # unrolled per-page DUS chain (see _scatter_rows_batched: an
    # index-array scatter on the multi-GB pool forces a full-buffer copy —
    # this is the admission/TTFT path)
    def upd(buf, new):  # new [L,npg,Hkv,P,...]
        for j in range(npg):
            start = (0, pg[j]) + (0,) * (new.ndim - 2)
            buf = jax.lax.dynamic_update_slice(
                buf, new[:, j:j + 1].astype(buf.dtype), start)
        return buf

    return {
        "k": upd(pool["k"], rs(k)),
        "v": upd(pool["v"], rs(v)),
        "k_scale": upd(pool["k_scale"], rs(ks)),
        "v_scale": upd(pool["v_scale"], rs(vs)),
    }


@partial(jax.jit, static_argnames=("cfg", "meta", "interpret", "lm_meta"))
def model_step_batch(params, stack, meta, cfg, tokens, cache, positions,
                     interpret=False, lm=None, lm_meta=None):
    """One B-slot decode step: tokens [B,1], positions [B] -> (logits [B,V],
    cache). ONE pallas launch for the whole decoder stack — weights stream
    once for all B slots."""
    from ..ops.model_fused import model_decode_mega_batch

    B = tokens.shape[0]
    x = llama.embed(params, tokens)                     # [B, 1, h]
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    outs = model_decode_mega_batch(
        stack, x, cos.reshape(B, -1)[:, -cfg.head_dim:],
        sin.reshape(B, -1)[:, -cfg.head_dim:],
        cache, positions, cfg, meta, interpret=interpret,
        lm=lm, lm_meta=lm_meta)
    x, krows, vrows, ksr, vsr = outs[:5]
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier(
        (krows, vrows, ksr, vsr))
    cache = _scatter_rows_batched(cache, krows, vrows, ksr, vsr, positions)
    if lm is not None:          # r5: B-row lm_head fused in terminal rows
        return outs[5], cache
    h = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, h, fused=not interpret)[:, 0]
    return logits, cache


# ---------------------------------------------------------------------------
# tensor-parallel batched megakernel: shard-major stacks + shard_map step
# ---------------------------------------------------------------------------
#
# Megatron head/intermediate parallelism of the whole-model kernel itself:
# q/kv heads and the MLP intermediate shard over the 'model' mesh axis, the
# residual stream stays full-width and replicated, and the two row-parallel
# partial sums (o-proj, down-proj) are ring-all-reduced IN-kernel over async
# remote DMAs (ops/model_fused.py::_kernel_b ring_allreduce) — the serving
# analogue of parallel/overlap.py's calibration-path overlap, keeping the
# one-launch-per-step property on every shard.


def _lin_out_slices(lin, spans):
    """Slice a QuantizedLinear along OUT-features (packed cols + scale rows)."""
    import jax.numpy as jnp

    packed = jnp.concatenate([lin.packed[:, a:b] for a, b in spans], axis=1)
    n_new = sum(b - a for a, b in spans)
    ng = lin.in_features // _grp(lin)
    sc = jnp.reshape(lin.w_scale, (-1, ng))
    zr = jnp.reshape(lin.w_zero, (-1, ng))
    scale = jnp.concatenate([sc[a:b] for a, b in spans], axis=0)
    zero = jnp.concatenate([zr[a:b] for a, b in spans], axis=0)
    return lin.replace(packed=packed, w_scale=scale, w_zero=zero,
                       out_features=n_new)


def _lin_in_slice(lin, a, b):
    """Slice a QuantizedLinear along IN-features (packed rows + scale groups)."""
    import jax.numpy as jnp

    bits = lin.spec.wbit
    vpw = 32 // bits
    packed = lin.packed[a // vpw:b // vpw]
    g = _grp(lin)
    ng = lin.in_features // g
    sc = jnp.reshape(lin.w_scale, (-1, ng))[:, a // g:b // g]
    zr = jnp.reshape(lin.w_zero, (-1, ng))[:, a // g:b // g]
    spec = lin.spec
    if spec.w_qtype == "per_channel":
        # one group spanned K; the slice keeps the same per-channel params
        sc, zr = jnp.reshape(lin.w_scale, (-1, 1)), jnp.reshape(lin.w_zero, (-1, 1))
    return lin.replace(packed=packed, w_scale=sc, w_zero=zr, in_features=b - a)


def stack_serving_tp(model: Model, ntp: int):
    """(global shard-major stack, meta, cfg_local) for TP over `ntp` shards.

    Each shard's stack is built independently (reusing the single-device
    stacking incl. per-shard MLP padding) and concatenated along its sharded
    axis, so shard_map's contiguous cuts recover exactly the per-shard
    arrays. Returns None when the model/config can't shard (head counts,
    group alignment, megakernel contract)."""
    import dataclasses

    import jax.numpy as jnp

    from ..ops.block_fused import prepare_block
    from ..ops.model_fused import stack_decode_params

    cfg = model.config
    layers = model.params["layers"]
    if not layers or "qkv_proj" not in layers[0]:
        return None
    if (cfg.num_heads % ntp or cfg.num_kv_heads % ntp
            or cfg.intermediate_size % ntp):
        return None
    dh = cfg.head_dim
    q_dim = cfg.num_heads * dh
    kv_dim = cfg.num_kv_heads * dh
    inter = cfg.intermediate_size
    qdl, kvl, il = q_dim // ntp, kv_dim // ntp, inter // ntp
    g0 = _grp(layers[0]["down_proj"])
    if il % max(g0, 1) or (qdl * layers[0]["qkv_proj"].spec.wbit) % 32 \
            or (il * layers[0]["down_proj"].spec.wbit) % 32:
        return None

    cfg_l = dataclasses.replace(cfg, num_heads=cfg.num_heads // ntp,
                                num_kv_heads=cfg.num_kv_heads // ntp,
                                intermediate_size=il)

    def shard_block(blk, s):
        qkv = _lin_out_slices(blk["qkv_proj"], [
            (s * qdl, (s + 1) * qdl),
            (q_dim + s * kvl, q_dim + (s + 1) * kvl),
            (q_dim + kv_dim + s * kvl, q_dim + kv_dim + (s + 1) * kvl),
        ])
        gu = _lin_out_slices(blk["gateup_proj"], [
            (s * il, (s + 1) * il),
            (inter + s * il, inter + (s + 1) * il),
        ])
        o = _lin_in_slice(blk["o_proj"], s * qdl, (s + 1) * qdl)
        d = _lin_in_slice(blk["down_proj"], s * il, (s + 1) * il)
        nb = {"input_norm": blk["input_norm"], "post_norm": blk["post_norm"],
              "qkv_proj": qkv, "o_proj": o, "gateup_proj": gu, "down_proj": d}
        nb["mega"] = prepare_block(nb, cfg_l)
        return nb

    stacks, metas = [], []
    for s in range(ntp):
        model_s = Model(
            config=cfg_l,
            params={"layers": [shard_block(b, s) for b in layers],
                    "embed": model.params["embed"],
                    "final_norm": model.params["final_norm"]},
            family=model.family)
        st = stack_serving(model_s)
        if st is None:
            return None
        stacks.append(st[0])
        metas.append(st[1])
    if any(m != metas[0] for m in metas[1:]):
        return None

    AXIS = {"qkv": 2, "qs": 2, "qz": 2, "o": 1, "os": 1, "oz": 1,
            "gu": 2, "gus": 2, "guz": 2, "d": 1, "ds": 1, "dz": 1}
    gstack = {}
    for k in stacks[0]:
        if k in AXIS:
            gstack[k] = jnp.concatenate([st[k] for st in stacks], axis=AXIS[k])
        else:  # n1 / n2: replicated
            gstack[k] = stacks[0][k]
    return gstack, metas[0], cfg_l


_TP_STACK_SPECS = {
    "qkv": (None, None, "model"), "qs": (None, None, "model"),
    "qz": (None, None, "model"),
    "o": (None, "model", None), "os": (None, "model", None),
    "oz": (None, "model", None),
    "gu": (None, None, "model"), "gus": (None, None, "model"),
    "guz": (None, None, "model"),
    "d": (None, "model", None), "ds": (None, "model", None),
    "dz": (None, "model", None),
    "n1": (None, None, None), "n2": (None, None, None),
}


def model_step_batch_tp(params, gstack, meta, cfg, tokens, cache, positions,
                        mesh, axis="model", interpret=False):
    """One B-slot decode step with the megakernel TENSOR-PARALLEL over `axis`.

    cache: stacked batched dict sharded on its head axis
    ([L,B,Hkv,T,D] with Hkv over `axis`). Returns (logits [B,V], cache).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ntp = mesh.shape[axis]
    B = tokens.shape[0]
    x = llama.embed(params, tokens)
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    cosr = cos.reshape(B, -1)[:, -cfg.head_dim:]
    sinr = sin.reshape(B, -1)[:, -cfg.head_dim:]

    from ..ops.model_fused import model_decode_mega_batch

    def local(xs, cs, sn, ps, st, ck, cv, ks, vs):
        c = {"k": ck, "v": cv, "k_scale": ks, "v_scale": vs}
        return model_decode_mega_batch(st, xs, cs, sn, c, ps, cfg, meta,
                                       interpret=interpret, tp=ntp,
                                       tp_axis=axis)

    stack_specs = {k: P(*_TP_STACK_SPECS[k]) for k in gstack}
    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None), P(None, None), P(None, None), P(None),
                  stack_specs,
                  P(None, None, axis, None, None), P(None, None, axis, None, None),
                  P(None, None, axis, None), P(None, None, axis, None)),
        out_specs=(P(None, None, None),
                   P(None, None, axis, None), P(None, None, axis, None),
                   P(None, None, axis), P(None, None, axis)),
        check_vma=False,
    )
    x2, krows, vrows, ksr, vsr = f(
        x, cosr, sinr, jnp.asarray(positions).astype(jnp.int32), gstack,
        cache["k"], cache["v"], cache["k_scale"], cache["v_scale"])
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier(
        (krows, vrows, ksr, vsr))
    cache = _scatter_rows_batched(cache, krows, vrows, ksr, vsr,
                                  jnp.asarray(positions))
    h = llama.rms_norm(x2, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, h, fused=not interpret)[:, 0]
    return logits, cache


# Donated-buffer variants (r5): the host-loop batchers call these once per
# step; without donation XLA must COPY the cache/pool before the row
# scatters (measured ~4 ms/step at B=8 T=512 dense — the scatter itself is
# ~0.25 ms). Tests/experiments that REUSE a cache across calls must keep
# the non-donated originals.
model_step_batch_donated = partial(
    jax.jit, static_argnames=("cfg", "meta", "interpret", "lm_meta"),
    donate_argnums=(5,))(model_step_batch.__wrapped__)
model_step_batch_paged_donated = partial(
    jax.jit, static_argnames=("cfg", "meta", "interpret", "lm_meta"),
    donate_argnums=(5,))(model_step_batch_paged.__wrapped__)


def model_step_batch_paged_tp(params, gstack, meta, cfg, tokens, pool, table,
                              positions, mesh, axis="model", interpret=False):
    """Paged + in-kernel tensor parallelism (round 3 serving composition):
    model_step_batch_tp with the per-slot dense caches replaced by the
    shared KV page POOL. The pool shards on its head axis
    ([L, n_pages, Hkv, P, D] with Hkv over `axis`) exactly like the dense
    cache; the page table is replicated (every shard fetches the same pages
    of its own head shard); the o/down ring all-reduces are untouched.
    tokens [B,1], table [B, pps], positions [B] -> (logits [B,V], pool)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ntp = mesh.shape[axis]
    B = tokens.shape[0]
    x = llama.embed(params, tokens)
    cos, sin = llama.rope_tables(cfg, positions[:, None])
    cosr = cos.reshape(B, -1)[:, -cfg.head_dim:]
    sinr = sin.reshape(B, -1)[:, -cfg.head_dim:]

    from ..ops.model_fused import model_decode_mega_batch

    def local(xs, cs, sn, ps, tbl, st, ck, cv, ks, vs):
        c = {"k": ck, "v": cv, "k_scale": ks, "v_scale": vs}
        return model_decode_mega_batch(st, xs, cs, sn, c, ps, cfg, meta,
                                       interpret=interpret, tp=ntp,
                                       tp_axis=axis, table=tbl)

    stack_specs = {k: P(*_TP_STACK_SPECS[k]) for k in gstack}
    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None), P(None, None), P(None, None), P(None),
                  P(None, None), stack_specs,
                  P(None, None, axis, None, None), P(None, None, axis, None, None),
                  P(None, None, axis, None), P(None, None, axis, None)),
        out_specs=(P(None, None, None),
                   P(None, None, axis, None), P(None, None, axis, None),
                   P(None, None, axis), P(None, None, axis)),
        check_vma=False,
    )
    x2, krows, vrows, ksr, vsr = f(
        x, cosr, sinr, jnp.asarray(positions).astype(jnp.int32),
        jnp.asarray(table).astype(jnp.int32), gstack,
        pool["k"], pool["v"], pool["k_scale"], pool["v_scale"])
    krows, vrows, ksr, vsr = jax.lax.optimization_barrier(
        (krows, vrows, ksr, vsr))
    pool = _scatter_rows_paged(pool, krows, vrows, ksr, vsr,
                               jnp.asarray(table),
                               jnp.asarray(positions))
    h = llama.rms_norm(x2, params["final_norm"], cfg.rms_eps)
    logits = llama.unembed(params, cfg, h, fused=not interpret)[:, 0]
    return logits, pool
