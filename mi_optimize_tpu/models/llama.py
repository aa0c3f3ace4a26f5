"""Functional Llama-family model (pure JAX pytrees, every linear a QuantizedLinear).

TPU-first re-design of the reference's model handling: the reference mutates a
HF torch module tree in place (replace_module,
/root/reference/mi_optimize/quantization/utils.py:35-68); here the model is an
immutable params pytree + jittable pure functions, so calibration "hooks" are
just extra outputs of `block_apply` (SURVEY.md §7.3.4) and sharding is a
NamedSharding over the pytree.

Covers LLaMA/LLaMA-2 and (by config) Qwen2-style GQA + attention bias; rotary
embedding uses the HF split-half convention so converted HF checkpoints are
numerically identical.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .quant_linear import QuantizedLinear, quant_linear_apply

# names of the per-block linears, in the reference's group-sequential order
# (llama_seq.py:71-76: [k,v,q] [o] [up,gate] [down])
ATTN_LINEARS = ("q_proj", "k_proj", "v_proj", "o_proj")
MLP_LINEARS = ("gate_proj", "up_proj", "down_proj")
ALL_LINEARS = ATTN_LINEARS + MLP_LINEARS
GROUP_ORDER: Tuple[Tuple[str, ...], ...] = (
    ("k_proj", "v_proj", "q_proj"),
    ("o_proj",),
    ("up_proj", "gate_proj"),
    ("down_proj",),
)


@struct.dataclass
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_seq_len: int = 2048
    tie_embeddings: bool = False
    attn_bias: bool = False  # Qwen2-style qkv bias
    # ChatGLM-style rotary: applied to the first `rotary_dim` dims only, with
    # interleaved (even/odd) pairing instead of the HF split-half convention
    rotary_dim: int = -1     # -1 => full head_dim
    rope_interleaved: bool = False

    @classmethod
    def tiny(cls, **kw):
        """2-layer random-init config for CPU tests (SURVEY.md §4.5)."""
        d = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, max_seq_len=128,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def llama2_7b(cls):
        return cls()


# ---------------------------------------------------------------------------
# init / param structure
# ---------------------------------------------------------------------------

def init_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init params (for tests/benchmarks with model-shaped tensors)."""
    keys = iter(jax.random.split(key, 4 + cfg.num_layers * 8))

    def lin(out_f, in_f, bias=False):
        w = (jax.random.normal(next(keys), (out_f, in_f), dtype) * (in_f ** -0.5)).astype(dtype)
        b = jnp.zeros((out_f,), dtype) if bias else None
        return QuantizedLinear.fp(w, b)

    h, q_dim = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
            "q_proj": lin(q_dim, h, cfg.attn_bias),
            "k_proj": lin(kv_dim, h, cfg.attn_bias),
            "v_proj": lin(kv_dim, h, cfg.attn_bias),
            "o_proj": lin(h, q_dim),
            "gate_proj": lin(cfg.intermediate_size, h),
            "up_proj": lin(cfg.intermediate_size, h),
            "down_proj": lin(h, cfg.intermediate_size),
        })
    params = {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = lin(cfg.vocab_size, h)
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rms_norm(x, weight, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def rope_tables(cfg: LlamaConfig, positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [*, rotary_dim] for given positions."""
    rd = cfg.rotary_dim if cfg.rotary_dim > 0 else cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, rd, 2) / rd))
    freqs = positions.astype(jnp.float32)[..., None] * jnp.asarray(inv_freq, jnp.float32)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x, cos, sin, cfg: LlamaConfig):
    """x: [..., seq, heads, head_dim]; cos/sin: [seq, rotary_dim] (broadcast).

    HF llama split-half by default; ChatGLM-style interleaved + partial when
    cfg.rope_interleaved / cfg.rotary_dim are set.
    """
    rd = cfg.rotary_dim if cfg.rotary_dim > 0 else x.shape[-1]
    xr, x_pass = x[..., :rd], x[..., rd:]
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    if cfg.rope_interleaved:
        # pairs are (even, odd) lanes; tables are [f0, f1, ...] duplicated
        half = rd // 2
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        ch, sh = c[..., :half], s[..., :half]
        o1 = x1 * ch - x2 * sh
        o2 = x2 * ch + x1 * sh
        rot = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        half = rd // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        rot = xr * c + rotated * s
    if x_pass.shape[-1]:
        rot = jnp.concatenate([rot.astype(x.dtype), x_pass], axis=-1)
    return rot.astype(x.dtype)


def attention(q, k, v, mask, cfg: LlamaConfig):
    """q:[B,S,Hq,D] k,v:[B,T,Hkv,D]; GQA by head repetition.

    mask: bool, [S,T] (shared) or [B,1,S,T] / [B,1,1,T] (per-slot positions in
    the continuous-batching decode path) — broadcast against scores [B,H,S,T].
    """
    reps = cfg.num_heads // cfg.num_kv_heads
    if reps > 1:
        k = jnp.repeat(k, reps, axis=2)
        v = jnp.repeat(v, reps, axis=2)
    scores = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(cfg.head_dim)
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def block_apply(
    blk: Dict[str, Any],
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: LlamaConfig,
    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    cache_index: Optional[jnp.ndarray] = None,
    capture: bool = False,
    fused: bool = True,
):
    """One transformer block.

    Returns (out, new_kv_cache, captures). `captures` maps each linear name to
    the activation that *enters* it — the functional replacement for the
    reference's forward hooks (track_input_hook / track_hessian_hook,
    quantizer/utils.py:26-72): calibration jits this with capture=True and
    reduces the returned activations into stats on device.
    """
    caps: Dict[str, jnp.ndarray] = {}
    B, S, _ = x.shape
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim

    # decode megakernel: the ENTIRE block in one Pallas launch
    # (ops/block_fused.py) — prepared by serving.optimize.fuse_for_serving
    if (
        fused and not capture and "mega" in blk and B == 1 and S == 1
        and isinstance(kv_cache, dict)
        and kv_cache["k"].shape[1] % 128 == 0  # time-blocked flash phase
        and jnp.asarray(cache_index).ndim == 0
    ):
        from ..ops.block_fused import block_decode_mega

        x_out, new_cache = block_decode_mega(
            {k: v for k, v in blk.items() if k != "mega"}, blk["mega"],
            x, cos.reshape(-1)[-cfg.head_dim:], sin.reshape(-1)[-cfg.head_dim:],
            kv_cache, cache_index, cfg,
            interpret=jax.default_backend() != "tpu",
        )
        return x_out, new_cache, caps

    h = rms_norm(x, blk["input_norm"], cfg.rms_eps)
    if capture:
        caps["q_proj"] = caps["k_proj"] = caps["v_proj"] = h
    if "qkv_proj" in blk:
        # serving-fused QKV (one kernel launch, larger N tile — see
        # serving/optimize.fuse_for_serving)
        qkv = quant_linear_apply(blk["qkv_proj"], h, fused=fused)
        q = qkv[..., :q_dim]
        k = qkv[..., q_dim : q_dim + kv_dim]
        v = qkv[..., q_dim + kv_dim :]
    else:
        q = quant_linear_apply(blk["q_proj"], h, fused=fused)
        k = quant_linear_apply(blk["k_proj"], h, fused=fused)
        v = quant_linear_apply(blk["v_proj"], h, fused=fused)
    # fused decode fast path: rope + int8-cache append + attention in ONE
    # Pallas kernel (ops/decode_attention.py) — the stock path below spends
    # ~8 small XLA ops on the same work, which dominates launch-bound decode
    _attn_ok = (
        fused and not capture and S == 1
        and isinstance(kv_cache, dict)
        and (cfg.rotary_dim in (-1, cfg.head_dim)) and not cfg.rope_interleaved
        and jax.default_backend() == "tpu"
    )
    # NOTE: multi-slot (B>1) decode does NOT vmap this kernel — Mosaic rejects
    # the batched SMEM position operand (block (1,) of an [B,1] smem array).
    # The batched fast path is the whole-model megakernel instead
    # (ops/model_fused.py::model_decode_mega_batch via serving.batching);
    # B>1 without it uses the stock XLA attention below.
    fuse_attn = _attn_ok and B == 1 and jnp.asarray(cache_index).ndim == 0
    if fuse_attn:
        from ..ops.decode_attention import fused_decode_attention

        attn_flat, ck, cv, ks, vs = fused_decode_attention(
            q.reshape(1, -1), k.reshape(1, -1), v.reshape(1, -1),
            cos.reshape(1, cfg.head_dim), sin.reshape(1, cfg.head_dim),
            kv_cache["k"][0], kv_cache["v"][0],
            kv_cache["k_scale"][0], kv_cache["v_scale"][0],
            cache_index,
            n_heads=cfg.num_heads, n_kv_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim, max_len=kv_cache["k"].shape[1],
        )
        new_cache = {"k": ck[None], "v": cv[None],
                     "k_scale": ks[None], "v_scale": vs[None]}
        attn = attn_flat.reshape(B, S, cfg.num_heads * cfg.head_dim).astype(x.dtype)
        if capture:
            caps["o_proj"] = attn
        x = x + quant_linear_apply(blk["o_proj"], attn, fused=fused)
        return _mlp_tail(blk, x, cfg, caps, capture, fused), new_cache, caps

    q = q.reshape(B, S, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin, cfg)
    k = apply_rope(k, cos, sin, cfg)

    def _upd(buf, new, idx):
        """Write `new` [B,S,...] into `buf` at time index `idx` (scalar: one
        dynamic_update_slice; vector [B]: per-slot positions via vmap —
        the continuous-batching path)."""
        idx = jnp.asarray(idx)
        if idx.ndim == 0:
            start = (0, idx) + (0,) * (buf.ndim - 2)
            return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype), start)
        def one(b, n, i):
            st = (i,) + (0,) * (b.ndim - 1)
            return jax.lax.dynamic_update_slice(b, n.astype(b.dtype), st)
        return jax.vmap(one)(buf, new.astype(buf.dtype), idx)

    if isinstance(kv_cache, dict):
        # int8-quantized KV cache: values stored int8 with per-(token, head)
        # absmax scales — 2x less HBM traffic per decode step than bf16.
        # (KV-cache quantization is new scope beyond the reference; cf. the
        # int8/int4 KV-cache literature in PAPERS.md.)
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        kv_cache = {
            "k": _upd(kv_cache["k"], kq, cache_index),
            "v": _upd(kv_cache["v"], vq, cache_index),
            "k_scale": _upd(kv_cache["k_scale"], ks, cache_index),
            "v_scale": _upd(kv_cache["v_scale"], vs, cache_index),
        }
        k_all = (kv_cache["k"].astype(jnp.float32) * kv_cache["k_scale"][..., None]).astype(q.dtype)
        v_all = (kv_cache["v"].astype(jnp.float32) * kv_cache["v_scale"][..., None]).astype(q.dtype)
        new_cache = kv_cache
    elif kv_cache is not None:
        ck, cv = kv_cache
        ck = _upd(ck, k, cache_index)
        cv = _upd(cv, v, cache_index)
        k_all, v_all = ck, cv
        new_cache = (ck, cv)
    else:
        k_all, v_all = k, v
        new_cache = None

    attn = attention(q, k_all.astype(q.dtype), v_all.astype(q.dtype), mask, cfg)
    attn = attn.reshape(B, S, cfg.num_heads * cfg.head_dim)
    if capture:
        caps["o_proj"] = attn
    x = x + quant_linear_apply(blk["o_proj"], attn, fused=fused)
    return _mlp_tail(blk, x, cfg, caps, capture, fused), new_cache, caps


def _mlp_tail(blk, x, cfg: LlamaConfig, caps, capture: bool, fused: bool):
    if (fused and not capture and "gate_proj" in blk
            and jax.default_backend() == "tpu"):
        from ..ops.mlp_fused import mlp_apply_fused, mlp_supported

        gate, up, down = blk["gate_proj"], blk["up_proj"], blk["down_proj"]
        if mlp_supported(gate, up, down, cfg.hidden_size, cfg.intermediate_size):
            # whole SwiGLU MLP in one Pallas launch (ops/mlp_fused.py)
            h = rms_norm(x, blk["post_norm"], cfg.rms_eps)
            return x + mlp_apply_fused(h, gate, up, down, cfg).astype(x.dtype)
    h = rms_norm(x, blk["post_norm"], cfg.rms_eps)
    if capture:
        caps["gate_proj"] = caps["up_proj"] = h
    if "gateup_proj" in blk:
        gu = quant_linear_apply(blk["gateup_proj"], h, fused=fused)
        gate = gu[..., : cfg.intermediate_size]
        up = gu[..., cfg.intermediate_size :]
    else:
        gate = quant_linear_apply(blk["gate_proj"], h, fused=fused)
        up = quant_linear_apply(blk["up_proj"], h, fused=fused)
    act = jax.nn.silu(gate) * up
    if capture:
        caps["down_proj"] = act
    x = x + quant_linear_apply(blk["down_proj"], act, fused=fused)
    return x


def quantize_kv(x: jnp.ndarray):
    """Per-(batch, token, head) symmetric int8 quantization of a K/V slab
    [B, S, H, D] -> (int8 values, f32 scales [B, S, H])."""
    amax = jnp.clip(jnp.abs(x.astype(jnp.float32)).max(axis=-1), 1e-8, None)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def causal_mask(seq_len: int) -> jnp.ndarray:
    return jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))


def embed(params, input_ids):
    # jnp.asarray: params may carry host-numpy leaves (layer-streaming loader)
    return jnp.asarray(params["embed"])[input_ids]


def unembed(params, cfg: LlamaConfig, h, fused=True):
    if cfg.tie_embeddings:
        return h @ params["embed"].T.astype(h.dtype)
    return quant_linear_apply(params["lm_head"], h, fused=fused)


def forward(params, cfg: LlamaConfig, input_ids: jnp.ndarray, fused: bool = True):
    """Full forward: input_ids [B,S] -> logits [B,S,V] (prefill / eval path)."""
    B, S = input_ids.shape
    x = embed(params, input_ids)
    positions = jnp.arange(S)
    cos, sin = rope_tables(cfg, positions)
    mask = causal_mask(S)
    for blk in params["layers"]:
        x, _, _ = block_apply(blk, x, cos, sin, mask, cfg, fused=fused)
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return unembed(params, cfg, x, fused=fused)


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray, ignore: int = -100):
    """Token-mean NLL over shifted (logits[:, :-1], labels[:, 1:]).

    Matches HF CausalLM loss consumed by the reference's compute_ppl
    (/root/reference/mi_optimize/benchmark.py:20-37). Returns (loss, count).
    """
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = labels[:, 1:]
    valid = tgt != ignore
    tgt_safe = jnp.where(valid, tgt, 0)
    nll = -jnp.take_along_axis(lp, tgt_safe[..., None], axis=-1)[..., 0]
    count = valid.sum()
    loss = jnp.where(valid, nll, 0.0).sum() / jnp.maximum(count, 1)
    return loss, count
