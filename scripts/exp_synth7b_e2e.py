#!/usr/bin/env python
"""Synthetic end-to-end at FULL 7B shapes, entirely on the chip (round 3,
VERDICT item 7: the closest offline proxy to the north-star Δ≤0.1).

Full GPTQ int4 g128 layer-sequential calibration of a random-init
32-layer / 4096-hidden / 11008-intermediate / 32000-vocab llama
(LlamaConfig.llama2_7b), then PPL fp-vs-quantized on identical held-out
synthetic batches, the quantized side through the FUSED serving path.

Memory story at real scale: the fp model (13.5 GB bf16) NEVER fully
materializes. Blocks are generated lazily on-device from a deterministic
per-block PRNG key (a Sequence the sequential driver iterates), standing in
for the host/disk fetch of the reference's layer-streaming discipline
(llama_seq.py:65-158) — host<->device is ~1 MB/s here, so regeneration IS
the only viable stream source. Peak HBM ≈ one fp block (0.4 GB) + the
largest Hessian (11008^2 f32 = 0.48 GB) + accumulated packed blocks
(3.4 GB total), far under the 16 GB chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mi_optimize_tpu.models import llama
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.quant_linear import QuantizedLinear, quant_linear_apply
from mi_optimize_tpu.quant.base import get_algo
from mi_optimize_tpu.quant.calibrate import _block_forward, sequential_quantize
from mi_optimize_tpu.quant.config import QuantConfig

if os.environ.get("MI_SYNTH_TINY", "0") == "1":  # CPU smoke of the pipeline
    cfg = LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                      num_layers=2, num_heads=4, num_kv_heads=4, head_dim=64,
                      max_seq_len=256)
    SEQLEN, NCAL, NEVAL = 128, 2, 2
else:
    cfg = LlamaConfig.llama2_7b()
    SEQLEN = 2048
    NCAL = 4
    NEVAL = 4
DT = jnp.bfloat16

h, q_dim = cfg.hidden_size, cfg.num_heads * cfg.head_dim
kv_dim = cfg.num_kv_heads * cfg.head_dim
root = jax.random.PRNGKey(42)


def _mk_w(key, out_f, in_f):
    return (jax.random.normal(key, (out_f, in_f), jnp.float32)
            * (in_f ** -0.5)).astype(DT)


@jax.jit
def _mk_block_arrays(key):
    ks = jax.random.split(key, 7)
    return {
        "q_proj": _mk_w(ks[0], q_dim, h),
        "k_proj": _mk_w(ks[1], kv_dim, h),
        "v_proj": _mk_w(ks[2], kv_dim, h),
        "o_proj": _mk_w(ks[3], h, q_dim),
        "gate_proj": _mk_w(ks[4], cfg.intermediate_size, h),
        "up_proj": _mk_w(ks[5], cfg.intermediate_size, h),
        "down_proj": _mk_w(ks[6], h, cfg.intermediate_size),
    }


def make_fp_block(i):
    ws = _mk_block_arrays(jax.random.fold_in(root, i))
    blk = {n: QuantizedLinear.fp(w) for n, w in ws.items()}
    blk["input_norm"] = jnp.ones((h,), DT)
    blk["post_norm"] = jnp.ones((h,), DT)
    return blk


class LazyBlocks:
    """Sequence of on-device-regenerated fp blocks for the sequential driver."""

    def __len__(self):
        return cfg.num_layers

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self)))]
        return make_fp_block(i)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


ek, lk = jax.random.split(jax.random.fold_in(root, 10_000))
embed = (jax.random.normal(ek, (cfg.vocab_size, h), jnp.float32) * 0.02).astype(DT)
lm_head = QuantizedLinear.fp(_mk_w(lk, cfg.vocab_size, h))
params = {"embed": embed, "layers": LazyBlocks(),
          "final_norm": jnp.ones((h,), DT), "lm_head": lm_head}

rng = np.random.default_rng(0)
cal = [rng.integers(0, cfg.vocab_size, (1, SEQLEN)) for _ in range(NCAL)]
ev = [jnp.asarray(rng.integers(0, cfg.vocab_size, (1, SEQLEN))) for _ in range(NEVAL)]

cos, sin = llama.rope_tables(cfg, jnp.arange(SEQLEN))
mask = llama.causal_mask(SEQLEN)


@jax.jit
def _embed(params_embed, ids):
    return jnp.take(params_embed, ids, axis=0)


@jax.jit
def _nll(logits_x, lm, ids):
    logits = quant_linear_apply(lm, logits_x, fused=False).astype(jnp.float32)
    lp = jax.nn.log_softmax(logits[:, :-1], -1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
    return nll.sum(), tgt.size


def ppl_streamed(get_block, lm, fused):
    """Layer-streamed PPL: one block resident at a time (fp side), or over
    the materialized packed blocks (quantized side, fused kernels)."""
    total, count = 0.0, 0
    step = jax.jit(lambda blk, x: llama.block_apply(
        blk, x, cos, sin, mask, cfg, capture=False, fused=fused)[0])
    for ids in ev:
        x = _embed(params["embed"], ids)
        for i in range(cfg.num_layers):
            x = step(get_block(i), x)
        x = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
        s, n = _nll(x, lm, ids)
        total += float(s)
        count += n
    return float(np.exp(total / count))


def log_line(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
fp_ppl = ppl_streamed(make_fp_block, lm_head, fused=False)
t_fp = time.time() - t0
log_line(what="fp_ppl (layer-streamed, regenerated blocks)", ppl=round(fp_ppl, 4),
         wall_s=round(t_fp, 1))

qcfg = QuantConfig.from_yaml(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "configs",
    "gptq_quant_config.yaml"))
algo = get_algo(qcfg.algo, qcfg)
t0 = time.time()
qparams = sequential_quantize(params, cfg, qcfg, algo, cal,
                              offload_host=False)
jax.block_until_ready(jax.tree.leaves(qparams["layers"][-1]["down_proj"].packed))
t_cal = time.time() - t0
log_line(what="GPTQ int4 g128 layer-sequential calibration (32 blocks, on-chip)",
         wall_s=round(t_cal, 1), nsamples=NCAL, seqlen=SEQLEN)

t0 = time.time()
q_ppl = ppl_streamed(lambda i: qparams["layers"][i], lm_head, fused=True)
t_q = time.time() - t0
log_line(what="quantized_ppl (fused pallas kernels)", ppl=round(q_ppl, 4),
         wall_s=round(t_q, 1))

log_line(what="SUMMARY synth-7B e2e", fp_ppl=round(fp_ppl, 4),
         quant_ppl=round(q_ppl, 4), delta=round(q_ppl - fp_ppl, 4),
         rel_delta_pct=round(100 * (q_ppl - fp_ppl) / fp_ppl, 4),
         calibration_wall_s=round(t_cal, 1),
         total_wall_s=round(t_fp + t_cal + t_q, 1))
