#!/usr/bin/env python
"""Spec-dec WIN demonstration on the real chip (round 4, VERDICT item 3).

Every prior on-chip spec-dec measurement used random-init weights, whose
draft/target greedy agreement is ~1/V — the feature lost in every recorded
run and its win was a projection. This run uses PLANTED-structure models
(utils/planted.py): greedy decoding follows a fixed token map with logit
margins that dwarf int4 quantization and bf16 noise, so a 2-layer draft
sharing the target's map agrees at rate ~1.0, and a draft with 30% of its
map redirected agrees at ~0.7 — controllable, *measured* accept rates with
a genuinely 16x-cheaper draft. Decode COST equals a real checkpoint's (all
weight traffic identical; only o/down content is zero), so the tokens/s here
are what a real 7B target + distilled 2-layer draft of that agreement would
deliver.

Prints one JSON line per configuration: plain megakernel baseline, then
spec-dec k in {4, 8} at alpha ~ 1.0 and alpha ~ 0.7.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.serving import fuse_for_serving, init_cache, prefill
from mi_optimize_tpu.serving.speculative import speculative_generate

if os.environ.get("MI_SMOKE"):
    cfg = LlamaConfig(vocab_size=128, hidden_size=512, intermediate_size=1024,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=128,
                      max_seq_len=512)
    NEW = 8
else:
    cfg = LlamaConfig.llama2_7b()
    NEW = 128   # r5: single-dispatch windows carry a ~24 ms dispatch+pull
                # RTT (BENCH_DETAILS r5); 128 tokens amortizes it <10%/side
rng = np.random.default_rng(0)
prompt = rng.integers(0, cfg.vocab_size, (1, 64))


import dataclasses

from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.utils.planted import build_planted_llama, planted_map

print("# building planted target + 2 drafts (on-device)...", flush=True)
t0 = time.time()
m_t = planted_map(cfg.vocab_size)
target = fuse_for_serving(Model(
    config=cfg, params=build_planted_llama(cfg, m_t), family="llama"))
dcfg = dataclasses.replace(cfg, num_layers=2)
draft_hi = fuse_for_serving(Model(
    config=dcfg, params=build_planted_llama(dcfg, m_t), family="llama"))
m_lo = planted_map(cfg.vocab_size, disagree_frac=0.30)
draft_lo = fuse_for_serving(Model(
    config=dcfg, params=build_planted_llama(dcfg, m_lo), family="llama"))
print(f"# built in {time.time()-t0:.0f}s", flush=True)


def _chain_from(t0, n):
    seq, t = [], int(t0)
    for _ in range(n):
        t = int(m_t[t])
        seq.append(t)
    return seq


def expected_chain(n):
    seq, t = [], int(prompt[0, -1])
    for _ in range(n):
        t = int(m_t[t])
        seq.append(t)
    return seq


def timed(name, fn, check_chain=True):
    toks, stats = fn()
    flat = np.asarray(toks).reshape(-1)
    t0 = time.perf_counter()
    toks, stats = fn()
    dt = time.perf_counter() - t0
    flat = np.asarray(toks).reshape(-1)
    got = flat[prompt.shape[1]:prompt.shape[1] + NEW].tolist()
    rec = {"what": name, "tokens_per_s": round(NEW / dt, 2),
           **{k: round(v, 3) if isinstance(v, float) else v
              for k, v in stats.items()}}
    if check_chain:
        rec["follows_planted_map"] = got == expected_chain(NEW)
    print(json.dumps(rec), flush=True)
    return NEW / dt


# plain single-stream megakernel baseline (the bar spec-dec must beat),
# via the same whole-model path bench.py records
from mi_optimize_tpu.serving.megadecode import (
    decode_loop_model, stack_cache, stack_serving)

st = stack_serving(target)
cache = init_cache(cfg, 1, 384, jnp.int8)
logits, cache = prefill(target.params, cfg, jnp.asarray(prompt), cache,
                        jax.default_backend() == "tpu")
first = jnp.argmax(logits, -1)[:, None]
scache = stack_cache(cache)


def plain():
    toks, _ = decode_loop_model(target.params, st[0], st[1], cfg, first,
                                scache, jnp.asarray(prompt.shape[1]), NEW,
                                interpret=jax.default_backend() != "tpu")
    _ = int(np.asarray(toks).reshape(-1)[-1])
    return np.concatenate([prompt, np.asarray(toks)], axis=1), {}


base = timed("plain_megakernel", plain, check_chain=False)

# speculative_generate stacks target+draft internally — free the baseline's
# copies first (three live 7B stacks OOM the chip)
import gc

# STEADY-STATE spec measurement (r4 fix): time the scan-segment loop alone
# against the plain decode loop alone — both with caches prefilled OUTSIDE
# the timed region. (The first version timed speculative_generate whole,
# charging spec with both models' prefills + cache conversions while the
# plain baseline paid none — that methodology error, not the round cost,
# produced the apparent 3x loss: scripts/exp_spec_roundcost.py measured the
# segment itself at ~20 ms/round vs 184 for the while_loop variant.)
from mi_optimize_tpu.serving.flatdecode import stack_cache_flat, stack_flat
from mi_optimize_tpu.serving.megadecode import stack_cache_batched, stack_lm
from mi_optimize_tpu.serving.speculative import _spec_scan_flat

tlmres = stack_lm(target, st[1])    # r5: fused C-row verify lm_head
TLM, TLM_META = tlmres if tlmres is not None else (None, None)

KS = tuple(int(x) for x in
           os.environ.get("MI_SPEC_KS", "4,8").split(",")
           if x) if os.environ.get("MI_SPEC_KS") != "none" else ()
DRAFTS = ((("alpha~1.0", draft_hi),) if os.environ.get("MI_SPEC_HI_ONLY")
          else (("alpha~1.0", draft_hi), ("alpha~0.7", draft_lo)))
for k in KS:
    for name, d in DRAFTS:
        dst_d, dmeta_d = stack_serving(d)
        dfl = stack_flat(d, (dst_d, dmeta_d))
        assert dfl is not None
        dc0 = init_cache(d.config, 1, 384, jnp.int8)
        _, dc0 = prefill(d.params, d.config, jnp.asarray(prompt), dc0, True)
        fdc = stack_cache_flat(dc0)
        tc0 = init_cache(cfg, 1, 384, jnp.int8)
        lg, tc0 = prefill(target.params, cfg, jnp.asarray(prompt), tc0, True)
        stc = stack_cache_batched(tc0)
        first_tok = jnp.asarray(jnp.argmax(lg, -1).reshape(-1)[0], jnp.int32)
        M = -(-NEW // (k + 1))

        # same gating as production (speculative.py): fused C-row verify lm
        # only for C = k+1 <= 6 — measured ~3x loss at C=9 (exp_lm_tile_c9)
        use_lm = TLM is not None and k + 1 <= 6

        def seg():
            emits, naccs, last, pos, _tc, _dc = _spec_scan_flat(
                target.params, d.params, st[0], dfl[0], st[1], dfl[1],
                cfg, d.config, stc, fdc, first_tok,
                jnp.asarray(prompt.shape[1]), k, M,
                tlm=TLM if use_lm else None,
                tlm_meta=TLM_META if use_lm else None)
            return np.asarray(emits), np.asarray(naccs)

        emits, naccs = seg()
        t0 = time.perf_counter()
        emits, naccs = seg()
        dt = time.perf_counter() - t0
        n_tok = int(naccs.sum()) + M
        got = []
        for i in range(M):
            got.extend(emits[i, : int(naccs[i]) + 1].tolist())
        tps = n_tok / dt
        print(json.dumps({
            "what": f"specdec-steady k={k} 2L-draft {name}",
            "tokens_per_s": round(tps, 2),
            "rounds": M, "tokens": n_tok,
            "ms_per_round": round(dt / M * 1e3, 2),
            "accept_rate": round(float(naccs.sum()) / (M * k), 3),
            # emits start AFTER first_tok (= chain[0]); follow from there
            "follows_planted_map": (
                got == _chain_from(int(first_tok), len(got))
                if name == "alpha~1.0" else None),
            "speedup_vs_plain": round(tps / base, 3),
        }), flush=True)
        dst_d = dfl = fdc = stc = dc0 = tc0 = None
        gc.collect()


# ---- adaptive k vs fixed k at mid-alpha (r5, VERDICT item 6) -------------
# Same methodology for all three (speculative_generate whole, second call
# timed — each pays its own prefills identically), 2L draft with 30% of the
# planted map redirected (per-token agreement q ~ 0.7).
if os.environ.get("MI_SPEC_ADAPTIVE") == "0":
    sys.exit(0)
st = None
gc.collect()

m_vlo = planted_map(cfg.vocab_size, disagree_frac=0.55)
draft_vlo = fuse_for_serving(Model(
    config=dcfg, params=build_planted_llama(dcfg, m_vlo), family="llama"))

for dname, dm in (("alpha~0.7", draft_lo), ("alpha~0.45", draft_vlo)):
    for kk in (4, 8, "auto"):
        def run(kk=kk, dm=dm):
            return speculative_generate(target, dm, prompt,
                                        max_new_tokens=NEW, k=kk, fused=True,
                                        cache_dtype=jnp.int8,
                                        draft_megakernel=True)

        toks, stats = run()
        t0 = time.perf_counter()
        toks, stats = run()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "what": f"specdec-generate k={kk} 2L-draft {dname}",
            "tokens_per_s": round(NEW / dt, 2),
            "accept_rate": round(stats["accept_rate"], 3),
            **({"adaptive_k": stats.get("adaptive_k"),
                "q_hat": round(stats.get("q_hat", 0), 3)} if kk == "auto"
               else {}),
        }), flush=True)
        gc.collect()
