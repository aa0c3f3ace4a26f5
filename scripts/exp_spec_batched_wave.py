#!/usr/bin/env python
"""Waved vs single-launch chunk verify in the batched spec-dec path (r5).

PagedSpeculativeBatcher's verify ran B*(k+1) virtual rows in ONE chunk
launch — 4 slots x C=5 = 20 rows, deep past the bsz VMEM cliff
(exp_chunk_c_sweep: per-call cost ~4x at 13-17 rows) — and pulled the
full [B, C, V] logits (~2.5 MB) over the ~MB/s host link. The r5 fix
waves the verify at <= 8 rows/launch and pulls device argmaxes. A/B via
verify_wave_slots: 4 (the old single 20-row launch) vs default (G=1).

Planted 7B target + 2-layer agreeing draft (accept ~ 1.0) so both arms
emit identical exact chains. 4 slots, 24 tokens each.
Usage: timeout 2400 python scripts/exp_spec_batched_wave.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving
from mi_optimize_tpu.serving.paged import PagedSpeculativeBatcher
from mi_optimize_tpu.utils.planted import build_planted_llama, planted_map

cfg = LlamaConfig.llama2_7b()
print("# building planted target + draft...", flush=True)
m_t = planted_map(cfg.vocab_size)
target = fuse_for_serving(Model(
    config=cfg, params=build_planted_llama(cfg, m_t), family="llama"))
dcfg = dataclasses.replace(cfg, num_layers=2)
draft = fuse_for_serving(Model(
    config=dcfg, params=build_planted_llama(dcfg, m_t), family="llama"))

rng = np.random.default_rng(0)
prompts = [rng.integers(0, cfg.vocab_size, (64,)) for _ in range(4)]
NEW = 24


def run(wave, tag):
    pb = PagedSpeculativeBatcher(target, draft, k=4, n_slots=4, max_len=256,
                                 verify_wave_slots=wave)
    for p in prompts:
        assert pb.add_request(p.copy(), max_new_tokens=NEW) is not None
    pb.step()                              # compile + warm
    t0 = time.perf_counter()
    n_tok = 0
    rounds = 0
    while any(r is not None for r in pb.slot_req):
        got = pb.step()
        n_tok += sum(len(v) for v in got.values())
        rounds += 1
    dt = time.perf_counter() - t0
    print(json.dumps({
        "what": f"paged_spec_4slots_k4_{tag}",
        "ms_per_round": round(dt / max(rounds, 1) * 1e3, 2),
        "agg_tok_per_s": round(n_tok / dt, 1),
        "accept_rate": round(pb.accepted / max(pb.proposed, 1), 3),
    }), flush=True)


run(4, "single20rowlaunch")
run(None, "waved_G1")
