#!/usr/bin/env python
"""Wave-batching A/B at the batcher level (r5): PagedMegaBatcher with 16
slots stepping in waves of 8 (default, _wave_size) vs one B=16 launch
(wave_slots=16). The scan-level data says two B=8 launches (~28 ms) beat
one B=16 (35 ms) past the bsz VMEM cliff; this confirms it end-to-end
through the production step() (per-step blocking pull included — every
step also pays the ~24 ms tunnel RTT in both arms).

7B int4 g128 random-init, 16 short prompts, 24 decode steps timed.
Usage: timeout 2400 python scripts/exp_wave_batcher.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from bench import build_quantized_llama_on_device
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving
from mi_optimize_tpu.serving.paged import PagedMegaBatcher

cfg = LlamaConfig.llama2_7b()
print("# building 7B int4 on device...", flush=True)
model = fuse_for_serving(Model(
    config=cfg, params=build_quantized_llama_on_device(cfg, groupsize=128),
    family="llama"))

rng = np.random.default_rng(0)
prompts = [rng.integers(0, cfg.vocab_size, (96,)) for _ in range(16)]
N = 24


def run(wave):
    pb = PagedMegaBatcher(model, n_slots=16, max_len=512, page_size=128,
                          wave_slots=wave)
    for p in prompts:
        assert pb.add_request(p.copy(), max_new_tokens=N + 8) is not None
    pb.step()                        # compile + warm
    t0 = time.perf_counter()
    n_tok = 0
    for _ in range(N):
        n_tok += len(pb.step())
    dt = time.perf_counter() - t0
    print(json.dumps({
        "what": f"paged_batcher_16slots_wave{wave or 'default8'}",
        "ms_per_step": round(dt / N * 1e3, 2),
        "agg_tok_per_s": round(n_tok / dt, 1),
    }), flush=True)


run(16)        # single B=16 launch per step
run(None)      # default: waves of 8
