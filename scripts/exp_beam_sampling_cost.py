#!/usr/bin/env python
"""Beam-search and parallel-sampling step cost on the real chip (round 4,
the last cell of VERDICT item 2's serving-composition matrix).

Both features ride the paged batched megakernel — one launch advances all
beams / all sampled forks — so their step cost should track the B-slot
paged aggregate (exp_paged_batched: 451-456 tok/s at B=8 T=512), plus
beam's host-side page-table copy-on-write reordering. Measured end-to-end:

  beam     beam_search(beam_width=4), wall for 24 steps -> steps/s and
           slot-steps/s (4 hypotheses advance per step)
  sampling PagedMegaBatcher n=4 parallel forks, temperature 0.8 ->
           aggregate tok/s over the forks

7B int4 g128 random-init weights (costs are content-independent).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_quantized_llama_on_device
from mi_optimize_tpu.models.llama import LlamaConfig
from mi_optimize_tpu.models.model import Model
from mi_optimize_tpu.serving import fuse_for_serving
from mi_optimize_tpu.serving.beam import beam_search
from mi_optimize_tpu.serving.paged import PagedMegaBatcher

cfg = LlamaConfig.llama2_7b()
model = fuse_for_serving(Model(
    config=cfg, params=build_quantized_llama_on_device(cfg, groupsize=128),
    family="llama"))

rng = np.random.default_rng(0)
prompt = rng.integers(0, cfg.vocab_size, (96,))
NEW = 24
W = 4

# ---- beam search: all W beams in one paged launch per step ---------------
hyps = beam_search(model, prompt, beam_width=W, max_new_tokens=NEW,
                   page_size=128, max_len=512)              # compile + warm
t0 = time.perf_counter()
hyps = beam_search(model, prompt, beam_width=W, max_new_tokens=NEW,
                   page_size=128, max_len=512)
dt = time.perf_counter() - t0
print(json.dumps({
    "what": f"beam_search W={W}", "steps": NEW,
    "ms_per_step": round(dt / NEW * 1e3, 2),
    "slot_steps_per_s": round(W * NEW / dt, 2),
    "n_hyps": len(hyps),
}), flush=True)

# ---- parallel sampling: n forks, shared prompt pages ---------------------
pb = PagedMegaBatcher(model, n_slots=W, max_len=512, page_size=128)
rids = pb.add_request(prompt.copy(), max_new_tokens=NEW, n=W,
                      temperature=0.8, seed=3)
assert rids is not None
while any(r is not None for r in pb.slot_req):              # compile + warm
    pb.step()

pb2 = PagedMegaBatcher(model, n_slots=W, max_len=512, page_size=128)
rids = pb2.add_request(prompt.copy(), max_new_tokens=NEW, n=W,
                       temperature=0.8, seed=7)
t0 = time.perf_counter()
n_tok = 0
while any(r is not None for r in pb2.slot_req):
    n_tok += len(pb2.step())
dt = time.perf_counter() - t0
print(json.dumps({
    "what": f"parallel_sampling n={W}", "tokens": n_tok,
    "aggregate_tokens_per_s": round(n_tok / dt, 2),
    "ms_per_step": round(dt / NEW * 1e3, 2),
}), flush=True)
