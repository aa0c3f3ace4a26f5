#!/usr/bin/env python
"""Flat-megakernel tile sweep on the real chip (round 4).

The flat kernel (ops/model_flat.py) landed at 150.9 tok/s with defaults
(tkf=tof=1024 fetch / 512 compute subtiles, ti=1408, tv=3200); this sweeps
the fetch widths, MLP tile, and lm_head tile. Each config needs a fresh
process (env vars are read at trace time). bench.py runs the flat path
whenever stack_flat accepts the model, so it IS the measurement harness;
MI_BENCH_KERNELS=0 skips the per-kernel breakdown's extra compile.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

# round-1 sweep: default 150.0; 512/512 fetch 151.6; TIF=1024 153.1;
# TV=1280 149.8; TKF=2048 and TV=6400 catastrophic (57.5 / 58.2 — the
# blocks blow the 80MB scoped-VMEM budget and the pipeline thrashes).
# round-2 combos around the winners:
CONFIGS = [
    {"MI_TKF": "512", "MI_TOF": "512", "MI_TIF": "1024"},
    {"MI_TIF": "1024", "MI_TV": "1280"},
    {"MI_TKF": "512", "MI_TOF": "512", "MI_TIF": "1024", "MI_TV": "1280"},
    {"MI_TKF": "512", "MI_TOF": "512", "MI_TIF": "1024",
     "MI_DEQ_GROUPED": "0"},
]

for cfg in CONFIGS:
    env = dict(os.environ, MI_BENCH_KERNELS="0", **cfg)
    r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       env=env, capture_output=True, text=True, timeout=1500)
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("{")), None)
    val = json.loads(line)["value"] if line else f"FAIL rc={r.returncode}"
    print(json.dumps({"tiles": cfg or {"default": "1024/1024/1408/3200"},
                      "tokens_per_s": val}), flush=True)
    if not line:
        print((r.stderr or "")[-500:], flush=True)
