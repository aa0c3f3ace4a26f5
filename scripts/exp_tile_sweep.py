#!/usr/bin/env python
"""Megakernel tile re-sweep after the grouped-rescale dequant (round 3).

The round-2 sweep (model_fused.py header) picked (tka,to,ti)=(512,512,1024)
with 1024-wide qkv/o tiles measured SLOWER — the classic dequant's
[1024,N] f32 FMA transients blew the VPU working set. Grouped rescale
removed the per-value FMA, so the transient mix changed; re-measure.
Each config needs a fresh process (tile env vars are read at trace time).
"""
import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

CONFIGS = [
    {},                                            # default (512,512,1024)
    {"MI_TKA": "1024", "MI_TO": "1024"},
    {"MI_TKA": "1024"},
    {"MI_TIM": "2816"},                            # ni: 11 -> 4 (pad 11264)
    {"MI_TKA": "1024", "MI_TO": "1024", "MI_TIM": "2816"},
]

for cfg in CONFIGS:
    env = dict(os.environ, MI_BENCH_KERNELS="0", **cfg)
    r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       env=env, capture_output=True, text=True, timeout=900)
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("{")), None)
    val = json.loads(line)["value"] if line else f"FAIL rc={r.returncode}"
    print(json.dumps({"tiles": cfg or {"default": "512,512,1024"},
                      "tokens_per_s": val}), flush=True)
    if not line:
        print(r.stderr[-500:], flush=True)
