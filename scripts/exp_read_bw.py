#!/usr/bin/env python
"""True read-only HBM bandwidth (round-1's 361GB/s was elementwise r+w)."""
import json, sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np

GB = 1024 ** 3
a = jnp.ones((2 * GB // 4,), jnp.float32)  # 2 GB

@jax.jit
def rd(a, s):
    # chained read-only reductions; each must consume the seed so XLA can't CSE
    for i in range(4):
        s = s + (a * (1.0 + s * 1e-30)).sum()
    return s

s = rd(a, jnp.float32(0.0)); _ = float(s)
t0 = time.perf_counter(); s = rd(a, jnp.float32(1e-6)); _ = float(s)
dt = time.perf_counter() - t0
print(json.dumps({"what": "read_only_bw", "GBps": round(4 * 2 / dt, 1)}))
