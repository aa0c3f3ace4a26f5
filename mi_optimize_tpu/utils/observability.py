"""Structured observability: per-run JSON manifests + timing/tracing helpers.

The reference's observability is print/log statements and tqdm bars
(SURVEY.md §5.5); its acceptance criteria are numeric deltas, so here the
primary artifact is a structured manifest: config hash, accuracy numbers,
throughput, per-phase wall-clock — written as JSON next to the checkpoint.

`trace()` wraps jax.profiler for per-kernel inspection (SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import hashlib
import json
import logging
import os
import time
from dataclasses import asdict, is_dataclass
from typing import Any, Dict, Optional

log = logging.getLogger(__name__)


def config_hash(cfg) -> str:
    d = asdict(cfg) if is_dataclass(cfg) else dict(cfg)
    blob = json.dumps(d, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class RunManifest:
    """Accumulates phases/metrics for one run; writes a single JSON artifact."""

    def __init__(self, name: str, config=None):
        self.data: Dict[str, Any] = {
            "name": name,
            "started_at": time.time(),
            "phases": {},
            "metrics": {},
        }
        if config is not None:
            self.data["config"] = asdict(config) if is_dataclass(config) else config
            self.data["config_hash"] = config_hash(config)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.data["phases"][name] = round(time.time() - t0, 3)
            log.info("phase %s: %.2fs", name, self.data["phases"][name])

    def metric(self, name: str, value):
        self.data["metrics"][name] = value

    def save(self, path: str):
        self.data["finished_at"] = time.time()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.data, f, indent=2, default=float)
        return path


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    logdir = logdir or os.environ.get("MI_TPU_TRACE_DIR", "/tmp/mi_tpu_trace")
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
