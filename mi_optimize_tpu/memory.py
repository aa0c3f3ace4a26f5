"""Memory/residency management: device ⇄ host ⇄ disk value placement.

Parity target: /root/reference/mi_optimize/memory/__init__.py — `clear_mem`
(:10), the `Memory` value wrapper with cpu/cuda/disk residency (:43-109) and
the `MEMORY_BANK` singleton with tempdir spill (:111-138). TPU-native notes:
JAX owns an async allocator, so `clear_mem` maps to freeing references +
(optionally) `jax.clear_caches`; residency moves are `jax.device_put` /
`jax.device_get`; disk spill stores raw numpy (no pickled modules).

Used by the calibration engine for layer streaming and available to users for
giant-model quantization on small hosts.
"""
from __future__ import annotations

import gc
import os
import tempfile
import uuid
from typing import Dict, Optional

import jax
import numpy as np


def clear_mem(clear_jit_cache: bool = False) -> None:
    """Drop python garbage; optionally clear jit caches (expensive)."""
    gc.collect()
    if clear_jit_cache:
        jax.clear_caches()


def live_device_bytes() -> int:
    """Approximate bytes of live buffers on the default device."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", 0))
    except Exception:
        return 0


def show_memory(prefix: str = "") -> str:
    s = f"{prefix}device bytes_in_use={live_device_bytes()/1e9:.2f}GB"
    return s


class Memory:
    """A value with explicit residency: 'device' | 'host' | 'disk'."""

    def __init__(self, value, desc: str = "host", spill_dir: Optional[str] = None):
        self._spill_dir = spill_dir or tempfile.gettempdir()
        self._path: Optional[str] = None
        self._value = None
        self.desc = "host"
        self._set(value, "host" if not isinstance(value, jax.Array) else "device")
        if desc != self.desc:
            self.to(desc)

    def _set(self, value, desc):
        self._value = value
        self.desc = desc

    @property
    def value(self):
        if self.desc == "disk":
            arr = np.load(self._path)
            return arr
        return self._value

    def to(self, desc: str) -> "Memory":
        if desc == self.desc:
            return self
        val = self.value
        if desc == "device":
            self._set(jax.device_put(val), "device")
        elif desc == "host":
            self._set(np.asarray(val), "host")
        elif desc == "disk":
            path = os.path.join(self._spill_dir, f"mi_tpu_{uuid.uuid4().hex}.npy")
            np.save(path, np.asarray(val))
            self._path = path
            self._set(None, "disk")
        else:
            raise ValueError(f"unknown residency {desc!r}")
        if desc != "disk" and self._path:
            try:
                os.remove(self._path)
            except OSError:
                pass
            self._path = None
        return self

    def delete(self):
        if self._path:
            try:
                os.remove(self._path)
            except OSError:
                pass
        self._value = None


class MemoryBank:
    """Named registry of Memory values with a shared spill directory."""

    def __init__(self):
        self._dir = tempfile.mkdtemp(prefix="mi_tpu_bank_")
        self._values: Dict[str, Memory] = {}

    def add_value(self, name: str, value, desc: str = "host") -> Memory:
        m = Memory(value, desc=desc, spill_dir=self._dir)
        self._values[name] = m
        return m

    def get(self, name: str) -> Memory:
        return self._values[name]

    def pop(self, name: str):
        m = self._values.pop(name)
        m.delete()

    def clear(self):
        for m in self._values.values():
            m.delete()
        self._values.clear()


MEMORY_BANK = MemoryBank()
