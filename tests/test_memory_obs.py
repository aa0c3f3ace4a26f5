"""Memory residency manager + observability manifest tests."""
import json

import numpy as np

from mi_optimize_tpu.memory import Memory, MemoryBank, clear_mem, show_memory
from mi_optimize_tpu.utils import RunManifest, config_hash


def test_memory_residency_roundtrip(tmp_path):
    v = np.arange(12, dtype=np.float32).reshape(3, 4)
    m = Memory(v, desc="host", spill_dir=str(tmp_path))
    m.to("disk")
    assert m.desc == "disk"
    np.testing.assert_array_equal(m.value, v)
    m.to("device")
    assert m.desc == "device"
    np.testing.assert_array_equal(np.asarray(m.value), v)
    m.to("host")
    np.testing.assert_array_equal(m.value, v)


def test_memory_bank():
    bank = MemoryBank()
    bank.add_value("a", np.ones(4), desc="disk")
    np.testing.assert_array_equal(bank.get("a").value, np.ones(4))
    bank.clear()
    clear_mem()
    assert "bytes_in_use" in show_memory() or "device" in show_memory()


def test_run_manifest(tmp_path):
    from mi_optimize_tpu.quant.config import QuantConfig

    cfg = QuantConfig(algo="rtn", wbit="int4")
    m = RunManifest("test", config=cfg)
    with m.phase("calibrate"):
        pass
    m.metric("ppl", 5.47)
    p = m.save(str(tmp_path / "run.json"))
    data = json.loads(open(p).read())
    assert data["metrics"]["ppl"] == 5.47
    assert "calibrate" in data["phases"]
    assert len(data["config_hash"]) == 16
    assert config_hash(cfg) == data["config_hash"]


def test_latency_harness_api():
    import jax.numpy as jnp

    from mi_optimize_tpu.eval.latency import decode_throughput, forward_latency
    from mi_optimize_tpu.models.model import Model

    m = Model.tiny_llama()
    f = forward_latency(m, batch=1, seqlen=16, warmup=1, iters=2, fused=False)
    assert "avg_ms" in f and "p50_ms" in f
    d = decode_throughput(m, batch=1, prompt_len=8, decode_tokens=4, warmup=1,
                          fused=False, cache_dtype=jnp.float32)
    assert d["tokens_per_s_per_chip"] > 0 and 0 < d["roofline_frac"]
