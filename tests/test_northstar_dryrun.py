"""North-star trigger stays loaded (round 4, VERDICT item 8): the
one-command repro script must run its ENTIRE pipeline — HF checkpoint load
-> fp PPL -> GPTQ int4 g128 calibration through the exact north-star YAML ->
quantized PPL through the serving path -> delta report — against a
synthesized tiny checkpoint, so that the day a real Llama-2-7B is mountable
the Δ-table falls out with zero new code.

Slow-marked: the CPU fp-PPL compile dominates (~2-10 min)."""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_repro_northstar_dry_run(tmp_path):
    out = tmp_path / "ns.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "repro_northstar.py"),
         "--dry-run", "--output-json", str(out)],
        env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["dry_run"] is True and res["pass"] is None
    assert res["fp_ppl"]["wikitext2"] > 1.0
    assert res["quant_ppl"]["wikitext2"] > 1.0
    assert "quantize" in res["wall_s"]
