"""END-TO-END driver parity: the reference's actual pipeline vs ours.

Runs the reference's `llama_sequential` (torch, /root/reference/mi_optimize/
quantization/models/llama_seq.py:12-163) + `Benchmark.compute_ppl`
(benchmark.py:20-37) on a tiny random-init HF llama, and our
`quantize()` + `compute_ppl` on the SAME weights (via save_pretrained →
load_llama_from_hf) with the SAME calibration token batches, asserting
end-to-end perplexity agreement per algorithm. This certifies the whole
pipeline — calibration capture, stats accumulation, per-group sequential
order, smooth-factor folding, runtime activation quant — not just the
per-matrix transforms (those are tests/test_reference_parity.py).

Tolerances: RTN / SmoothQuant / ZeroQuant are deterministic transforms →
asserted at the north-star bound Δppl ≤ 0.1 directly. GPTQ/AWQ-family are
chaotically sensitive to the float chain (GPTQ error feedback propagates a
single rounding flip to all later columns; AWQ's 20-point grid argmin and
act-order's diag sort flip on ~1e-6 activation differences between torch and
XLA), so for them we assert a 0.5% RELATIVE ppl bound — 4× tighter than the
north-star Δ≤0.1 at the real-model ppl≈5.5 (≈2% relative). Identical-H
matrix-level bit parity for these algorithms is covered separately.

transformers-4.57 compat: the reference was written against the older HF
decoder-layer ABI (tuple returns, rotary inside attention). The `ref_env`
fixture patches LlamaDecoderLayer.forward to accept driver-style calls
(no position_embeddings → compute rotary, return a tuple) while leaving
full-model calls (position_embeddings provided) on 4.57 semantics. The
reference's GPTQ hook hardcodes CUDA storage (GPTQQuantizer.py:29-30); it is
remapped to the semantically-identical CPU hook.
"""
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytest.importorskip("torch")
pytest.importorskip("transformers")


def _ref_available():
    import os

    return os.path.isdir(REF)


pytestmark = [
    pytest.mark.slow,  # ~16 min: runs the torch reference per config
    pytest.mark.skipif(not _ref_available(), reason="reference unavailable"),
]


class _Stub(types.ModuleType):
    __file__ = "<stub>"
    __path__ = []

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        return _Stub(self.__name__ + "." + k)

    def __call__(self, *a, **kw):
        def deco(f):
            return f

        return deco


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    for mod in ["pynvml", "primefac", "gradio"]:
        sys.modules.setdefault(mod, _Stub(mod))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    torch.cuda.synchronize = lambda *a, **k: None

    from transformers import LlamaConfig, LlamaForCausalLM
    from transformers.models.llama import modeling_llama as ML

    if not getattr(ML.LlamaDecoderLayer.forward, "_mi_compat", False):
        _orig_fwd = ML.LlamaDecoderLayer.forward

        def _compat_forward(self, hidden_states, attention_mask=None, position_ids=None,
                            position_embeddings=None, **kw):
            legacy = position_embeddings is None
            if legacy:
                if not hasattr(self, "_compat_rotary"):
                    self._compat_rotary = ML.LlamaRotaryEmbedding(config=self.self_attn.config)
                position_embeddings = self._compat_rotary(hidden_states, position_ids)
            out = _orig_fwd(self, hidden_states, attention_mask=attention_mask,
                            position_ids=position_ids,
                            position_embeddings=position_embeddings, **kw)
            if legacy and not isinstance(out, tuple):
                out = (out,)
            return out

        _compat_forward._mi_compat = True
        ML.LlamaDecoderLayer.forward = _compat_forward

    # the reference's GPTQ/QuIP hooks hardcode 'cuda' tensor storage; remap to
    # the semantically-identical cpu variants (same math, different device)
    import mi_optimize.quantization.quantizer.GPTQQuantizer as RG
    import mi_optimize.quantization.quantizer.utils as RU

    RG.track_hessian_hook_to_cuda = RU.track_hessian_hook_to_cpu

    # the reference SpQR ctor cannot run as written: super().__init__(wbit=..)
    # mismatches BaseQuantizer(w_bits=..) (SpqrQuantizer.py:15 vs base.py:2) —
    # shim the kwarg names so the REAL ctor body executes (same shim as
    # tests/test_reference_parity.py::test_spqr_full_loop_parity)
    import mi_optimize.quantization.quantizer.base as RB

    if not getattr(RB.BaseQuantizer.__init__, "_mi_shim", False):
        _orig_init = RB.BaseQuantizer.__init__

        def _shim(self, *a, **kw):
            # only remap the misnamed kwargs; AWQ passes quant_hub_linear as
            # a keyword, SpQR positionally — accept both
            if "wbit" in kw:
                kw["w_bits"] = kw.pop("wbit")
            if "abit" in kw:
                kw["a_bits"] = kw.pop("abit")
            _orig_init(self, *a, **kw)

        _shim._mi_shim = True
        RB.BaseQuantizer.__init__ = _shim

    # tiny random-init llama; hidden/intermediate = 256 because the reference's
    # AWQ auto_clip asserts out_features % 256 == 0 (AWQQuantizer.py:160)
    hf_cfg = LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=256,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=4, max_position_embeddings=128,
                         attn_implementation="eager", use_cache=False,
                         tie_word_embeddings=False)
    torch.manual_seed(0)
    base = LlamaForCausalLM(hf_cfg).eval()
    ckpt = tmp_path_factory.mktemp("tiny_hf_llama")
    base.save_pretrained(str(ckpt), safe_serialization=True)

    rng = np.random.default_rng(0)
    calib = [rng.integers(3, 512, size=(1, 64)) for _ in range(4)]
    test = [rng.integers(3, 512, size=(1, 64)) for _ in range(4)]
    return {"ckpt": str(ckpt), "calib": calib, "test": test}


def _ref_quantize_ppl(env, algo, **kw):
    import torch
    from transformers import LlamaForCausalLM

    from mi_optimize.benchmark import Benchmark
    from mi_optimize.quantization.models import llama_sequential

    model = LlamaForCausalLM.from_pretrained(env["ckpt"],
                                             attn_implementation="eager").eval()
    m = llama_sequential(model, algo, [torch.tensor(b) for b in env["calib"]],
                         device="cpu", offload="cpu", skip_layers=["lm_head"],
                         layer_sequential=True, **kw)
    tok = types.SimpleNamespace(pad_token_id=None)
    return Benchmark().compute_ppl(m, tok, [torch.tensor(b) for b in env["test"]])


def _our_quantize_ppl(env, **cfg_kw):
    from mi_optimize_tpu.eval.ppl import compute_ppl
    from mi_optimize_tpu.models.loader import load_llama_from_hf
    from mi_optimize_tpu.quant.api import quantize
    from mi_optimize_tpu.quant.config import QuantConfig

    m = load_llama_from_hf(env["ckpt"])
    qm = quantize(m, QuantConfig(pack=False, **cfg_kw), calib_data=env["calib"])
    return compute_ppl(qm, env["test"], fused=False)


def _rp():
    from mi_optimize.quantization import Precision

    return Precision


# (name, reference llama_sequential kwargs factory, our QuantConfig kwargs, bound)
# bound: ("abs", x) → |Δppl| ≤ x;  ("rel", r) → |Δppl| ≤ r·ref_ppl
CASES = {
    "rtn": (
        lambda RP: dict(wbit=RP.INT4, abit=RP.FP16, w_qtype="per_group", w_groupsize=16),
        dict(algo="rtn", wbit="int4", abit="float16", w_qtype="per_group", w_groupsize=16),
        ("abs", 0.1),
    ),
    "smoothquant": (
        lambda RP: dict(wbit=RP.INT8, abit=RP.INT8, alpha=0.5, w_qtype="per_channel",
                        a_qtype="per_tensor", quantization_type="dynamic"),
        dict(algo="smoothquant", wbit="int8", abit="int8", alpha=0.5,
             w_qtype="per_channel", a_qtype="per_tensor", quantization_type="dynamic"),
        ("abs", 0.1),
    ),
    "zeroquant": (
        lambda RP: dict(wbit=RP.INT8, abit=RP.INT8, w_groupsize=16),
        dict(algo="zeroquant", wbit="int8", abit="int8", w_groupsize=16),
        ("abs", 0.1),
    ),
    "gptq": (
        lambda RP: dict(wbit=RP.INT4, abit=RP.FP16, blocksize=32, w_groupsize=16,
                        actorder=True),
        dict(algo="gptq", wbit="int4", abit="float16", blocksize=32, w_groupsize=16,
             actorder=True),
        ("rel", 0.005),
    ),
    "awq": (
        lambda RP: dict(wbit=RP.INT4, abit=RP.FP16, w_groupsize=16),
        dict(algo="awq", wbit="int4", abit="float16", w_groupsize=16),
        ("rel", 0.005),
    ),
    "awq+gptq": (
        lambda RP: dict(wbit=RP.INT4, abit=RP.FP16, w_groupsize=16, blocksize=32,
                        actorder=True),
        dict(algo="awq+gptq", wbit="int4", abit="float16", w_groupsize=16,
             blocksize=32, actorder=True),
        ("rel", 0.005),
    ),
    # SpQR: GPTQ-style loop + LOO outliers + double quant — chaotic like GPTQ
    "spqr": (
        lambda RP: dict(wbit=RP.INT4, abit=RP.FP16, w_groupsize=16,
                        qq_groupsize=16),
        dict(algo="spqr", wbit="int4", abit="float16", w_groupsize=16,
             qq_groupsize=16),
        ("rel", 0.01),
    ),
    "smoothquant+gptq": (
        lambda RP: dict(wbit=RP.INT4, abit=RP.INT8, alpha=0.5, w_qtype="per_channel",
                        a_qtype="per_tensor", quantization_type="dynamic",
                        blocksize=32, w_groupsize=16, actorder=True),
        dict(algo="smoothquant+gptq", wbit="int4", abit="int8", alpha=0.5,
             w_qtype="per_channel", a_qtype="per_tensor",
             quantization_type="dynamic", blocksize=32, w_groupsize=16,
             actorder=True),
        ("rel", 0.005),
    ),
}


@pytest.mark.parametrize("name", list(CASES))
def test_driver_level_ppl_parity(ref_env, name):
    ref_kw_fn, our_kw, (kind, bound) = CASES[name]
    RP = _rp()
    ref_ppl = _ref_quantize_ppl(ref_env, name, **ref_kw_fn(RP))
    our_ppl = _our_quantize_ppl(ref_env, **our_kw)
    tol = bound if kind == "abs" else bound * ref_ppl
    assert abs(our_ppl - ref_ppl) <= tol, (
        f"{name}: ref ppl {ref_ppl:.4f} vs ours {our_ppl:.4f} "
        f"(Δ={abs(our_ppl - ref_ppl):.4f} > {tol:.4f})")


def test_driver_rtn_fake_weights_bit_parity(ref_env):
    """For the deterministic algorithm, the whole pipeline is bit-identical:
    every per-layer fake weight the reference driver produces matches ours."""
    import torch
    from transformers import LlamaForCausalLM

    from mi_optimize.quantization.models import llama_sequential

    from mi_optimize_tpu.models.loader import load_llama_from_hf
    from mi_optimize_tpu.quant.api import quantize
    from mi_optimize_tpu.quant.config import QuantConfig

    RP = _rp()
    model = LlamaForCausalLM.from_pretrained(ref_env["ckpt"],
                                             attn_implementation="eager").eval()
    rm = llama_sequential(model, "rtn", [torch.tensor(b) for b in ref_env["calib"]],
                          device="cpu", offload="cpu", skip_layers=["lm_head"],
                          layer_sequential=True, wbit=RP.INT4, abit=RP.FP16,
                          w_qtype="per_group", w_groupsize=16)
    m = load_llama_from_hf(ref_env["ckpt"])
    qm = quantize(m, QuantConfig(algo="rtn", wbit="int4", abit="float16",
                                 w_qtype="per_group", w_groupsize=16, pack=False),
                  calib_data=ref_env["calib"])
    for i, blk in enumerate(rm.model.layers):
        mods = {"q_proj": blk.self_attn.q_proj, "k_proj": blk.self_attn.k_proj,
                "v_proj": blk.self_attn.v_proj, "o_proj": blk.self_attn.o_proj,
                "gate_proj": blk.mlp.gate_proj, "up_proj": blk.mlp.up_proj,
                "down_proj": blk.mlp.down_proj}
        for n, mod in mods.items():
            ref_w = mod.default_quantizer.fake_w.detach().float().numpy()
            our_w = np.asarray(qm.params["layers"][i][n].weight, dtype=np.float32)
            np.testing.assert_allclose(our_w, ref_w, rtol=1e-5, atol=1e-6,
                                       err_msg=f"layers.{i}.{n}")
