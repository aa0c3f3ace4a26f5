"""Bit-parity tests: our algorithms vs the ACTUAL reference implementation.

Runs the reference's torch quantizers (read-only mount, CPU) on tiny random
matrices and asserts our JAX implementations reproduce the same fake-quant
weights / qparams. This is the strongest evidence for the north-star
"PPL within Δ≤0.1" requirement (BASELINE.md): if every layer transform is
(near-)bit-identical, the end-to-end perplexity must match.

Skipped automatically when torch or the reference mount is unavailable.
"""
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


def _ref_available():
    import os

    if not os.path.isdir(REF):
        return False
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(not _ref_available(), reason="reference/torch unavailable")


@pytest.fixture(scope="module")
def ref():
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

    for mod in ["pynvml", "primefac", "gradio"]:
        sys.modules.setdefault(mod, _Stub(mod))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    torch.cuda.synchronize = lambda *a, **k: None  # reference calls it blindly
    import mi_optimize.quantization.quantizer as q

    return q


class FakeHub:
    """Minimal stand-in for LinearQuantHub (core linear + hook storage)."""

    def __init__(self, torch, out_f, in_f, seed=0):
        import torch.nn as nn

        g = torch.Generator().manual_seed(seed)
        self.core = nn.Linear(in_f, out_f, bias=False)
        with torch.no_grad():
            self.core.weight.copy_(torch.randn(out_f, in_f, generator=g))
        self.hook_func = []


# ---------------------------------------------------------------------------

@pytest.mark.parametrize("qtype,groupsize", [("per_tensor", -1), ("per_channel", -1),
                                             ("per_group", 8), ("per_token", -1)])
@pytest.mark.parametrize("has_zero", [False, True])
@pytest.mark.parametrize("unsign", [True, False])
def test_quantizer_engine_parity(ref, qtype, groupsize, has_zero, unsign):
    import torch

    import jax.numpy as jnp

    from mi_optimize_tpu.core import qparams

    x = np.random.default_rng(1).normal(size=(8, 32)).astype(np.float32)
    rq = ref.Quantizer(bits=4, has_zero=has_zero, qtype=qtype, groupsize=groupsize,
                       unsign=unsign)
    dq_ref, s_ref, z_ref = rq.quantize_dequantize(torch.tensor(x))
    dq, s, z = qparams.quantize_dequantize(
        jnp.asarray(x), 4, qtype, groupsize, symmetric=not has_zero, unsigned=unsign
    )
    np.testing.assert_allclose(np.asarray(dq), dq_ref.numpy(), rtol=1e-5, atol=1e-5)


def test_rtn_weight_parity(ref):
    import torch

    import jax.numpy as jnp

    from mi_optimize_tpu.core import qparams

    hub = FakeHub(torch, 16, 32)
    rtn = ref.LinearRTNQuantizer(hub, wbit=ref.Precision.INT4 if hasattr(ref, "Precision")
                                 else 4, device="cpu", offload="cpu",
                                 w_qtype="per_group", w_groupsize=8)
    # reference Precision import
    from mi_optimize.quantization import Precision

    rtn.wbit = Precision.INT4
    rtn.w_quantizer = ref.Quantizer(bits=4, has_zero=False, qtype="per_group",
                                    groupsize=8, unsign=True)
    rtn.quantize()
    w = hub.core.weight.detach().numpy()
    dq, s, z = qparams.quantize_dequantize(jnp.asarray(w), 4, "per_group", 8)
    np.testing.assert_allclose(np.asarray(dq), rtn.fake_w.numpy(), rtol=1e-5, atol=1e-5)


def _hessian(torch, in_f, tokens=64, seed=3):
    g = torch.Generator().manual_seed(seed)
    X = torch.randn(tokens, in_f, generator=g)
    return X, (2.0 / 1) * (X.T @ X)  # one batch: H = 2 * X^T X


def test_gptq_parity(ref):
    import torch

    import jax.numpy as jnp

    from mi_optimize.quantization import Precision

    from mi_optimize_tpu.quant.gptq import gptq_quantize_matrix

    out_f, in_f = 16, 32
    hub = FakeHub(torch, out_f, in_f)
    X, H = _hessian(torch, in_f)
    hub.core.H = H.clone()
    W = hub.core.weight.detach().clone().numpy()  # reference mutates core.weight

    gptq = ref.LinearGPTQQuantizer(hub, wbit=Precision.INT4, device="cpu", offload="cpu",
                                   blocksize=16, w_groupsize=-1, actorder=True)
    gptq.quantize()
    ref_fake = gptq.fake_w.numpy()
    Q, scales, zeros, _perm = gptq_quantize_matrix(
        jnp.asarray(W), jnp.asarray(H.numpy()),
        bits=4, blocksize=16, groupsize=-1, actorder=True,
        symmetric=False, percdamp=0.01,
    )
    Q = np.asarray(Q)
    # numerics: cholesky chains differ at 1e-6 level -> a tiny fraction of grid
    # points may round differently; require near-exact agreement
    mismatch = np.mean(~np.isclose(Q, ref_fake, rtol=1e-4, atol=1e-4))
    assert mismatch < 0.02, f"{mismatch:.3%} of weights differ"
    np.testing.assert_allclose(Q, ref_fake, atol=np.abs(ref_fake).max() * 0.3)


def test_gptq_grouped_parity(ref):
    import torch

    import jax.numpy as jnp

    from mi_optimize.quantization import Precision

    from mi_optimize_tpu.quant.gptq import gptq_quantize_matrix

    out_f, in_f = 16, 32
    hub = FakeHub(torch, out_f, in_f, seed=5)
    X, H = _hessian(torch, in_f, seed=6)
    hub.core.H = H.clone()
    W = hub.core.weight.detach().clone().numpy()  # reference mutates core.weight
    gptq = ref.LinearGPTQQuantizer(hub, wbit=Precision.INT4, device="cpu", offload="cpu",
                                   blocksize=16, w_groupsize=16, actorder=False)
    gptq.quantize()
    Q, scales, zeros, _perm = gptq_quantize_matrix(
        jnp.asarray(W), jnp.asarray(H.numpy()),
        bits=4, blocksize=16, groupsize=16, actorder=False,
        symmetric=False, percdamp=0.01,
    )
    mismatch = np.mean(~np.isclose(np.asarray(Q), gptq.fake_w.numpy(), rtol=1e-4, atol=1e-4))
    assert mismatch < 0.02


def test_smoothquant_parity(ref):
    import torch

    import jax.numpy as jnp

    from mi_optimize.quantization import Precision

    from mi_optimize_tpu.quant.smoothquant import absmax_fake_quant_weight, smooth_scales

    hub = FakeHub(torch, 16, 32, seed=7)
    g = torch.Generator().manual_seed(8)
    xs = [torch.randn(1, 6, 32, generator=g) for _ in range(3)]
    hub.core.input_tracks = [[x] for x in xs]

    sq = ref.LinearSmoothQuantizer(hub, wbit=Precision.INT8, abit=Precision.INT8,
                                   device="cpu", offload="cpu", w_qtype="per_channel",
                                   a_qtype="per_tensor", alpha=0.5)
    sq.quantize()

    W = hub.core.weight.detach().numpy()
    absmax = np.max(np.abs(np.concatenate([x.reshape(-1, 32).numpy() for x in xs], 0)), 0)
    ours_smooth = np.asarray(smooth_scales(jnp.asarray(W), jnp.asarray(absmax), 0.5))
    np.testing.assert_allclose(ours_smooth, sq.smooth_factor.numpy().reshape(-1), rtol=1e-4, atol=1e-6)

    fake, s, z = absmax_fake_quant_weight(jnp.asarray(W * ours_smooth[None, :]), 8,
                                          "per_channel", -1)
    np.testing.assert_allclose(np.asarray(fake), sq.fake_w.numpy(), rtol=1e-4, atol=1e-5)


def test_fp8_value_grid_parity(ref):
    import torch

    import jax.numpy as jnp

    from mi_optimize_tpu.quant.fp8 import E4M3_BOUND, fp8_quantize_value

    hub = FakeHub(torch, 4, 8)
    q = ref.LinearFP8Quantizer(hub, device="cpu", offload="cpu")
    x = np.random.default_rng(9).normal(size=(16, 16)).astype(np.float32) * 10
    S = E4M3_BOUND / np.abs(x).max()
    ref_out = q.quanz_fix_E4M3(torch.tensor(x), S=torch.tensor(S), is_scale=True).numpy()
    ours = np.asarray(fp8_quantize_value(jnp.asarray(x), jnp.float32(S), "e4m3"))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-6)


def test_awq_pseudo_quant_parity(ref):
    import torch

    import jax.numpy as jnp

    from mi_optimize_tpu.quant.awq_impl import pseudo_quantize

    hub = FakeHub(torch, 8, 32)
    awq = ref.LinearAwqQuantizer(hub, device="cpu", offload="cpu", w_groupsize=8)
    w = np.random.default_rng(10).normal(size=(8, 32)).astype(np.float32)
    ref_dq = awq.pseudo_quantize_tensor(torch.tensor(w), n_bit=4, zero_point=True,
                                        q_groupsize=8).numpy()
    ours = np.asarray(pseudo_quantize(jnp.asarray(w), 4, True, 8))
    np.testing.assert_allclose(ours, ref_dq, rtol=1e-5, atol=1e-6)


def test_zeroquant_weight_parity(ref):
    import torch

    import jax.numpy as jnp

    from mi_optimize.quantization import Precision

    from mi_optimize_tpu.core import qparams

    hub = FakeHub(torch, 8, 32, seed=11)
    zq = ref.LinearZeroquantQuantizer(hub, wbit=Precision.INT8, device="cpu",
                                      offload="cpu", w_groupsize=8)
    W = hub.core.weight.detach().clone()
    zq.quantize()
    dq, s, z = qparams.quantize_dequantize(
        jnp.asarray(W.numpy()), 8, "per_group", 8, symmetric=True, unsigned=False
    )
    np.testing.assert_allclose(np.asarray(dq), zq.fake_w.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_spqr_find_params_parity(ref):
    import torch

    from mi_optimize_tpu.quant.spqr_impl import _find_params_rows, _quant

    # NOTE: the reference's LinearSpqrQuantizer cannot even be constructed —
    # its super().__init__(..., wbit=...) mismatches BaseQuantizer(w_bits=...)
    # (SpqrQuantizer.py:15 vs base.py:2), a latent reference bug. Its numeric
    # methods never touch self, so we exercise them unbound.
    SQ = ref.LinearSpqrQuantizer
    w = np.random.default_rng(12).normal(size=(16, 8)).astype(np.float32)
    w[3] = 0.5  # degenerate row (min==max) -> reference maps to [-1, 1]
    s_ref, z_ref = SQ.find_params(None, torch.tensor(w), bits=4, perchannel=True,
                                  sym=False, weight=True)
    import jax.numpy as jnp

    s_ours, z_ours = _find_params_rows(jnp.asarray(w), 4, sym=False)
    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy().reshape(-1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(z_ours), z_ref.numpy().reshape(-1),
                               rtol=1e-5, atol=1e-5)
    # quant grid agreement
    q_ref = SQ.quant_tensor(None, torch.tensor(w), s_ref, z_ref, bits=4).numpy()
    q_ours = np.asarray(_quant(jnp.asarray(w), np.asarray(s_ours)[:, None],
                               np.asarray(z_ours)[:, None], 4))
    np.testing.assert_allclose(q_ours, q_ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# full-pipeline algorithm parity (VERDICT r1 item 7): AWQ search, SpQR loop,
# QuIP pipeline — the ACTUAL reference implementations on identical inputs
# ---------------------------------------------------------------------------

@pytest.mark.slow  # exhaustive 20x20 grid+clip search vs torch (~32s)
def test_awq_full_search_parity(ref):
    """Reference LinearAwqQuantizer.quantize() — 20-pt ratio grid + per-group
    clip search + final asym per-group pack (AWQQuantizer.py:85-230) — vs our
    auto_scale_search/auto_clip_search/pseudo_quantize chain on the SAME
    tracked inputs. out_features=256 because the reference's auto_clip asserts
    out % 256 == 0 (:160)."""
    import torch

    import jax.numpy as jnp

    from mi_optimize.quantization import Precision

    from mi_optimize_tpu.quant.awq_impl import (auto_clip_search,
                                                auto_scale_search,
                                                pseudo_quantize)

    hub = FakeHub(torch, 256, 32, seed=20)
    g = torch.Generator().manual_seed(21)
    xs = [torch.randn(1, 8, 32, generator=g) for _ in range(3)]
    hub.core.input_tracks = [[x] for x in xs]
    awq = ref.LinearAwqQuantizer(hub, wbit=Precision.INT4, device="cpu",
                                 offload="cpu", w_groupsize=16)
    # quantize() mutates core.weight via the apply_scale detach-alias
    W = hub.core.weight.detach().clone().numpy()
    awq.quantize()
    ref_fake = awq.fake_w.detach().numpy()
    ref_smooth = awq.smooth_factor.detach().numpy().reshape(-1)

    x = np.concatenate([t.reshape(-1, 32).numpy() for t in xs], 0)
    x_mean_abs = np.abs(x).mean(0)
    smooth = auto_scale_search(jnp.asarray(W), jnp.asarray(x), jnp.asarray(x_mean_abs),
                               n_bit=4, groupsize=16, zero_point=True, n_grid=20)
    np.testing.assert_allclose(np.asarray(smooth), ref_smooth, rtol=1e-4, atol=1e-6)
    Q = jnp.asarray(W) * smooth[None, :]
    clip = auto_clip_search(Q, (jnp.asarray(x) / smooth[None, :])[:1],
                            n_bit=4, groupsize=16, zero_point=True)
    oc, ci = Q.shape
    ng = ci // 16
    Qc = jnp.clip(Q.reshape(oc, ng, 16), -clip[:, :, None], clip[:, :, None]).reshape(oc, ci)
    fake = pseudo_quantize(Qc, 4, True, 16)
    # the smoothed weight W·s differs between frameworks at the ulp level
    # (torch vs XLA pow/sqrt in the scale chain); quantization discontinuities
    # turn a 1-ulp input change into a different (equally valid) clip choice
    # for a few [oc, group] cells — tolerate <2% of elements
    mism = np.mean(~np.isclose(np.asarray(fake), ref_fake, rtol=1e-4, atol=1e-5))
    assert mism < 0.02, f"{mism:.3%} of AWQ fake weights differ"


def test_spqr_full_loop_parity(ref):
    """Reference LinearSpqrQuantizer.quantize() — GPTQ-style loop + LOO outlier
    detection + double quantization (SpqrQuantizer.py:169-330) — vs our
    spqr_quantize_matrix with identical W and H.

    The reference ctor cannot run as written: super().__init__(..., wbit=...)
    mismatches BaseQuantizer(w_bits=...) (SpqrQuantizer.py:15 vs base.py:2),
    a latent reference bug — so the kwarg is shimmed to let the REAL ctor body
    (and the real quantize loop) execute."""
    import torch

    import jax.numpy as jnp

    import mi_optimize.quantization.quantizer.base as RB
    from mi_optimize.quantization import Precision

    from mi_optimize_tpu.quant.spqr_impl import spqr_quantize_matrix

    orig_init = RB.BaseQuantizer.__init__

    def shim(self, qhl, *a, **kw):
        if "wbit" in kw:
            kw["w_bits"] = kw.pop("wbit")
        if "abit" in kw:
            kw["a_bits"] = kw.pop("abit")
        orig_init(self, qhl, *a, **kw)

    RB.BaseQuantizer.__init__ = shim
    try:
        hub = FakeHub(torch, 16, 32, seed=22)
        X, H = _hessian(torch, 32, seed=23)
        hub.core.H = H.clone()
        W = hub.core.weight.detach().clone().numpy()
        sq = ref.LinearSpqrQuantizer(hub, w_groupsize=16, wbit=Precision.INT4,
                                     device="cpu", offload="cpu")
        sq.quantize()
        ref_Q = sq.Q.detach().float().numpy()
        ref_outliers = 0.0
    finally:
        RB.BaseQuantizer.__init__ = orig_init

    Q, scales, zeros, n_out = spqr_quantize_matrix(
        jnp.asarray(W), jnp.asarray(H.numpy()),
        bits=4, blocksize=32, groupsize=16, qq_bits=3, qq_groupsize=16,
        sym=False, percdamp=0.01, rel_threshold=0.2)
    mismatch = np.mean(~np.isclose(np.asarray(Q), ref_Q, rtol=1e-4, atol=1e-4))
    assert mismatch < 0.02, f"{mismatch:.3%} of SpQR weights differ"


def test_quip_pipeline_parity(ref):
    """Reference QuIPQuantizer.quantize() — incoherence preproc (rescale +
    orthogonal butterfly projection), qfn='b' grid, round_ldl_gptqequiv,
    postproc inverse (QuIPQuantizer.py:91-410) — vs our quip_quantize_matrix.
    Both sides are fed the SAME orthogonal U/V (the only random step); the
    stubbed primefac module is swapped for a real prime factorization so the
    reference butterfly code runs genuinely."""
    import types as _types

    import torch

    import jax.numpy as jnp

    # `import a.b.QuIPQuantizer as RQ` would bind the CLASS (the package's
    # `from .QuIPQuantizer import *` shadows the submodule) — use sys.modules
    import mi_optimize.quantization.quantizer  # noqa: F401
    RQ = sys.modules["mi_optimize.quantization.quantizer.QuIPQuantizer"]
    from mi_optimize.quantization import Precision

    from mi_optimize_tpu.quant.quip_impl import (quip_quantize_matrix,
                                                 rand_ortho_butterfly)

    real_pf = _types.ModuleType("primefac")

    def _pf(n):
        d = 2
        while d * d <= n:
            while n % d == 0:
                yield d
                n //= d
            d += 1
        if n > 1:
            yield n

    real_pf.primefac = _pf
    old_pf = RQ.primefac
    RQ.primefac = real_pf
    try:
        m_, n_ = 16, 32
        hub = FakeHub(torch, m_, n_, seed=24)
        g = torch.Generator().manual_seed(25)
        X = torch.randn(64, n_, generator=g)
        Hsum = (X.T @ X).to(torch.float64)  # QuIP hook: H = ΣXᵀX fp64 (utils.py:74-102)
        hub.core.H = Hsum.clone()
        hub.core.nsamples = 1
        W = hub.core.weight.detach().clone().numpy()
        q = ref.QuIPQuantizer(hub, wbit=Precision.INT4, device="cpu", offload="cpu")
        rng = np.random.default_rng(42)
        U = rand_ortho_butterfly(rng, m_)
        V = rand_ortho_butterfly(rng, n_)
        q.rand_ortho_butterfly = lambda n: torch.tensor(U if n == m_ else V)
        q.quantize()
        ref_Q = q.Q.value.detach().float().numpy()
    finally:
        RQ.primefac = old_pf

    ours = quip_quantize_matrix(
        jnp.asarray(W), jnp.asarray(Hsum.numpy().astype(np.float32)),
        bits=4, qfn="b", percdamp=0.01, incoh=True, U=U, V=V)
    mismatch = np.mean(~np.isclose(np.asarray(ours), ref_Q, rtol=1e-3, atol=1e-4))
    assert mismatch < 0.02, f"{mismatch:.3%} of QuIP weights differ"
    np.testing.assert_allclose(np.asarray(ours), ref_Q,
                               atol=np.abs(ref_Q).max() * 0.35)
