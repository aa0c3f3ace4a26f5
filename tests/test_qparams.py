"""Unit tests for core quantization numerics vs independent golden formulas."""
import numpy as np
import jax.numpy as jnp
import pytest

from mi_optimize_tpu.core import qparams as qp


def golden_fakequant_per_tensor(x, bits, symmetric, unsigned):
    qmin, qmax = (0, 2**bits - 1) if unsigned else (-(2 ** (bits - 1)), 2 ** (bits - 1) - 1)
    mn, mx = x.min(), x.max()
    if symmetric:
        scale = max(abs(mn), abs(mx)) / ((qmax - qmin) // 2)
        zero = 0 if qmin < 0 else 2 ** (bits - 1)
    else:
        scale = (mx - mn) / (qmax - qmin)
        zero = qmin - np.round(mn / scale)
    q = np.clip(np.round(x / scale) + zero, qmin, qmax)
    return scale * (q - zero)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
@pytest.mark.parametrize("symmetric", [True, False])
@pytest.mark.parametrize("unsigned", [True, False])
def test_per_tensor_matches_golden(rng, bits, symmetric, unsigned):
    x = rng.normal(size=(16, 32)).astype(np.float32)
    dq, scale, zero = qp.quantize_dequantize(
        jnp.asarray(x), bits, "per_tensor", symmetric=symmetric, unsigned=unsigned
    )
    ref = golden_fakequant_per_tensor(x, bits, symmetric, unsigned)
    np.testing.assert_allclose(np.asarray(dq), ref, rtol=1e-5, atol=1e-6)


def test_per_channel_shapes_and_rows(rng):
    x = rng.normal(size=(8, 64)).astype(np.float32)
    dq, scale, zero = qp.quantize_dequantize(jnp.asarray(x), 4, "per_channel")
    assert scale.shape == (8, 1)
    # each row quantized independently == per-tensor on that row
    for i in range(8):
        row_ref = golden_fakequant_per_tensor(x[i], 4, True, True)
        np.testing.assert_allclose(np.asarray(dq)[i], row_ref, rtol=1e-5, atol=1e-6)


def test_per_group_scale_layout(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32)
    dq, scale, zero = qp.quantize_dequantize(jnp.asarray(x), 4, "per_group", groupsize=16)
    assert scale.shape == (4, 4)
    g0 = golden_fakequant_per_tensor(x[0, :16], 4, True, True)
    np.testing.assert_allclose(np.asarray(dq)[0, :16], g0, rtol=1e-5, atol=1e-6)


def test_per_token_reduces_over_features(rng):
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    dq, scale, zero = qp.quantize_dequantize(jnp.asarray(x), 8, "per_token")
    assert scale.shape == (10, 1)
    assert dq.shape == x.shape


def test_per_dimension_reduces_over_tokens(rng):
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    dq, scale, zero = qp.quantize_dequantize(jnp.asarray(x), 8, "per_dimension")
    assert scale.shape == (1, 32)
    assert dq.shape == x.shape


def test_quant_error_bounded(rng):
    x = rng.normal(size=(32, 128)).astype(np.float32)
    dq, scale, _ = qp.quantize_dequantize(jnp.asarray(x), 8, "per_channel")
    # max error <= scale/2 per row (round-to-nearest on an absmax grid)
    err = np.abs(np.asarray(dq) - x)
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()


def test_zero_input_no_nan():
    x = jnp.zeros((4, 16))
    dq, scale, zero = qp.quantize_dequantize(x, 4, "per_channel")
    assert np.isfinite(np.asarray(dq)).all()


def test_quantize_to_int_roundtrip(rng):
    x = rng.normal(size=(8, 64)).astype(np.float32)
    dq, scale, zero = qp.quantize_dequantize(jnp.asarray(x), 4, "per_group", groupsize=16)
    ints = qp.quantize_to_int(dq, scale, zero, 4, "per_group", groupsize=16)
    # dequantizing the ints reproduces the fake-quant weights exactly
    redq = np.asarray(scale)[..., None] * (
        np.asarray(ints).reshape(8, 4, 16) - np.asarray(zero)[..., None]
    )
    np.testing.assert_allclose(redq.reshape(8, 64), np.asarray(dq), rtol=1e-5, atol=1e-6)
