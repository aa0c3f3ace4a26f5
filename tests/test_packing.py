"""Pack/unpack round-trip tests across bit-widths (incl. word-straddling)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mi_optimize_tpu.core.packing import pack, unpack, packed_width
from mi_optimize_tpu.core.qparams import qrange


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 7, 8])
@pytest.mark.parametrize("unsigned", [True, False])
def test_roundtrip(rng, bits, unsigned):
    in_features = 96  # 96*b divisible by 32 for all b in 2..8
    r = qrange(bits, unsigned)
    vals = rng.integers(r.qmin, r.qmax + 1, size=(7, in_features)).astype(np.int32)
    packed = pack(vals, bits, r)
    assert packed.shape == (7, packed_width(in_features, bits))
    assert packed.dtype == np.uint32
    out = np.asarray(unpack(jnp.asarray(packed), bits, r, in_features))
    np.testing.assert_array_equal(out, vals)


def test_int4_layout_little_endian():
    r = qrange(4, True)
    vals = np.arange(8, dtype=np.int32).reshape(1, 8)
    packed = pack(vals, 4, r)
    expected = sum(v << (4 * k) for k, v in enumerate(range(8)))
    assert packed[0, 0] == expected


def test_group_alignment_int4():
    # a 128-wide group spans exactly 16 words — shard cuts stay aligned
    assert packed_width(128, 4) == 16


def test_out_of_range_rejected():
    r = qrange(4, True)
    with pytest.raises(ValueError):
        pack(np.array([[16] * 8], dtype=np.int32), 4, r)
