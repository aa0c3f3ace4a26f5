"""Bit-packing of integer weight grids into 32-bit lanes.

Fills the role of the reference's QLinear pack/unpack
(/root/reference/mi_optimize/export/qnn.py:82-121,191-209) but with a layout
designed *for* the TPU kernel instead of the reference's transposed big-endian
numpy loop:

  * values are packed along the **in-features (last) axis**, little-endian
    within each 32-bit word: value k of a word occupies bits [k*b, (k+1)*b).
  * packed shape is [..., in_features * bits / 32] — for int4 that is
    [out, in/8] uint32, so a group of 128 in-features spans exactly 16 words
    and per-group scales stay word-aligned (tensor-parallel shards can cut on
    word and group boundaries simultaneously).
  * signed grids are biased by -qmin before packing so storage is unsigned.

Packing is an offline export step; unpacking is the hot path and is jittable
(pure gather/shift/mask, fuses into the surrounding dequant-matmul under XLA;
the Pallas kernels re-implement the same layout in-kernel).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .qparams import QRange


def packed_width(in_features: int, bits: int) -> int:
    total = in_features * bits
    if total % 32 != 0:
        raise ValueError(f"in_features*bits ({in_features}*{bits}) must be a multiple of 32")
    return total // 32


def pack(values: np.ndarray, bits: int, rng: QRange) -> np.ndarray:
    """Pack an int grid [..., in] (values in [qmin,qmax]) into uint32 [..., in*b/32].

    Host-side (numpy): runs once at export time.
    """
    values = np.asarray(values)
    in_features = values.shape[-1]
    nwords = packed_width(in_features, bits)
    u = (values.astype(np.int64) - rng.qmin).astype(np.uint64)
    if np.any(u >> bits):
        raise ValueError("values out of range for bit-width")
    flat = u.reshape(-1, in_features)
    if 32 % bits == 0:
        # vectorized fast path: vpw values per word, no straddling
        vpw = 32 // bits
        v = flat.reshape(flat.shape[0], nwords, vpw).astype(np.uint32)
        shifts = (np.arange(vpw, dtype=np.uint32) * np.uint32(bits))
        out32 = np.bitwise_or.reduce(v << shifts, axis=-1)
        return out32.astype(np.uint32).reshape(*values.shape[:-1], nwords)
    out = np.zeros((flat.shape[0], nwords), dtype=np.uint64)
    idx = (np.arange(in_features) * bits) // 32
    off = ((np.arange(in_features) * bits) % 32).astype(np.uint64)
    for w in range(nwords):
        sel = idx == w
        if sel.any():
            out[:, w] |= np.bitwise_or.reduce(flat[:, sel] << off[sel], axis=1)
        # straddling values whose high bits spill into word w
        spill = (idx == w - 1) & (off + bits > 32)
        if spill.any():
            out[:, w] |= np.bitwise_or.reduce(flat[:, spill] >> (32 - off[spill]), axis=1)
    out &= np.uint64(0xFFFFFFFF)
    return out.astype(np.uint32).reshape(*values.shape[:-1], nwords)


def unpack(packed: jnp.ndarray, bits: int, rng: QRange, in_features: int) -> jnp.ndarray:
    """Unpack uint32 [..., nwords] -> int32 [..., in_features] (jittable)."""
    nwords = packed.shape[-1]
    assert nwords == packed_width(in_features, bits)
    p = packed.astype(jnp.uint32)
    mask = jnp.uint32((1 << bits) - 1)
    pos = np.arange(in_features)
    idx = (pos * bits) // 32
    off = ((pos * bits) % 32).astype(np.uint32)
    # jnp shifts on unsigned dtypes are logical and broadcast over leading axes
    words = p[..., idx]
    low = words >> jnp.asarray(off.astype(np.uint32))
    if 32 % bits == 0:
        # fast path: no value straddles a word boundary
        vals = low & mask
    else:
        straddle = off + bits > 32
        idx_hi = np.minimum(idx + 1, nwords - 1)
        hi_words = p[..., idx_hi]
        hi_shift = jnp.asarray(((32 - off) % 32).astype(np.uint32))
        hi = jnp.where(jnp.asarray(straddle), hi_words << hi_shift,
                       jnp.zeros_like(hi_words))
        vals = (low | hi) & mask
    return vals.astype(jnp.int32) + jnp.int32(rng.qmin)


# ---------------------------------------------------------------------------
# weight layout: words-major ("transposed") storage for the TPU kernel
# ---------------------------------------------------------------------------

def pack_weight(values: np.ndarray, bits: int, rng: QRange) -> np.ndarray:
    """Pack an int weight grid [out, in] into uint32 [in*bits/32, out].

    Words-major layout: row w holds word w of every output channel. Mosaic
    block shapes need the trailing dim divisible by 128 — out_features is,
    while in*bits/32 generally is not (e.g. llama's 11008·4/32 = 1376), so the
    kernel streams (word-rows, channel-cols) tiles with fully aligned blocks.
    """
    packed = pack(values, bits, rng)  # [out, nwords]
    return np.ascontiguousarray(packed.T)


def unpack_weight(packed_t: jnp.ndarray, bits: int, rng: QRange, in_features: int) -> jnp.ndarray:
    """Inverse of pack_weight: uint32 [nwords, out] -> int32 [out, in]."""
    return unpack(packed_t.T, bits, rng, in_features)


def pack_weight_device(values: "jnp.ndarray", bits: int, rng: QRange) -> "jnp.ndarray":
    """Device-side (jittable) pack_weight for 32%bits==0 widths.

    Host↔device transfers can dominate export time (a 7B layer is ~64MB of
    int32 grid values), so when the grid already lives on-device we pack there
    and never round-trip. Produces the same words-major uint32 [in·b/32, out]
    layout as pack_weight.
    """
    if 32 % bits != 0:
        raise ValueError("device packing supports bit-widths dividing 32 only")
    vpw = 32 // bits
    out_f, in_f = values.shape
    nwords = packed_width(in_f, bits)
    u = (values.astype(jnp.int32) - rng.qmin).astype(jnp.uint32)
    v = u.reshape(out_f, nwords, vpw)
    shifts = jnp.asarray(np.arange(vpw, dtype=np.uint32) * np.uint32(bits))
    words = v[..., 0]
    for i in range(1, vpw):
        words = words | (v[..., i] << shifts[i])
    return words.T
