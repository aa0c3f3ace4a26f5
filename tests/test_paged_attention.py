"""Fused paged-attention kernel (ops/paged_attention.py) equivalence tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_optimize_tpu.ops.paged_attention import (
    paged_attention_supported,
    paged_flash_attention,
)


def _reference(q, pk, pv, table, positions, n_heads, n_kv_heads, head_dim,
               page_size):
    """Gather the logical view per slot, then masked softmax attention."""
    B, pps = table.shape
    T = pps * page_size
    reps = n_heads // n_kv_heads
    out = np.zeros((B, n_heads * head_dim), np.float32)
    for b in range(B):
        k_all = np.asarray(pk)[np.asarray(table)[b]].reshape(T, n_kv_heads, head_dim)
        v_all = np.asarray(pv)[np.asarray(table)[b]].reshape(T, n_kv_heads, head_dim)
        qb = np.asarray(q)[b].reshape(n_heads, head_dim)
        live = np.arange(T) <= int(positions[b])
        for h in range(n_heads):
            hk = h // reps
            s = (qb[h] @ k_all[:, hk].T) / np.sqrt(head_dim)
            s = np.where(live, s, -np.inf)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[b, h * head_dim:(h + 1) * head_dim] = p @ v_all[:, hk]
    return out


@pytest.mark.parametrize("page_size,pps", [(16, 4), (8, 3)])
def test_paged_flash_matches_reference(page_size, pps):
    n_heads, n_kv_heads, head_dim = 4, 2, 128
    B, n_pages = 3, 16
    assert paged_attention_supported(page_size, head_dim)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, n_heads * head_dim)).astype(np.float32))
    pk = jnp.asarray(rng.normal(size=(n_pages, page_size, n_kv_heads, head_dim))
                     .astype(np.float32))
    pv = jnp.asarray(rng.normal(size=(n_pages, page_size, n_kv_heads, head_dim))
                     .astype(np.float32))
    # non-trivial page tables (distinct pages per slot), varied positions
    table = jnp.asarray(rng.choice(n_pages, size=(B, pps), replace=False)
                        .astype(np.int32))
    positions = jnp.asarray([0, page_size * (pps - 1), page_size * pps - 1],
                            dtype=jnp.int32)[:B]

    got = paged_flash_attention(
        q, pk, pv, table, positions,
        n_heads=n_heads, n_kv_heads=n_kv_heads, head_dim=head_dim,
        page_size=page_size, interpret=jax.default_backend() != "tpu")
    want = _reference(q, pk, pv, table, positions, n_heads, n_kv_heads,
                      head_dim, page_size)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # r5 re-tier: fast representative = test_paged_mega.py::test_paged_step_matches_dense_batched
def test_paged_batcher_fused_kernel_matches_generate():
    """PagedBatcher with the fused kernel == per-request greedy generate."""
    from mi_optimize_tpu.models.model import Model
    from mi_optimize_tpu.serving import fuse_for_serving
    from mi_optimize_tpu.serving.engine import generate
    from mi_optimize_tpu.serving.paged import PagedBatcher
    from tests.test_block_fused import _mk_cfg, _mk_params

    cfg = _mk_cfg(num_layers=2, vocab_size=256)
    m = fuse_for_serving(Model(config=cfg, params=_mk_params(cfg), family="llama"))
    rng = np.random.default_rng(3)
    p1 = rng.integers(0, 256, (7,))
    ref1 = list(generate(m, p1[None, :], max_new_tokens=4, fused=True)[0, len(p1):])

    b = PagedBatcher(m, n_slots=2, page_size=16, n_pages=8, pages_per_slot=2,
                     fused=True)
    r = b.add_request(p1, max_new_tokens=4)
    assert r is not None
    toks = [b.slot_req[0].tokens[0]]
    while any(s is not None for s in b.slot_req):
        out = b.step()
        if r in out:
            toks.append(out[r])
    assert toks[:4] == ref1
