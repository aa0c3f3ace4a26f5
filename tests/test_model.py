"""Tiny-model forward / loss sanity tests (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from mi_optimize_tpu.models import llama
from mi_optimize_tpu.models.model import Model


def test_forward_shapes():
    m = Model.tiny_llama()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
    logits = llama.forward(m.params, m.config, ids, fused=False)
    assert logits.shape == (2, 16, m.config.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_causal_masking():
    """Changing a future token must not change past logits."""
    m = Model.tiny_llama()
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, (1, 12))
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 7) % 256
    l1 = llama.forward(m.params, m.config, jnp.asarray(ids), fused=False)
    l2 = llama.forward(m.params, m.config, jnp.asarray(ids2), fused=False)
    np.testing.assert_allclose(np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]), atol=1e-5)


def test_loss_and_ppl():
    from mi_optimize_tpu.eval.ppl import compute_ppl

    m = Model.tiny_llama()
    rng = np.random.default_rng(2)
    batches = [rng.integers(0, 256, (1, 32)) for _ in range(2)]
    ppl = compute_ppl(m, batches, fused=False)
    # random model ≈ uniform over 256 vocab
    assert 100 < ppl < 600


def test_block_capture_names():
    m = Model.tiny_llama()
    cfg = m.config
    x = jnp.zeros((1, 8, cfg.hidden_size))
    cos, sin = llama.rope_tables(cfg, jnp.arange(8))
    mask = llama.causal_mask(8)
    _, _, caps = llama.block_apply(m.params["layers"][0], x, cos, sin, mask, cfg, capture=True, fused=False)
    assert set(caps) == set(llama.ALL_LINEARS)


def test_qwen2_style_attention_bias():
    """attn_bias config (Qwen2) produces biased qkv and quantizes cleanly."""
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.quant.config import QuantConfig

    cfg = llama.LlamaConfig.tiny(attn_bias=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    assert params["layers"][0]["q_proj"].bias is not None
    m = Model(config=cfg, params=params, family="qwen2")
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, (1, 12)))
    logits = llama.forward(m.params, m.config, ids, fused=False)
    assert np.isfinite(np.asarray(logits)).all()
    qm = mt.quantize(m, QuantConfig(algo="rtn", wbit="int4", w_qtype="per_group",
                                    w_groupsize=16), calib_data=[np.asarray(ids)])
    lin = qm.params["layers"][0]["q_proj"]
    assert lin.packed is not None and lin.bias is not None
    logits2 = llama.forward(qm.params, qm.config, ids, fused=False)
    assert np.isfinite(np.asarray(logits2)).all()
