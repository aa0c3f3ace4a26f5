"""HF safetensors loader round-trip on a synthetic checkpoint."""
import json

import numpy as np
import pytest

from mi_optimize_tpu.models.loader import load_llama_from_hf


def make_fake_hf_ckpt(path, vocab=64, hidden=32, inter=48, layers=2, heads=4, kv=2):
    from safetensors.numpy import save_file

    cfg = {
        "model_type": "llama", "vocab_size": vocab, "hidden_size": hidden,
        "intermediate_size": inter, "num_hidden_layers": layers,
        "num_attention_heads": heads, "num_key_value_heads": kv,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 128,
    }
    (path / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)
    hd = hidden // heads
    t = {}
    t["model.embed_tokens.weight"] = rng.normal(size=(vocab, hidden)).astype(np.float32)
    t["model.norm.weight"] = np.ones(hidden, np.float32)
    t["lm_head.weight"] = rng.normal(size=(vocab, hidden)).astype(np.float32)
    for i in range(layers):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(hidden, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = rng.normal(size=(heads * hd, hidden)).astype(np.float32)
        t[f"{p}.self_attn.k_proj.weight"] = rng.normal(size=(kv * hd, hidden)).astype(np.float32)
        t[f"{p}.self_attn.v_proj.weight"] = rng.normal(size=(kv * hd, hidden)).astype(np.float32)
        t[f"{p}.self_attn.o_proj.weight"] = rng.normal(size=(hidden, heads * hd)).astype(np.float32)
        t[f"{p}.mlp.gate_proj.weight"] = rng.normal(size=(inter, hidden)).astype(np.float32)
        t[f"{p}.mlp.up_proj.weight"] = rng.normal(size=(inter, hidden)).astype(np.float32)
        t[f"{p}.mlp.down_proj.weight"] = rng.normal(size=(hidden, inter)).astype(np.float32)
    save_file(t, str(path / "model.safetensors"))
    return t


def test_hf_loader(tmp_path):
    import jax.numpy as jnp

    from mi_optimize_tpu.models import llama

    tensors = make_fake_hf_ckpt(tmp_path)
    m = load_llama_from_hf(str(tmp_path))
    assert m.config.num_layers == 2 and m.config.num_kv_heads == 2
    np.testing.assert_array_equal(
        np.asarray(m.params["layers"][0]["q_proj"].weight),
        tensors["model.layers.0.self_attn.q_proj.weight"],
    )
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (1, 12)))
    logits = llama.forward(m.params, m.config, ids, fused=False)
    assert logits.shape == (1, 12, 64)
    assert np.isfinite(np.asarray(logits)).all()
