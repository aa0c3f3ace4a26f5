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


def test_chatglm_loader(tmp_path):
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from mi_optimize_tpu.models import llama

    hidden, heads, kv, hd, inter, vocab, layers = 32, 4, 2, 8, 48, 64, 2
    cfg = {
        "model_type": "chatglm", "padded_vocab_size": vocab, "hidden_size": hidden,
        "ffn_hidden_size": inter, "num_layers": layers, "num_attention_heads": heads,
        "multi_query_group_num": kv, "kv_channels": hd, "layernorm_epsilon": 1e-5,
        "seq_length": 128, "add_qkv_bias": True,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)
    qkv_dim = heads * hd + 2 * kv * hd
    t = {
        "transformer.embedding.word_embeddings.weight": rng.normal(size=(vocab, hidden)).astype(np.float32),
        "transformer.encoder.final_layernorm.weight": np.ones(hidden, np.float32),
        "transformer.output_layer.weight": rng.normal(size=(vocab, hidden)).astype(np.float32),
    }
    for i in range(layers):
        p = f"transformer.encoder.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(hidden, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
        t[f"{p}.self_attention.query_key_value.weight"] = rng.normal(size=(qkv_dim, hidden)).astype(np.float32)
        t[f"{p}.self_attention.query_key_value.bias"] = np.zeros(qkv_dim, np.float32)
        t[f"{p}.self_attention.dense.weight"] = rng.normal(size=(hidden, heads * hd)).astype(np.float32)
        t[f"{p}.mlp.dense_h_to_4h.weight"] = rng.normal(size=(2 * inter, hidden)).astype(np.float32)
        t[f"{p}.mlp.dense_4h_to_h.weight"] = rng.normal(size=(hidden, inter)).astype(np.float32)
    save_file(t, str(tmp_path / "model.safetensors"))

    m = load_llama_from_hf(str(tmp_path))
    assert m.family == "chatglm"
    assert m.config.rope_interleaved and m.config.rotary_dim == hd // 2
    ids = np.random.default_rng(1).integers(0, vocab, (1, 10))
    logits = llama.forward(m.params, m.config, jnp.asarray(ids), fused=False)
    assert np.isfinite(np.asarray(logits)).all()

    # quantization runs end-to-end on the chatglm family
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.quant.config import QuantConfig

    qm = mt.quantize(m, QuantConfig(algo="rtn", wbit="int4", w_qtype="per_group",
                                    w_groupsize=8), calib_data=[ids])
    assert qm.params["layers"][0]["q_proj"].packed is not None


def test_baichuan_wpack_loader(tmp_path):
    """W_pack checkpoints split into q/k/v and quantize end-to-end."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from mi_optimize_tpu.models import llama

    hidden, heads, vocab, layers, inter = 32, 4, 64, 2, 48
    cfg = {
        "model_type": "baichuan", "vocab_size": vocab, "hidden_size": hidden,
        "intermediate_size": inter, "num_hidden_layers": layers,
        "num_attention_heads": heads, "max_position_embeddings": 128,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)
    t = {
        "model.embed_tokens.weight": rng.normal(size=(vocab, hidden)).astype(np.float32),
        "model.norm.weight": np.ones(hidden, np.float32),
        "lm_head.weight": rng.normal(size=(vocab, hidden)).astype(np.float32),
    }
    for i in range(layers):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(hidden, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
        t[f"{p}.self_attn.W_pack.weight"] = rng.normal(size=(3 * hidden, hidden)).astype(np.float32)
        t[f"{p}.self_attn.o_proj.weight"] = rng.normal(size=(hidden, hidden)).astype(np.float32)
        t[f"{p}.mlp.gate_proj.weight"] = rng.normal(size=(inter, hidden)).astype(np.float32)
        t[f"{p}.mlp.up_proj.weight"] = rng.normal(size=(inter, hidden)).astype(np.float32)
        t[f"{p}.mlp.down_proj.weight"] = rng.normal(size=(hidden, inter)).astype(np.float32)
    save_file(t, str(tmp_path / "model.safetensors"))

    m = load_llama_from_hf(str(tmp_path))
    assert m.family == "baichuan"
    wp = t["model.layers.0.self_attn.W_pack.weight"]
    np.testing.assert_array_equal(np.asarray(m.params["layers"][0]["k_proj"].weight),
                                  wp[hidden:2 * hidden])
    ids = np.random.default_rng(1).integers(0, vocab, (1, 10))
    import mi_optimize_tpu as mt
    from mi_optimize_tpu.quant.config import QuantConfig

    qm = mt.quantize(m, QuantConfig(algo="rtn", wbit="int4", w_qtype="per_group",
                                    w_groupsize=8), calib_data=[ids])
    logits = llama.forward(qm.params, qm.config, jnp.asarray(ids), fused=False)
    assert np.isfinite(np.asarray(logits)).all()
