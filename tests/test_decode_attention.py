"""Fused decode-attention kernel ≡ the stock XLA path (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from mi_optimize_tpu.ops.decode_attention import fused_decode_attention


def stock_path(q, k, v, cos, sin, ck, cv, ks, vs, pos, Hq, Hkv, D):
    """Mirror of llama.block_apply's int8-cache decode attention."""
    from mi_optimize_tpu.models import llama

    cfg = llama.LlamaConfig.tiny(num_heads=Hq, num_kv_heads=Hkv, head_dim=D,
                                 hidden_size=Hq * D)
    qr = llama.apply_rope(q.reshape(1, 1, Hq, D), cos[None], sin[None], cfg)
    kr = llama.apply_rope(k.reshape(1, 1, Hkv, D), cos[None], sin[None], cfg)
    kq, ksn = llama.quantize_kv(kr)
    vq, vsn = llama.quantize_kv(v.reshape(1, 1, Hkv, D))
    ck = ck.at[pos].set(kq[0, 0])
    cv = cv.at[pos].set(vq[0, 0])
    ks = ks.at[pos].set(ksn[0, 0])
    vs = vs.at[pos].set(vsn[0, 0])
    k_all = (ck.astype(jnp.float32) * ks[..., None])[None]
    v_all = (cv.astype(jnp.float32) * vs[..., None])[None]
    T = ck.shape[0]
    mask = (jnp.arange(T)[None, :] <= pos)[None, :]
    out = llama.attention(qr, k_all, v_all, mask, cfg)
    return np.asarray(out).reshape(1, Hq * D), ck, cv


def test_fused_decode_attention_matches_stock(rng):
    Hq, Hkv, D, T = 8, 4, 128, 64
    pos = 13
    q = jnp.asarray(rng.normal(size=(1, Hq * D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, Hkv * D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, Hkv * D)).astype(np.float32))
    from mi_optimize_tpu.models import llama

    cfg = llama.LlamaConfig.tiny(num_heads=Hq, num_kv_heads=Hkv, head_dim=D,
                                 hidden_size=Hq * D)
    cos, sin = llama.rope_tables(cfg, jnp.asarray([pos]))

    # prepopulate history 0..pos-1 with quantized random rows
    hist = rng.normal(size=(pos, Hkv, D)).astype(np.float32)
    histq, hists = llama.quantize_kv(jnp.asarray(hist[None]))
    ck = jnp.zeros((T, Hkv, D), jnp.int8).at[:pos].set(histq[0])
    cv = jnp.zeros((T, Hkv, D), jnp.int8).at[:pos].set(histq[0])
    ks = jnp.zeros((T, Hkv), jnp.float32).at[:pos].set(hists[0])
    vs = jnp.zeros((T, Hkv), jnp.float32).at[:pos].set(hists[0])

    ref_out, ref_ck, ref_cv = stock_path(q, k, v, cos, sin, ck, cv, ks, vs,
                                         pos, Hq, Hkv, D)
    out, nck, ncv, nks, nvs = fused_decode_attention(
        q, k, v, cos, sin, ck, cv, ks, vs, jnp.asarray(pos),
        n_heads=Hq, n_kv_heads=Hkv, head_dim=D, max_len=T, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(nck[pos]), np.asarray(ref_ck[pos]))
    np.testing.assert_array_equal(np.asarray(nck[:pos]), np.asarray(ck[:pos]))

