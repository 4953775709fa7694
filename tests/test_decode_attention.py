"""Int8 prompt-KV decode attention (ops/decode_attention.py).

The kernel must reproduce plain softmax attention over the DEQUANTIZED prompt
KV exactly (same int8 values, fp32 accumulation), and ``cached_attention``
must merge its partial state with the generated-region/current parts to match
the full-precision two-part path within int8 quantization error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.models.layers import cached_attention
from mimic_tpu.ops.decode_attention import (
    prompt_attention_int8,
    prompt_kv_len,
    quantize_prompt_kv,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def test_prompt_kernel_matches_dequant_reference():
    B0, Kb, Hkv, G, D, Sp, L = 2, 3, 2, 2, 128, 256, 4
    B = B0 * Kb
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    pk = _rand(keys[0], (L, B0, Sp, Hkv, D))
    pv = _rand(keys[1], (L, B0, Sp, Hkv, D))
    qg = _rand(keys[2], (B, 1, Hkv, G, D)) / np.sqrt(D)
    mask = jnp.ones((B0, Sp), jnp.int32).at[:, :32].set(0)  # left padding

    pkq, pvq = quantize_prompt_kv(pk, pv)
    assert prompt_kv_len(pkq) == Sp
    layer = 2
    o, m, l = prompt_attention_int8(
        qg, dict(pkq, layer=jnp.int32(layer)), dict(pvq, layer=jnp.int32(layer)),
        mask, interpret=True,
    )
    assert o.shape == (B, Hkv, G, 1, D)
    assert m.shape == l.shape == (B, Hkv, G, 1)

    # reference: softmax over the same dequantized int8 values
    k_deq = pkq["q8"][layer].astype(jnp.float32) * pkq["scale"][layer][..., None]
    v_deq = pvq["q8"][layer].astype(jnp.float32) * pvq["scale"][layer][..., None]
    # [B0,Hkv,Sp,D] -> scores per beam-folded query
    qf = qg.reshape(B0, Kb, Hkv, G, D)
    s = jnp.einsum("bkhgd,bhsd->bkhgs", qf, k_deq)
    s = jnp.where(mask[:, None, None, None, :] > 0, s, -1e30)
    m_ref = jnp.max(s, axis=-1)
    p = jnp.exp(s - m_ref[..., None])
    l_ref = jnp.sum(p, axis=-1)
    o_ref = jnp.einsum("bkhgs,bhsd->bkhgd", p, v_deq)

    fold = lambda x: x.reshape((B, Hkv, G) + x.shape[4:])
    np.testing.assert_allclose(np.asarray(m[..., 0]), np.asarray(fold(m_ref)), rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(l[..., 0]), np.asarray(fold(l_ref)), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(o[..., 0, :]), np.asarray(fold(o_ref)), rtol=2e-2, atol=2e-3
    )


def test_cached_attention_quant_prompt_close_to_fp():
    B0, Kb, Hkv, G, D, Sp, Sgen, L = 2, 3, 2, 2, 128, 256, 8, 3
    B, H, T = B0 * Kb, Hkv * G, 1
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    pk = _rand(keys[0], (L, B0, Sp, Hkv, D), jnp.float32)
    pv = _rand(keys[1], (L, B0, Sp, Hkv, D), jnp.float32)
    q = _rand(keys[2], (B, T, H, D))
    k_new = _rand(keys[3], (B, T, Hkv, D))
    v_new = _rand(keys[4], (B, T, Hkv, D))
    gen_k = _rand(keys[5], (B, Sgen, Hkv, D))
    gen_v = _rand(keys[6], (B, Sgen, Hkv, D))
    cache_len = jnp.int32(Sp + 3)  # 3 generated slots written
    key_mask_gen = jnp.ones((B, Sgen), jnp.int32)
    key_mask_new = jnp.ones((B, T), jnp.int32)
    pmask = jnp.ones((B0, Sp), jnp.int32).at[:, :16].set(0)

    layer = 1
    out_fp, lse_fp, _ = cached_attention(
        q, k_new, v_new, gen_k, gen_v, cache_len, key_mask_gen, key_mask_new,
        prompt_k=pk[layer], prompt_v=pv[layer],
        prompt_mask=pmask, need_unmasked=False,
    )
    pkq, pvq = quantize_prompt_kv(pk, pv)
    out_q, lse_q, _ = cached_attention(
        q, k_new, v_new, gen_k, gen_v, cache_len, key_mask_gen, key_mask_new,
        prompt_k=dict(pkq, layer=jnp.int32(layer)),
        prompt_v=dict(pvq, layer=jnp.int32(layer)),
        prompt_mask=pmask, need_unmasked=False,
    )
    assert out_q.shape == out_fp.shape and lse_q.shape == lse_fp.shape
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(out_fp), rtol=0, atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(lse_q), np.asarray(lse_fp), rtol=0, atol=3e-2
    )


def test_quant_prompt_rejects_window_and_unmasked():
    B0, Hkv, D, Sp, L = 1, 1, 128, 128, 2
    pk = jnp.ones((L, B0, Sp, Hkv, D))
    pkq, pvq = quantize_prompt_kv(pk, pk)
    q = jnp.ones((B0, 1, Hkv, D))  # [B,T,H,D] with G=1
    kv = jnp.ones((B0, 4, Hkv, D))
    args = dict(
        cache_len=jnp.int32(Sp),
        key_mask=jnp.ones((B0, 4), jnp.int32),
        key_mask_new=jnp.ones((B0, 1), jnp.int32),
        prompt_k=dict(pkq, layer=jnp.int32(0)),
        prompt_v=dict(pvq, layer=jnp.int32(0)),
        prompt_mask=jnp.ones((B0, Sp), jnp.int32),
    )
    with pytest.raises(NotImplementedError):
        cached_attention(
            q, kv[:, :1], kv[:, :1], kv, kv, args["cache_len"],
            args["key_mask"], args["key_mask_new"],
            prompt_k=args["prompt_k"], prompt_v=args["prompt_v"],
            prompt_mask=args["prompt_mask"], window=16, need_unmasked=False,
        )
    with pytest.raises(NotImplementedError):
        cached_attention(
            q, kv[:, :1], kv[:, :1], kv, kv, args["cache_len"],
            args["key_mask"], args["key_mask_new"],
            prompt_k=args["prompt_k"], prompt_v=args["prompt_v"],
            prompt_mask=args["prompt_mask"], need_unmasked=True,
        )
