"""Pallas backward kernels vs the jnp VJP (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.ops.flash_attention import flash_attention, _diff_bwd
from mimic_tpu.ops.flash_backward import flash_attention_backward


def setup(B=2, T=128, S=128, H=4, Hkv=2, D=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32))
    km = np.ones((B, S), np.int32)
    km[0, 100:] = 0
    km[1, 30:34] = 0
    km = jnp.asarray(km)
    out, lse, lse_u = flash_attention(
        q, k, v, km, causal=True, block_q=64, block_k=64, interpret=True
    )
    g_out = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    g_lse = jnp.asarray(rng.normal(size=lse.shape).astype(np.float32))
    g_lse_u = jnp.asarray(rng.normal(size=lse_u.shape).astype(np.float32))
    return q, k, v, km, out, lse, lse_u, g_out, g_lse, g_lse_u


@pytest.mark.parametrize("with_lse_grads", [False, True])
def test_kernel_matches_jnp_vjp(with_lse_grads):
    q, k, v, km, out, lse, lse_u, g_out, g_lse, g_lse_u = setup()
    if not with_lse_grads:
        g_lse = g_lse_u = None
    dq_k, dk_k, dv_k = flash_attention_backward(
        q, k, v, km, out, lse, lse_u, g_out, g_lse, g_lse_u,
        causal=True, block_q=64, block_k=64, need_unmasked=True, interpret=True,
    )
    cts = (
        g_out,
        g_lse if g_lse is not None else jnp.zeros_like(lse),
        g_lse_u if g_lse_u is not None else jnp.zeros_like(lse_u),
    )
    res = (q, k, v, km, out, lse, lse_u)
    dq_j, dk_j, dv_j, _ = _diff_bwd(True, None, 64, 64, True, True, res, cts)
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_j), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk_k), np.asarray(dk_j), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_j), rtol=2e-4, atol=2e-4)


def test_rectangular_and_no_unmasked():
    q, k, v, km, out, lse, lse_u, g_out, _, _ = setup(T=128, S=256)
    # regenerate forward for S=256 shapes
    out, lse, lse_u = flash_attention(
        q, k, v, km, causal=True, block_q=64, block_k=64, interpret=True,
        need_unmasked=False,
    )
    dq_k, dk_k, dv_k = flash_attention_backward(
        q, k, v, km, out, lse, lse_u, g_out, None, None,
        causal=True, block_q=64, block_k=64, need_unmasked=False, interpret=True,
    )
    cts = (g_out, jnp.zeros_like(lse), jnp.zeros_like(lse_u))
    res = (q, k, v, km, out, lse, lse_u)
    dq_j, dk_j, dv_j, _ = _diff_bwd(True, None, 64, 64, False, True, res, cts)
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_j), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk_k), np.asarray(dk_j), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_j), rtol=2e-4, atol=2e-4)
