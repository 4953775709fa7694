"""Gradient correctness of flash_attention_diff vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.models.layers import repeat_kv, sdpa_with_lse, unmasked_lse
from mimic_tpu.ops.flash_attention import flash_attention_diff


def make_qkv(B=1, T=64, S=64, H=2, Hkv=1, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32))
    key_mask = np.ones((B, S), np.int32)
    key_mask[0, 50:] = 0
    return q, k, v, jnp.asarray(key_mask)


def ref_outputs(q, k, v, key_mask):
    H, Hkv = q.shape[2], k.shape[2]
    T, S = q.shape[1], k.shape[1]
    kr, vr = repeat_kv(k, H // Hkv), repeat_kv(v, H // Hkv)
    mask = key_mask[:, None, None, :].astype(bool) & jnp.tril(jnp.ones((T, S), bool))[None, None]
    out, lse = sdpa_with_lse(q, kr, vr, mask)
    return out, lse, unmasked_lse(q, kr)


def flash_outputs(q, k, v, key_mask):
    return flash_attention_diff(q, k, v, key_mask, True, None, 32, 32, True, True)


@pytest.mark.parametrize(
    "loss_name,loss_of",
    [
        ("out", lambda o, l, lu: jnp.sum(o**2)),
        ("lse", lambda o, l, lu: jnp.sum(jnp.sin(l))),
        ("lse_u", lambda o, l, lu: jnp.sum(jnp.cos(lu))),
        ("mixed", lambda o, l, lu: jnp.sum(o) + jnp.sum(l * lu)),
    ],
)
def test_grads_match_reference(loss_name, loss_of):
    q, k, v, key_mask = make_qkv()

    def loss_flash(q, k, v):
        return loss_of(*flash_outputs(q, k, v, key_mask))

    def loss_ref(q, k, v):
        return loss_of(*ref_outputs(q, k, v, key_mask))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch for loss {loss_name}",
        )


def test_forward_values_consistent():
    q, k, v, key_mask = make_qkv()
    of, lf, luf = flash_outputs(q, k, v, key_mask)
    orf, lrf, lurf = ref_outputs(q, k, v, key_mask)
    np.testing.assert_allclose(np.asarray(of), np.asarray(orf), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(luf), np.asarray(lurf), rtol=1e-5, atol=1e-5)
