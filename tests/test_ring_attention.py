"""Ring attention over an 8-device mesh vs single-device reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mimic_tpu.models.layers import repeat_kv, sdpa_with_lse, unmasked_lse
from mimic_tpu.ops.ring_attention import ring_attention_sharded


def make_inputs(B=2, T=64, H=4, Hkv=2, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    km = np.ones((B, T), np.int32)
    km[0, 50:] = 0          # suffix padding
    km[1, 20:23] = 0        # internal pads
    return q, k, v, jnp.asarray(km)


def reference(q, k, v, km, causal):
    T = q.shape[1]
    G = q.shape[2] // k.shape[2]
    kr, vr = repeat_kv(k, G), repeat_kv(v, G)
    mask = km[:, None, None, :].astype(bool)
    if causal:
        mask = mask & jnp.tril(jnp.ones((T, T), bool))[None, None]
    out, lse = sdpa_with_lse(q, kr, vr, mask)
    # fully unmasked (no causal, no padding): parity with flash's lse_u and
    # the XLA unmasked_lse (reference do_shift applies no mask)
    lse_u = unmasked_lse(q, kr)
    return out, lse, lse_u


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(eight_devices, causal):
    mesh = Mesh(np.asarray(eight_devices), axis_names=("sp",))
    q, k, v, km = make_inputs()
    out, lse, lse_u = ring_attention_sharded(mesh, q, k, v, km, causal=causal)
    ref_out, ref_lse, ref_lse_u = reference(q, k, v, km, causal)
    valid = np.asarray(ref_lse) > -1e29
    np.testing.assert_allclose(
        np.asarray(out)[valid.any(-1)], np.asarray(ref_out)[valid.any(-1)],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(lse)[valid], np.asarray(ref_lse)[valid], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lse_u), np.asarray(ref_lse_u), rtol=1e-5, atol=1e-5
    )


def test_ring_four_devices(eight_devices):
    mesh = Mesh(np.asarray(eight_devices[:4]), axis_names=("sp",))
    q, k, v, km = make_inputs(T=32, seed=3)
    out, lse, _ = ring_attention_sharded(mesh, q, k, v, km, causal=True)
    ref_out, ref_lse, _ = reference(q, k, v, km, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=2e-5, atol=2e-5)
