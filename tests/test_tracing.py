"""Introspection-utility tests (ForwardTracker/GradTracker/LocalsTracker analogs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import LVLMBatch, init_lvlm_params
from mimic_tpu.utils.tracing import attention_probs, capture_forward, capture_grads


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("tiny-idefics2")
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = LVLMBatch(
        input_ids=jnp.asarray(rng.integers(3, 250, size=(2, 12)).astype(np.int32)),
        attention_mask=jnp.ones((2, 12), jnp.int32),
    )
    return cfg, params, batch


class TestCaptureForward:
    def test_shapes(self, setup):
        cfg, params, batch = setup
        logits, caps = capture_forward(params, cfg, batch)
        L, D = cfg.text.num_layers, cfg.text.hidden_size
        assert caps["attn"].shape == (L, 2, 12, D)
        assert caps["ffn"].shape == (L, 2, 12, D)


class TestCaptureGrads:
    def test_grads_nonzero_and_shaped(self, setup):
        cfg, params, batch = setup
        grads = capture_grads(
            params, cfg, batch, lambda logits: jnp.sum(logits.astype(jnp.float32) ** 2)
        )
        L, D = cfg.text.num_layers, cfg.text.hidden_size
        assert grads["attn"].shape == (L, 2, 12, D)
        assert float(jnp.abs(grads["attn"]).max()) > 0
        assert float(jnp.abs(grads["ffn"]).max()) > 0

    def test_matches_finite_difference(self, setup):
        cfg, params, batch = setup
        loss_fn = lambda logits: jnp.mean(logits.astype(jnp.float32))
        grads = capture_grads(params, cfg, batch, loss_fn)
        # finite-difference check on one perturbation coordinate
        from mimic_tpu.models.lvlm import lvlm_forward

        eps = 1e-3
        pa = jnp.zeros((cfg.text.num_layers, 2, 12, cfg.text.hidden_size))
        pa_plus = pa.at[1, 0, 3, 5].add(eps)
        base = float(loss_fn(lvlm_forward(params, cfg, batch, perturb_attn=pa).logits))
        plus = float(loss_fn(lvlm_forward(params, cfg, batch, perturb_attn=pa_plus).logits))
        fd = (plus - base) / eps
        assert float(grads["attn"][1, 0, 3, 5]) == pytest.approx(fd, rel=1e-2, abs=1e-5)


class TestAttentionProbs:
    def test_probs_valid_distribution(self, setup):
        cfg, params, batch = setup
        probs = attention_probs(params, cfg, batch, layer=1)
        H = cfg.text.num_heads
        assert probs.shape == (2, H, 12, 12)
        sums = np.asarray(jnp.sum(probs, axis=-1))
        np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
        # causality: upper triangle is zero
        upper = np.triu(np.ones((12, 12), bool), k=1)
        assert np.abs(np.asarray(probs)[:, :, upper]).max() < 1e-6
