import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.config import EncoderConfig, get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.decoder import (
    init_kv_cache,
    make_causal_mask,
    make_decode_mask,
    positions_from_mask,
)
from mimic_tpu.models.lm import init_lm_params, lm_forward
from mimic_tpu.shift.params import init_shift_params


@pytest.fixture(scope="module")
def tiny():
    cfg = get_model_config("tiny-idefics2").text
    params = init_lm_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=(2, 16))
    ids[1, 12:] = 0  # right padding
    mask = (ids != 0).astype(np.int32)
    return jnp.asarray(ids), jnp.asarray(mask)


class TestForward:
    def test_shapes(self, tiny, batch):
        cfg, params = tiny
        ids, mask = batch
        out = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask))
        assert out.logits.shape == (2, 16, cfg.vocab_size)
        assert out.decoder.attn_capture is None

    def test_capture_shapes(self, tiny, batch):
        cfg, params = tiny
        ids, mask = batch
        out = lm_forward(
            params, cfg, ids, attn_mask=make_causal_mask(mask),
            capture_attn=True, capture_ffn=True,
        )
        assert out.decoder.attn_capture.shape == (cfg.num_layers, 2, 16, cfg.hidden_size)
        assert out.decoder.ffn_capture.shape == (cfg.num_layers, 2, 16, cfg.hidden_size)

    def test_padding_invariance(self, tiny):
        """Logits at real positions must not depend on pad-token content."""
        cfg, params = tiny
        ids = jnp.array([[5, 6, 7, 0, 0]])
        mask = jnp.array([[1, 1, 1, 0, 0]])
        ids2 = jnp.array([[5, 6, 7, 9, 9]])
        a = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask)).logits
        b = lm_forward(params, cfg, ids2, attn_mask=make_causal_mask(mask)).logits
        np.testing.assert_allclose(a[0, :3], b[0, :3], rtol=2e-5, atol=2e-5)

    def test_causality(self, tiny):
        """Changing a later token must not change earlier logits."""
        cfg, params = tiny
        ids = jnp.array([[5, 6, 7, 8, 9]])
        mask = jnp.ones((1, 5), jnp.int32)
        a = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask)).logits
        ids2 = ids.at[0, 4].set(42)
        b = lm_forward(params, cfg, ids2, attn_mask=make_causal_mask(mask)).logits
        np.testing.assert_allclose(a[0, :4], b[0, :4], rtol=2e-5, atol=2e-5)


class TestKVCache:
    def test_incremental_matches_full(self, tiny):
        cfg, params = tiny
        ids = jnp.array([[5, 6, 7, 8, 9, 10]])
        T = ids.shape[1]
        mask = jnp.ones((1, T), jnp.int32)
        full = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask)).logits

        # prefill 4 tokens then decode 2
        cache = init_kv_cache(cfg, 1, T)
        prefill_mask = make_causal_mask(mask[:, :4])
        pad = jnp.zeros((1, 1, 4, T - 4), bool)
        out = lm_forward(
            params, cfg, ids[:, :4],
            attn_mask=jnp.concatenate([prefill_mask, pad], axis=-1),
            kv_cache=cache,
        )
        cache = out.decoder.kv_cache
        logits4 = out.logits
        np.testing.assert_allclose(logits4, full[:, :4], rtol=2e-5, atol=2e-5)

        for t in range(4, 6):
            step_mask = make_decode_mask(mask[:, : t + 1], T)
            out = lm_forward(
                params, cfg, ids[:, t : t + 1],
                attn_mask=step_mask,
                position_ids=jnp.array([[t]]),
                kv_cache=cache,
            )
            cache = out.decoder.kv_cache
            np.testing.assert_allclose(
                out.logits[:, 0], full[:, t], rtol=2e-5, atol=2e-5
            )


class TestShift:
    def test_mimic_shift_changes_output(self, tiny, batch):
        cfg, params = tiny
        ids, mask = batch
        enc, _ = get_preset("mimic")
        shift = init_shift_params(enc, cfg, jax.random.PRNGKey(1))
        assert set(shift) == {"attn_v", "attn_logz1_w", "attn_logz1_b"}
        base = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask)).logits
        shifted = lm_forward(
            params, cfg, ids, attn_mask=make_causal_mask(mask), shift=shift
        ).logits
        assert not np.allclose(base, shifted, atol=1e-6)

    def test_zero_shift_vector_is_identity(self, tiny, batch):
        cfg, params = tiny
        ids, mask = batch
        enc, _ = get_preset("mimic")
        shift = init_shift_params(enc, cfg, jax.random.PRNGKey(1))
        shift["attn_v"] = jnp.zeros_like(shift["attn_v"])
        base = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask)).logits
        shifted = lm_forward(
            params, cfg, ids, attn_mask=make_causal_mask(mask), shift=shift
        ).logits
        np.testing.assert_allclose(base, shifted, rtol=1e-5, atol=1e-5)

    def test_licv_output_shift(self, tiny, batch):
        cfg, params = tiny
        ids, mask = batch
        enc, _ = get_preset("licv")
        shift = init_shift_params(enc, cfg, jax.random.PRNGKey(1))
        assert set(shift) == {"ffn_shift", "ffn_scale"}
        assert float(shift["ffn_scale"][0]) == pytest.approx(0.1)
        base = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask)).logits
        shifted = lm_forward(
            params, cfg, ids, attn_mask=make_causal_mask(mask), shift=shift
        ).logits
        assert not np.allclose(base, shifted, atol=1e-6)

    def test_masked_vs_unmasked_logz2_differ(self, tiny, batch):
        cfg, params = tiny
        ids, mask = batch
        enc, _ = get_preset("mimic")
        shift = init_shift_params(enc, cfg, jax.random.PRNGKey(1))
        a = lm_forward(
            params, cfg, ids, attn_mask=make_causal_mask(mask), shift=shift, logz2="unmasked"
        ).logits
        b = lm_forward(
            params, cfg, ids, attn_mask=make_causal_mask(mask), shift=shift, logz2="masked"
        ).logits
        assert not np.allclose(a, b, atol=1e-6)


class TestCrossAttn:
    def test_idefics1_cross_layers(self):
        cfg = get_model_config("tiny-idefics1").text
        params = init_lm_params(cfg, jax.random.PRNGKey(0))
        assert "cross" in params["decoder"]
        ids = jnp.array([[5, 6, 7, 8]])
        mask = jnp.ones((1, 4), jnp.int32)
        cross_states = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 6, cfg.cross_kv_dim)), jnp.float32
        )
        base = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask)).logits
        with_img = lm_forward(
            params, cfg, ids, attn_mask=make_causal_mask(mask), cross_states=cross_states
        ).logits
        # alpha gates init to zero → tanh(0)=0 → cross-attn is a no-op at init
        np.testing.assert_allclose(base, with_img, rtol=1e-5, atol=1e-5)
        # open the gates: outputs must change
        params2 = jax.tree.map(lambda x: x, params)
        params2["decoder"]["cross"]["alpha_attn"] = jnp.ones_like(
            params["decoder"]["cross"]["alpha_attn"]
        )
        with_gate = lm_forward(
            params2, cfg, ids, attn_mask=make_causal_mask(mask), cross_states=cross_states
        ).logits
        assert not np.allclose(base, with_gate, atol=1e-6)


class TestPositions:
    def test_positions_from_mask_left_pad(self):
        mask = jnp.array([[0, 0, 1, 1, 1]])
        np.testing.assert_array_equal(
            positions_from_mask(mask)[0], jnp.array([0, 0, 0, 1, 2])
        )


class TestSlidingWindow:
    """Mistral-style sliding-window attention (reference
    src/shift_encoder.py:514-523 passes config.sliding_window to SDPA)."""

    def _cfg(self, window, num_layers=1):
        base = get_model_config("tiny-idefics2").text
        return base.__class__(
            **{**base.__dict__, "sliding_window": window, "num_layers": num_layers}
        )

    def test_noop_when_window_covers_context(self, tiny):
        cfg, _ = tiny
        cfgw = cfg.__class__(**{**cfg.__dict__, "sliding_window": 64})
        params = init_lm_params(cfg, jax.random.PRNGKey(0))
        ids = jnp.arange(5, 15)[None]
        mask = jnp.ones((1, 10), jnp.int32)
        a = lm_forward(params, cfg, ids, attn_mask=make_causal_mask(mask)).logits
        b = lm_forward(
            params, cfgw, ids,
            attn_mask=make_causal_mask(mask, cfgw.sliding_window),
        ).logits
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_out_of_window_token_is_invisible(self):
        """Single layer, window W: logits at position t must not depend on
        tokens at positions <= t-W (the layer receptive field is exactly W)."""
        cfg = self._cfg(window=3, num_layers=1)
        params = init_lm_params(cfg, jax.random.PRNGKey(1))
        ids = jnp.array([[5, 6, 7, 8, 9, 10]])
        mask = jnp.ones((1, 6), jnp.int32)
        m4 = make_causal_mask(mask, cfg.sliding_window)
        a = lm_forward(params, cfg, ids, attn_mask=m4).logits
        # position 5 sees slots {3,4,5} only; changing slot 0 must not matter
        b = lm_forward(params, cfg, ids.at[0, 0].set(99), attn_mask=m4).logits
        np.testing.assert_allclose(a[0, 5], b[0, 5], rtol=1e-5, atol=1e-5)
        # ... but changing slot 4 (inside the window) must
        c = lm_forward(params, cfg, ids.at[0, 4].set(99), attn_mask=m4).logits
        assert not np.allclose(a[0, 5], c[0, 5], atol=1e-6)

    def test_incremental_matches_full_with_window(self):
        """Cached prefill+decode must reproduce the no-cache windowed forward
        (exercises the timeline-position window mask in cached_attention)."""
        cfg = self._cfg(window=3, num_layers=2)
        params = init_lm_params(cfg, jax.random.PRNGKey(2))
        ids = jnp.array([[5, 6, 7, 8, 9, 10, 11, 12]])
        T = ids.shape[1]
        mask = jnp.ones((1, T), jnp.int32)
        full = lm_forward(
            params, cfg, ids, attn_mask=make_causal_mask(mask, cfg.sliding_window)
        ).logits

        cache = init_kv_cache(cfg, 1, T)
        prefill_mask = make_causal_mask(mask[:, :4], cfg.sliding_window)
        pad = jnp.zeros((1, 1, 4, T - 4), bool)
        out = lm_forward(
            params, cfg, ids[:, :4],
            attn_mask=jnp.concatenate([prefill_mask, pad], axis=-1),
            kv_cache=cache,
        )
        cache = out.decoder.kv_cache
        np.testing.assert_allclose(out.logits, full[:, :4], rtol=2e-5, atol=2e-5)
        for t in range(4, T):
            out = lm_forward(
                params, cfg, ids[:, t : t + 1],
                attn_mask=make_decode_mask(mask[:, : t + 1], T),
                position_ids=jnp.array([[t]]),
                kv_cache=cache,
            )
            cache = out.decoder.kv_cache
            np.testing.assert_allclose(
                out.logits[:, 0], full[:, t], rtol=2e-5, atol=2e-5
            )
