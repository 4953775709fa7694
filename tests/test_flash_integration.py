"""Flash path integration: decoder forward with attn_impl='flash' (interpret on CPU
via monkeypatched kernel) must match the XLA path, including the MimIC shift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mimic_tpu.models.decoder as decoder_mod
from mimic_tpu.config import get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import LVLMBatch, init_lvlm_params, lvlm_forward
from mimic_tpu.ops import flash_attention
from mimic_tpu.shift.params import init_shift_params


@pytest.fixture(autouse=True)
def interpret_flash(monkeypatch):
    import importlib

    fa = importlib.import_module("mimic_tpu.ops.flash_attention")
    orig = fa.flash_attention

    def interpreted(*args, **kwargs):
        # force interpreter mode + small blocks regardless of caller settings
        kwargs["interpret"] = True
        kwargs["block_q"] = 64
        kwargs["block_k"] = 64
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa, "flash_attention", interpreted)
    yield


@pytest.fixture(scope="module")
def setup():
    # head_size must be 128 for the flash eligibility check
    cfg = get_model_config("tiny-idefics2")
    text = cfg.text.__class__(
        **{**cfg.text.__dict__, "hidden_size": 256, "num_heads": 2, "num_kv_heads": 2,
           "head_dim": 128, "num_layers": 2}
    )
    cfg = cfg.replace(text=text)
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_batch(B=2, T=128):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[0, 100:] = 0
    mask[1, 40:44] = 0  # internal pad separators
    return LVLMBatch(input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))


class TestFlashIntegration:
    def test_forward_matches_xla(self, setup):
        cfg, params = setup
        batch = make_batch()
        ref = lvlm_forward(params, cfg, batch, attn_impl="xla").logits
        out = lvlm_forward(params, cfg, batch, attn_impl="flash").logits
        mask = np.asarray(batch.attention_mask, bool)
        np.testing.assert_allclose(
            np.asarray(out)[mask], np.asarray(ref)[mask], rtol=3e-4, atol=3e-4
        )

    @pytest.mark.parametrize("logz2", ["unmasked", "masked"])
    def test_shifted_forward_matches(self, setup, logz2):
        cfg, params = setup
        enc, _ = get_preset("mimic")
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
        # scale the shift up so differences would be visible
        shift["attn_v"] = shift["attn_v"] * 100
        batch = make_batch()
        ref = lvlm_forward(params, cfg, batch, shift=shift, logz2=logz2, attn_impl="xla").logits
        out = lvlm_forward(params, cfg, batch, shift=shift, logz2=logz2, attn_impl="flash").logits
        mask = np.asarray(batch.attention_mask, bool)
        np.testing.assert_allclose(
            np.asarray(out)[mask], np.asarray(ref)[mask], rtol=3e-4, atol=3e-4
        )

    def test_capture_matches(self, setup):
        cfg, params = setup
        batch = make_batch()
        ref = lvlm_forward(params, cfg, batch, capture_attn=True, attn_impl="xla")
        out = lvlm_forward(params, cfg, batch, capture_attn=True, attn_impl="flash")
        mask = np.asarray(batch.attention_mask, bool)
        a = np.asarray(out.decoder.attn_capture)[:, mask]
        b = np.asarray(ref.decoder.attn_capture)[:, mask]
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)
