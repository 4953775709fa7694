"""IDEFICS-1 (cross-attention family) generation path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.generate import beam_generate, greedy_generate
from mimic_tpu.models.lvlm import LVLMBatch, lvlm_forward, init_lvlm_params
from mimic_tpu.models.processor import LVLMProcessor
from mimic_tpu.models.tokenizer import SimpleTokenizer


@pytest.fixture(scope="module")
def setup():
    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config("tiny-idefics1").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    # open the cross-attention gates so images matter
    params["lm"]["decoder"]["cross"]["alpha_attn"] = jnp.full_like(
        params["lm"]["decoder"]["cross"]["alpha_attn"], 0.5
    )
    proc = LVLMProcessor(cfg, tk)
    return cfg, params, proc, tk


def make_batch(proc, tk):
    rng = np.random.default_rng(0)
    img = lambda s: rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)
    enc = proc(
        [[img(0), img(1)], [img(2), img(3)]],
        [
            "Image:<image> Question: a? Answer: b\nImage:<image> Question: c? Answer:",
            "Image:<image> Question: d? Answer: e\nImage:<image> Question: f? Answer:",
        ],
    )
    return LVLMBatch(
        input_ids=jnp.asarray(enc["input_ids"]),
        attention_mask=jnp.asarray(enc["attention_mask"]),
        pixel_values=jnp.asarray(enc["pixel_values"]),
        pixel_mask=jnp.asarray(enc["pixel_mask"]),
        image_attention_mask=jnp.asarray(enc["image_attention_mask"]),
    )


def naive_greedy(params, cfg, batch, steps):
    ids, mask = batch.input_ids, batch.attention_mask
    img_mask = batch.image_attention_mask
    toks = []
    for _ in range(steps):
        logits = lvlm_forward(
            params, cfg,
            LVLMBatch(ids, mask, batch.pixel_values, batch.pixel_mask, img_mask),
        ).logits
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        toks.append(nxt)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
        mask = jnp.concatenate([mask, jnp.ones((ids.shape[0], 1), mask.dtype)], axis=1)
        img_mask = jnp.concatenate([img_mask, img_mask[:, -1:]], axis=1)
    return jnp.stack(toks, axis=1)


class TestIdefics1Generation:
    def test_greedy_matches_naive(self, setup):
        cfg, params, proc, tk = setup
        batch = make_batch(proc, tk)
        res = greedy_generate(
            params, cfg, batch, max_new_tokens=4,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        ref = naive_greedy(params, cfg, batch, 4)
        np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref))

    def test_beam_runs(self, setup):
        cfg, params, proc, tk = setup
        batch = make_batch(proc, tk)
        res = beam_generate(
            params, cfg, batch, max_new_tokens=3, num_beams=3,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        assert res.tokens.shape == (2, 3)
        assert np.isfinite(np.asarray(res.scores)).all()

    def test_image_attention_mask_matters(self, setup):
        """Swapping which image each token attends to must change the output."""
        cfg, params, proc, tk = setup
        batch = make_batch(proc, tk)
        flipped = batch._replace(
            image_attention_mask=batch.image_attention_mask[:, :, ::-1]
        )
        a = lvlm_forward(params, cfg, batch).logits
        b = lvlm_forward(params, cfg, flipped).logits
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
