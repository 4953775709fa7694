"""Training vision-feature cache: feats-fed step ≈ pixels-fed step, hits recur.

The record pass's demo images resample from a fixed train set and the vision
tower is frozen — the cache must not change the training signal beyond float
ulps (different encode batch shapes), and repeated steps must hit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.config import get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.processor import LVLMProcessor
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.shift.params import init_shift_params
from mimic_tpu.train import TrainCollator, TrainState, build_optimizer, make_train_step
from mimic_tpu.train.step import _to_device_batch
from mimic_tpu.train.vision_cache import TrainVisionCache


def _setup():
    tk = SimpleTokenizer(padding_side="right")
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(
        text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size})
    )
    frozen = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    return cfg, frozen, LVLMProcessor(cfg, tk)


def _string_batch(pool, draw_seed):
    rng = np.random.default_rng(draw_seed)
    pick = lambda: pool[rng.integers(len(pool))]
    return {
        "prefix_texts": [
            "Image:<image> Question: what is this? Answer: a cat\n",
            "Image:<image> Question: how many? Answer: two\n",
        ],
        "query_texts": [
            "Image:<image> Question: what now? Answer:",
            "Image:<image> Question: who? Answer:",
        ],
        "answers": ["a dog", "three"],
        "images": [[pick(), pick()], [pick(), pick()]],
    }


class TestTrainVisionCache:
    def test_feats_step_matches_pixels_step(self):
        cfg, frozen, proc = _setup()
        enc, peft = get_preset("mimic")
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
        trainable = {"shift": shift}
        tx = build_optimizer(
            trainable, lr=peft.lr, weight_decay=1e-3, warmup_steps=1,
            total_steps=10, grad_clip=1.0,
        )
        step = make_train_step(
            cfg, enc, tx, ce_loss_weight=peft.ce_loss_weight,
            align_loss_weight=peft.align_loss_weight, donate=False,
        )
        collator = TrainCollator(
            proc, enc.strategy(), num_image_in_query=1, emit_image_keys=True
        )
        rng = np.random.default_rng(3)
        pool = [
            rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)
            for _ in range(3)
        ]
        xform = TrainVisionCache(cfg, frozen)

        tb = collator(_string_batch(pool, 0))
        assert tb.full_image_keys is not None and tb.query_image_keys is not None

        state0 = lambda: TrainState(
            jax.tree.map(jnp.asarray, trainable), tx.init(trainable),
            jnp.zeros((), jnp.int32),
        )
        _, m_px = step(state0(), frozen, _to_device_batch(tb))
        cached_batch = xform(tb)
        assert "full_feats" in cached_batch and "query_feats" in cached_batch
        assert "full_pixels" not in cached_batch
        _, m_ft = step(state0(), frozen, cached_batch)

        for k in ("loss", "ce_loss", "ffn_mse_loss", "grad_norm"):
            if k in m_px:
                a, b = float(m_px[k]), float(m_ft[k])
                assert abs(a - b) <= 1e-4 * max(abs(a), 1.0) + 1e-5, (k, a, b)

        # second step with a different draw from the same pool: demo images
        # repeat -> hits; only genuinely new content would miss
        m0 = xform.cache.misses
        xform(collator(_string_batch(pool, 1)))
        assert xform.cache.misses == m0
        assert xform.cache.hits > 0

    def test_idefics1_rejected(self):
        tk = SimpleTokenizer()
        cfg = get_model_config("tiny-idefics1").replace(
            image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id
        )
        params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            TrainVisionCache(cfg, params)
