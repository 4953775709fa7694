"""Variable-aspect image processing for idefics2 (patch masks + bucketized pos ids)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import LVLMBatch, lvlm_forward
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.processor import ImageProcessor, LVLMProcessor
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.models.vision import bucket_position_ids


class TestImageProcessorModes:
    def test_square_mode(self):
        proc = ImageProcessor(size=28, mode="square")
        arr, region = proc.process_with_region(
            np.zeros((100, 50, 3), np.uint8)
        )
        assert arr.shape == (28, 28, 3)
        assert region == (28, 28)

    def test_longest_edge_preserves_aspect(self):
        proc = ImageProcessor(size=28, mode="longest_edge", min_size=1)
        img = np.full((100, 50, 3), 255, np.uint8)
        arr, (vh, vw) = proc.process_with_region(img)
        assert arr.shape == (28, 28, 3)
        assert vh == 28 and vw == 14
        # HF pads AFTER normalization with constant 0.0 (resize → rescale →
        # normalize → pad, Idefics2ImageProcessor.preprocess)
        assert np.allclose(arr[:, 20:], 0.0)
        assert not np.allclose(arr[:vh, :vw], -1.0)


class TestBucketPositionIds:
    def test_full_grid_is_identity(self):
        mask = jnp.ones((1, 4, 4), jnp.int32)
        ids = bucket_position_ids(mask)
        np.testing.assert_array_equal(np.asarray(ids)[0], np.arange(16))

    def test_half_width_stretches(self):
        mask = np.zeros((1, 4, 4), np.int32)
        mask[0, :, :2] = 1  # half-width image
        ids = np.asarray(bucket_position_ids(jnp.asarray(mask))).reshape(4, 4)
        # valid columns 0,1 map to stretched buckets 0 and 2
        assert ids[0, 0] == 0 and ids[0, 1] == 2
        # rows advance by a full grid row
        assert ids[1, 0] == 4
        # padded region is id 0 (masked out of attention anyway)
        assert ids[0, 3] == 0


class TestAspectForward:
    def test_patch_mask_changes_logits(self):
        tk = SimpleTokenizer()
        cfg = get_model_config("tiny-idefics2").replace(
            image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id,
        )
        cfg = cfg.replace(text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
        params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        proc = LVLMProcessor(cfg, tk)
        assert proc.image_processor.mode == "longest_edge"
        # the real model keeps shortest edge ≥378; relax for the 28px tiny canvas
        # so a genuinely rectangular region survives
        proc.image_processor.min_size = 1
        rng = np.random.default_rng(0)
        wide = rng.integers(0, 255, size=(14, 28, 3)).astype(np.uint8)
        enc = proc([[wide]], ["Image:<image> Q Answer:"])
        assert "patch_mask" in enc
        assert enc["patch_mask"].shape == (1, 1, 2, 2)
        # wide image: full width, half height of 28px canvas → top row valid
        np.testing.assert_array_equal(enc["patch_mask"][0, 0], [[1, 1], [0, 0]])
        batch = LVLMBatch(
            input_ids=jnp.asarray(enc["input_ids"]),
            attention_mask=jnp.asarray(enc["attention_mask"]),
            pixel_values=jnp.asarray(enc["pixel_values"]),
            pixel_mask=jnp.asarray(enc["pixel_mask"]),
            patch_mask=jnp.asarray(enc["patch_mask"]),
        )
        with_mask = lvlm_forward(params, cfg, batch).logits
        without = lvlm_forward(params, cfg, batch._replace(patch_mask=None)).logits
        assert not np.allclose(np.asarray(with_mask), np.asarray(without), atol=1e-6)
