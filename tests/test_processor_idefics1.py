"""IDEFICS-1 processor parity: prompt assembly and image-attention-mask semantics
against HF ``IdeficsProcessor`` (transformers idefics/processing_idefics.py).

The reference pipeline splits templated text on "<image>" with empty segments
dropped (testbed/models/idefics.py:126-141) and hands the item list to the HF
processor, which strips text chunks, shares one fake token between consecutive
images, and resets image attention after EOS."""

import numpy as np
import pytest

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.processor import LVLMProcessor
from mimic_tpu.models.tokenizer import SimpleTokenizer

FAKE = "<fake_token_around_image>"
IMG = "<image>"


@pytest.fixture(scope="module")
def proc():
    cfg = get_model_config("tiny-idefics1")
    return LVLMProcessor(cfg, SimpleTokenizer())


class TestExpansion:
    def test_single_image_strips_chunk_spaces(self, proc):
        # HF strip(" ") applies to each text item around the image
        out = proc.expand_image_tokens("User: <image> Describe.")
        assert out == f"User:{FAKE}{IMG}{FAKE}Describe."

    def test_adjacent_images_share_one_fake(self, proc):
        out = proc.expand_image_tokens(f"{IMG}{IMG}Q")
        assert out == f"{FAKE}{IMG}{FAKE}{IMG}{FAKE}Q"

    def test_whitespace_chunk_breaks_the_run(self, proc):
        # " " strips to "" but still counts as a text item in HF: both images
        # keep their own fake pair (fake-fake is NOT merged)
        out = proc.expand_image_tokens(f"{IMG} {IMG}Q")
        assert out == f"{FAKE}{IMG}{FAKE}{FAKE}{IMG}{FAKE}Q"

    def test_newline_chunks_survive(self, proc):
        # strip(" ") only removes spaces, not newlines (HF uses strip(" "))
        out = proc.expand_image_tokens("User:\n<image>\nDescribe")
        assert out == f"User:\n{FAKE}{IMG}{FAKE}\nDescribe"


class TestImageAttentionMask:
    def _hf_incremental(self, input_ids, image_token_id, eos_token_id):
        torch = pytest.importorskip("torch")
        from transformers.models.idefics.processing_idefics import (
            image_attention_mask_for_packed_input_ids_pt,
        )

        class _Tok:
            def convert_tokens_to_ids(self, s):
                assert s == "<image>"
                return image_token_id

        tok = _Tok()
        tok.eos_token_id = eos_token_id
        inc, _ = image_attention_mask_for_packed_input_ids_pt(
            torch.tensor(input_ids), tok
        )
        return inc.numpy()

    def test_matches_hf_incremental_semantics(self, proc):
        tk = proc.tokenizer
        img, eos = tk.image_token_id, tk.eos_token_id
        # tokens: text, img, text, eos, text(after-eos: no image), img, text
        ids = np.array(
            [[5, img, 6, eos, 7, 8, img, 9],
             [img, img, 5, eos, eos, 6, 7, 8]], dtype=np.int32
        )
        ours = proc._image_attention_mask(ids, n_images=3)
        inc = self._hf_incremental(ids, img, eos)
        # HF converts the incremental mask to one-hot over images (−1 → no image)
        expected = np.zeros_like(ours)
        for b in range(ids.shape[0]):
            for t in range(ids.shape[1]):
                if 0 <= inc[b, t] < 3:
                    expected[b, t, inc[b, t]] = 1
        np.testing.assert_array_equal(ours, expected)

    def test_post_eos_tokens_attend_to_nothing(self, proc):
        tk = proc.tokenizer
        img, eos = tk.image_token_id, tk.eos_token_id
        ids = np.array([[img, 5, eos, 6, 7]], dtype=np.int32)
        m = proc._image_attention_mask(ids, n_images=1)
        # image + text + the EOS itself attend to image 0; after EOS nothing does
        np.testing.assert_array_equal(m[0, :, 0], [1, 1, 1, 0, 0])
