"""Native C++ bilinear resize vs the PIL oracle (bit-exact).

PIL's BILINEAR is a triangle-filter convolution with downscale-scaled support
and fixed-point uint8 arithmetic; ``native/image_ops.cpp`` reimplements it
exactly, so the comparison is array_equal, not allclose."""

import numpy as np
import pytest

from mimic_tpu.native import native_available, resize_bilinear_native

PIL = pytest.importorskip("PIL.Image")

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def pil_resize(arr, h, w):
    return np.asarray(PIL.fromarray(arr).resize((w, h), PIL.BILINEAR))


@pytest.mark.parametrize(
    "src,dst",
    [
        ((100, 50), (28, 28)),     # downscale, aspect change
        ((480, 640), (378, 504)),  # idefics2-ish longest-edge shapes
        ((10, 10), (224, 224)),    # upscale
        ((7, 13), (13, 7)),        # odd sizes both directions
        ((224, 224), (224, 224)),  # identity
        ((1, 1), (8, 8)),          # degenerate input
    ],
)
def test_bit_exact_vs_pil(src, dst):
    rng = np.random.default_rng(hash(src + dst) % 2**32)
    arr = rng.integers(0, 256, size=src + (3,), dtype=np.uint8)
    ours = resize_bilinear_native(arr, *dst)
    ref = pil_resize(arr, *dst)
    np.testing.assert_array_equal(ours, ref)


def test_image_processor_uses_native_path():
    from mimic_tpu.models.processor import ImageProcessor

    proc = ImageProcessor(size=28, mode="longest_edge", min_size=1)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(100, 50, 3), dtype=np.uint8)
    arr, (vh, vw) = proc.process_with_region(img)
    assert (vh, vw) == (28, 14)
    # whole pipeline equals the PIL-path result exactly
    resized = pil_resize(img, 28, 14)
    expected = np.zeros((28, 28, 3), np.float32)
    expected[:, :14] = (resized.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(arr, expected, rtol=0, atol=1e-6)


@pytest.mark.parametrize(
    "src,dst",
    [((100, 50), (28, 28)), ((40, 40), (224, 224)), ((7, 13), (13, 7))],
)
def test_bicubic_bit_exact_vs_pil(src, dst):
    from mimic_tpu.native import resize_native

    rng = np.random.default_rng(hash(src + dst) % 2**32)
    arr = rng.integers(0, 256, size=src + (3,), dtype=np.uint8)
    ours = resize_native(arr, *dst, "bicubic")
    ref = np.asarray(PIL.fromarray(arr).resize((dst[1], dst[0]), PIL.BICUBIC))
    np.testing.assert_array_equal(ours, ref)


def test_family_resample_selection():
    """idefics2 resizes BILINEAR, idefics1/llava BICUBIC (their HF processors)."""
    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.processor import LVLMProcessor
    from mimic_tpu.models.tokenizer import SimpleTokenizer

    tk = SimpleTokenizer()
    assert LVLMProcessor(get_model_config("tiny-idefics2"), tk).image_processor.resample == "bilinear"
    assert LVLMProcessor(get_model_config("tiny-idefics1"), tk).image_processor.resample == "bicubic"
    assert LVLMProcessor(get_model_config("tiny-llava-interleave"), tk).image_processor.resample == "bicubic"
