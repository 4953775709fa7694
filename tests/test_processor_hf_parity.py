"""Tokenizer-level prompt parity for idefics1: our LVLMProcessor vs the real HF
``IdeficsProcessor`` driven exactly the way the reference drives it
(testbed/models/idefics.py:126-151 — split templated text on "<image>", drop
empty segments, interleave PIL images).

The tokenizer is a real ``LlamaTokenizerFast`` built locally (tiny BPE trained
in-test, with a bos post-processor like the genuine idefics-9b tokenizer), so
this closes the "real tokenizers" layer without needing checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def hf_tok():
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers
    from transformers.models.llama import LlamaTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=320,
        special_tokens=["<unk>", "<s>", "</s>", "<pad>",
                        "<fake_token_around_image>", "<image>", "<end_of_utterance>"],
    )
    corpus = [
        "User: Describe this image. Assistant: a red cat sits here.",
        "Question: what color is it? Answer: red two three blue",
    ] * 20
    tok.train_from_iterator(corpus, trainer)
    # genuine llama tokenizers add <s> via a post-processor (add_bos_token)
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", tok.token_to_id("<s>"))],
    )
    return LlamaTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>",
        pad_token="<pad>",
        additional_special_tokens=[
            "<fake_token_around_image>", "<image>", "<end_of_utterance>"
        ],
    )


def reference_style_prompt(text, images):
    """testbed/models/idefics.py:126-141: split on <image>, drop empty segments,
    interleave PIL images."""
    parts = text.split("<image>")
    assert len(parts) - 1 == len(images)
    out = []
    for seg, img in zip(parts, images):
        if seg != "":
            out.append(seg)
        out.append(img)
    if parts[-1] != "":
        out.append(parts[-1])
    return out


@pytest.mark.parametrize(
    "text,n_images",
    [
        ("User: <image> Describe this image.\nAssistant:", 1),
        ("<image><image>Question: what color is it? Answer:", 2),
        ("User: <image> what? Assistant: red.</s>User: <image> and? Assistant:", 2),
    ],
)
def test_idefics1_matches_hf_processor(hf_tok, text, n_images):
    from transformers.models.idefics.image_processing_idefics import (
        IdeficsImageProcessor,
    )
    from transformers.models.idefics.processing_idefics import IdeficsProcessor

    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.processor import LVLMProcessor
    from mimic_tpu.models.tokenizer import HFTokenizerAdapter

    rng = np.random.default_rng(0)
    pil_images = [
        PIL.fromarray(rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8))
        for _ in range(n_images)
    ]

    hf_proc = IdeficsProcessor(
        image_processor=IdeficsImageProcessor(image_size=28), tokenizer=hf_tok
    )
    hf_out = hf_proc(
        text=[reference_style_prompt(text, pil_images)],
        return_tensors="pt", padding=True,
    )

    cfg = get_model_config("tiny-idefics1")
    ours = LVLMProcessor(cfg, HFTokenizerAdapter(hf_tok), image_size=28)(
        [pil_images], [text]
    )

    np.testing.assert_array_equal(
        ours["input_ids"], hf_out["input_ids"].numpy(),
        err_msg=f"ours: {hf_tok.decode(ours['input_ids'][0])!r} "
                f"hf: {hf_tok.decode(hf_out['input_ids'][0])!r}",
    )
    np.testing.assert_array_equal(
        ours["attention_mask"], hf_out["attention_mask"].numpy()
    )
    np.testing.assert_array_equal(
        ours["image_attention_mask"],
        hf_out["image_attention_mask"].numpy().astype(np.int32),
    )
    # pixels: HF = bicubic resize → /255 → CLIP-normalize, channel-first
    hf_px = hf_out["pixel_values"].numpy()  # [1,N,3,28,28]
    np.testing.assert_allclose(
        ours["pixel_values"].transpose(0, 1, 4, 2, 3), hf_px, rtol=1e-5, atol=1e-5
    )


@pytest.fixture(scope="module")
def hf_tok_plain():
    """No bos post-processor — mirrors how this test drives both sides."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=320,
        special_tokens=["<unk>", "<s>", "</s>", "<pad>",
                        "<fake_token_around_image>", "<image>", "<end_of_utterance>"],
    )
    tok.train_from_iterator(
        ["User: Describe this image. Assistant: a red cat", "what color? red two"] * 20,
        trainer,
    )
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>",
        pad_token="<pad>",
        additional_special_tokens=[
            "<fake_token_around_image>", "<image>", "<end_of_utterance>"
        ],
    )


@pytest.mark.parametrize(
    "text,n_images",
    [
        ("User: <image> Describe.\nAssistant:", 1),
        ("<image><image>what color? Answer:", 2),
    ],
)
def test_idefics2_matches_hf_processor(hf_tok_plain, text, n_images):
    """idefics2: token expansion (fake/image runs with merging), attention mask,
    variable-aspect resize and the patch attention mask all match the HF
    Idefics2Processor (do_image_splitting=False, the reference's setting —
    testbed/models/idefics2.py:22-24)."""
    from transformers.models.idefics2.image_processing_idefics2 import (
        Idefics2ImageProcessor,
    )
    from transformers.models.idefics2.processing_idefics2 import Idefics2Processor

    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.processor import LVLMProcessor
    from mimic_tpu.models.tokenizer import HFTokenizerAdapter

    rng = np.random.default_rng(1)
    pil_images = [
        PIL.fromarray(rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8))
        for _ in range(n_images)
    ]

    hf_proc = Idefics2Processor(
        image_processor=Idefics2ImageProcessor(
            do_image_splitting=False,
            size={"shortest_edge": 14, "longest_edge": 28},
        ),
        tokenizer=hf_tok_plain,
        image_seq_len=4,
    )
    hf_out = hf_proc(
        text=[text.replace("<image>", "<image>")],
        images=[pil_images], return_tensors="pt", padding=True,
    )

    cfg = get_model_config("tiny-idefics2")
    # the tiny config's min_size guard is driven by image size; match HF's
    # shortest_edge=14 by constructing with image_size=28 (tiny vision size)
    ours_proc = LVLMProcessor(cfg, HFTokenizerAdapter(hf_tok_plain), image_size=28)
    ours_proc.image_processor.min_size = 14
    ours = ours_proc([pil_images], [text])

    # HF adds no bos here (plain tokenizer); ours must agree via add_special_tokens
    np.testing.assert_array_equal(
        ours["input_ids"], hf_out["input_ids"].numpy(),
        err_msg=f"ours: {hf_tok_plain.decode(ours['input_ids'][0])!r} "
                f"hf: {hf_tok_plain.decode(hf_out['input_ids'][0])!r}",
    )
    np.testing.assert_array_equal(
        ours["attention_mask"], hf_out["attention_mask"].numpy()
    )

    # pixels: HF emits the valid region padded to the batch max; ours a fixed
    # square canvas with a patch mask — compare the valid region and the mask
    hf_px = hf_out["pixel_values"].numpy()          # [1,N,3,h,w]
    hf_pam = hf_out["pixel_attention_mask"].numpy() # [1,N,h,w]
    h, w = hf_px.shape[-2:]
    ours_px = ours["pixel_values"].transpose(0, 1, 4, 2, 3)[:, :, :, :h, :w]
    np.testing.assert_allclose(ours_px, hf_px, rtol=1e-5, atol=1e-5)
    # patch mask: valid iff any pixel in the 14px patch is valid (HF semantics)
    ps = 14
    for b in range(1):
        for i in range(n_images):
            for pr in range(ours["patch_mask"].shape[2]):
                for pc in range(ours["patch_mask"].shape[3]):
                    r0, c0 = pr * ps, pc * ps
                    hf_any = (
                        hf_pam[b, i, r0:r0 + ps, c0:c0 + ps].any()
                        if r0 < h and c0 < w else False
                    )
                    assert bool(ours["patch_mask"][b, i, pr, pc]) == bool(hf_any)


@pytest.fixture(scope="module")
def hf_tok_llava():
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["<unk>", "<s>", "</s>", "<pad>", "<image>"],
    )
    tok.train_from_iterator(
        ["User: describe this. Assistant: a red cat two"] * 30, trainer
    )
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>",
        pad_token="<pad>", additional_special_tokens=["<image>"],
    )


@pytest.mark.parametrize("style", ["interleave", "1.5"])
def test_llava_matches_hf_processor(hf_tok_llava, style):
    """llava: image-token expansion to the patch count and the tower-specific
    pixel pipelines — SigLIP square stretch (interleave) vs CLIP shortest-edge
    + center-crop (1.5) — match the HF LlavaProcessor."""
    from transformers.models.llava.processing_llava import LlavaProcessor

    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.processor import LVLMProcessor
    from mimic_tpu.models.tokenizer import HFTokenizerAdapter

    rng = np.random.default_rng(2)
    img = PIL.fromarray(rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8))
    text = "User: <image> describe this."

    if style == "interleave":
        from transformers.models.siglip.image_processing_siglip import (
            SiglipImageProcessor,
        )

        ip = SiglipImageProcessor(size={"height": 28, "width": 28})
        strategy = "full"
        cfg = get_model_config("tiny-llava-interleave")
        n_expected = 4  # (28/14)^2
    else:
        from transformers.models.clip.image_processing_clip import CLIPImageProcessor

        ip = CLIPImageProcessor(
            size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28}
        )
        strategy = "default"
        cfg = get_model_config("tiny-llava-interleave").replace(
            vision=get_model_config("tiny-llava-interleave").vision.__class__(
                **{**get_model_config("tiny-llava-interleave").vision.__dict__,
                   "use_class_token": True, "hidden_act": "quick_gelu"}
            )
        )
        n_expected = 4  # (28/14)^2, CLS dropped by "default" strategy

    hf_proc = LlavaProcessor(
        image_processor=ip, tokenizer=hf_tok_llava, patch_size=14,
        vision_feature_select_strategy=strategy, image_token="<image>",
        num_additional_image_tokens=1 if style == "1.5" else 0,
    )
    hf_out = hf_proc(text=[text], images=[img], return_tensors="pt", padding=True)

    ours = LVLMProcessor(cfg, HFTokenizerAdapter(hf_tok_llava), image_size=28)(
        [[img]], [text]
    )
    img_id = hf_tok_llava.convert_tokens_to_ids("<image>")
    assert int((hf_out["input_ids"] == img_id).sum()) == n_expected
    np.testing.assert_array_equal(ours["input_ids"], hf_out["input_ids"].numpy())
    np.testing.assert_array_equal(
        ours["attention_mask"], hf_out["attention_mask"].numpy()
    )
    # llava pixel_values: [1,3,H,W]
    np.testing.assert_allclose(
        ours["pixel_values"][:, 0].transpose(0, 3, 1, 2),
        hf_out["pixel_values"].numpy(), rtol=1e-5, atol=1e-5,
    )
