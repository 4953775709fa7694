"""Numerical parity against real HuggingFace implementations (tiny random-init
models, torch CPU): conversion + architecture must reproduce HF logits.

This validates end-to-end: patch embedding, position embeddings, ViT encoders,
perceiver resampler/connector, image-token splicing / cross-attention, RoPE,
GQA, qk-layernorms, decoupled embeddings — everything real-weight evaluation
depends on."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from mimic_tpu.models.config import ModelConfig, PerceiverConfig, TextConfig, VisionConfig
from mimic_tpu.models.convert import (
    convert_idefics1,
    convert_idefics2,
    convert_llava_interleave,
)
from mimic_tpu.models.lvlm import LVLMBatch, lvlm_forward

TOL = 2e-4


def run_ours(cfg, params, ids, attn, pixels_nhwc=None, patch_mask=None, img_attn=None):
    batch = LVLMBatch(
        input_ids=jnp.asarray(ids.astype(np.int32)),
        attention_mask=jnp.asarray(attn.astype(np.int32)),
        pixel_values=jnp.asarray(pixels_nhwc) if pixels_nhwc is not None else None,
        pixel_mask=(
            jnp.ones(pixels_nhwc.shape[:2], jnp.int32) if pixels_nhwc is not None else None
        ),
        patch_mask=jnp.asarray(patch_mask) if patch_mask is not None else None,
        image_attention_mask=jnp.asarray(img_attn) if img_attn is not None else None,
    )
    return np.asarray(lvlm_forward(jax.tree.map(jnp.asarray, params), cfg, batch).logits)


class TestIdefics2Parity:
    def test_logits_match_hf(self):
        torch.manual_seed(0)
        from transformers.models.idefics2.configuration_idefics2 import (
            Idefics2Config, Idefics2PerceiverConfig, Idefics2VisionConfig,
        )
        from transformers.models.idefics2.modeling_idefics2 import (
            Idefics2ForConditionalGeneration,
        )
        from transformers.models.mistral.configuration_mistral import MistralConfig

        text_cfg = MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-5,
            max_position_embeddings=512, attn_implementation="eager",
        )
        vis_cfg = Idefics2VisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            hidden_act="gelu_pytorch_tanh",
        )
        perc_cfg = Idefics2PerceiverConfig(
            resampler_n_latents=4, resampler_depth=1, resampler_n_heads=2,
            resampler_head_dim=16, num_key_value_heads=1, hidden_act="silu",
        )
        cfg_hf = Idefics2Config(
            text_config=text_cfg, vision_config=vis_cfg, perceiver_config=perc_cfg,
            image_token_id=99, tie_word_embeddings=False,
        )
        cfg_hf._attn_implementation = "eager"
        model = Idefics2ForConditionalGeneration(cfg_hf).eval().float()

        B, T, N = 1, 12, 1
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 90, size=(B, T)).astype(np.int64)
        ids[0, 2:6] = 99
        attn = np.ones((B, T), np.int64)
        pixels = rng.normal(size=(B, N, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
                pixel_values=torch.tensor(pixels),
                pixel_attention_mask=torch.ones((B, N, 28, 28), dtype=torch.long),
            ).logits.numpy()

        cfg = ModelConfig(
            name="parity", family="idefics2",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
                            num_kv_heads=2, intermediate_size=128, norm_eps=1e-5),
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=28, patch_size=14,
                                use_class_token=False, hidden_act="gelu_tanh"),
            perceiver=PerceiverConfig(num_latents=4, num_layers=1, num_heads=2,
                                      num_kv_heads=1, head_dim=16,
                                      intermediate_size=128),
            image_token_id=99, pad_token_id=0, image_seq_len=4,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_idefics2(sd, cfg)
        ours = run_ours(
            cfg, params, ids, attn,
            pixels.transpose(0, 1, 3, 4, 2),
            patch_mask=np.ones((B, N, 2, 2), np.int32),
        )
        np.testing.assert_allclose(ours, hf_logits, rtol=TOL, atol=TOL)


class TestLlavaParity:
    def test_logits_match_hf(self):
        torch.manual_seed(0)
        from transformers import LlavaConfig, LlavaForConditionalGeneration
        from transformers.models.qwen2 import Qwen2Config
        from transformers.models.siglip import SiglipVisionConfig

        text_cfg = Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-6,
            attn_implementation="eager",
        )
        vis_cfg = SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=28, patch_size=14,
            hidden_act="gelu_pytorch_tanh",
        )
        cfg_hf = LlavaConfig(
            vision_config=vis_cfg, text_config=text_cfg, image_token_index=99,
            vision_feature_layer=-2, vision_feature_select_strategy="full",
            projector_hidden_act="gelu",
        )
        cfg_hf._attn_implementation = "eager"
        model = LlavaForConditionalGeneration(cfg_hf).eval().float()

        B, T = 1, 12
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 90, size=(B, T)).astype(np.int64)
        ids[0, 2:6] = 99
        attn = np.ones((B, T), np.int64)
        pixels = rng.normal(size=(B, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
                pixel_values=torch.tensor(pixels),
            ).logits.numpy()

        cfg = ModelConfig(
            name="parity", family="llava-interleave",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
                            num_kv_heads=2, intermediate_size=128, norm_eps=1e-6,
                            attn_bias=True),
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=28, patch_size=14,
                                use_class_token=False, hidden_act="gelu_tanh",
                                post_layernorm=False),
            image_token_id=99, pad_token_id=0, image_seq_len=4,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_llava_interleave(sd, cfg)
        ours = run_ours(cfg, params, ids, attn, pixels.transpose(0, 2, 3, 1)[:, None])
        np.testing.assert_allclose(ours, hf_logits, rtol=TOL, atol=TOL)


class TestIdefics1Parity:
    def test_logits_match_hf(self):
        torch.manual_seed(0)
        from transformers.models.idefics.configuration_idefics import (
            IdeficsConfig, IdeficsPerceiverConfig, IdeficsVisionConfig,
        )
        from transformers.models.idefics.modeling_idefics import (
            IdeficsForVisionText2Text,
        )

        cfg_hf = IdeficsConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, rms_norm_eps=1e-6,
            cross_layer_interval=2, qk_layer_norms=True, use_resampler=True,
            tie_word_embeddings=False,
            additional_vocab_size=0, freeze_text_layers=False,
            vision_config=IdeficsVisionConfig(
                embed_dim=32, image_size=28, patch_size=14, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
            ),
            perceiver_config=IdeficsPerceiverConfig(
                resampler_n_latents=4, resampler_depth=2, resampler_n_heads=2,
                resampler_head_dim=16, qk_layer_norms_perceiver=True,
            ),
            attn_implementation="eager",
        )
        cfg_hf._attn_implementation = "eager"
        model = IdeficsForVisionText2Text(cfg_hf).eval().float()

        B, T, N = 1, 10, 1
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 120, size=(B, T)).astype(np.int64)
        attn = np.ones((B, T), np.int64)
        pixels = rng.normal(size=(B, N, 3, 28, 28)).astype(np.float32)
        img_attn = np.zeros((B, T, N), np.int64)
        img_attn[:, 3:, 0] = 1  # tokens from position 3 attend to image 0
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
                pixel_values=torch.tensor(pixels),
                image_attention_mask=torch.tensor(img_attn),
            ).logits.numpy()

        cfg = ModelConfig(
            name="parity", family="idefics1",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=4, num_heads=4,
                            num_kv_heads=4, intermediate_size=128, norm_eps=1e-6,
                            cross_qk_layernorm=True, cross_attn_interval=2, cross_kv_dim=32),
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=28, patch_size=14,
                                use_class_token=True, hidden_act="quick_gelu",
                                norm_eps=1e-5),
            perceiver=PerceiverConfig(num_latents=4, num_layers=2, num_heads=2,
                                      head_dim=16, style="idefics1",
                                      qk_layernorm=True),
            image_token_id=-1, pad_token_id=0, image_seq_len=0,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_idefics1(sd, cfg)
        ours = run_ours(
            cfg, params, ids, attn, pixels.transpose(0, 1, 3, 4, 2),
            img_attn=img_attn,
        )
        np.testing.assert_allclose(ours, hf_logits, rtol=TOL, atol=TOL)


class TestGenerationParity:
    """greedy/beam token parity vs HF ``generate`` on the tiny idefics2 oracle.

    Sequences are compared up to and including the first EOS (HF pads finished
    beams with its own filler convention; decode strips special tokens anyway).
    """

    def _until_eos(self, row, eos):
        out = []
        for t in row:
            out.append(int(t))
            if t == eos:
                break
        return out

    def test_greedy_and_beam_match_hf(self):
        torch.manual_seed(0)
        from transformers.models.idefics2.configuration_idefics2 import (
            Idefics2Config, Idefics2PerceiverConfig, Idefics2VisionConfig,
        )
        from transformers.models.idefics2.modeling_idefics2 import (
            Idefics2ForConditionalGeneration,
        )
        from transformers.models.mistral.configuration_mistral import MistralConfig

        text_cfg = MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-5,
            max_position_embeddings=512, attn_implementation="eager",
        )
        vis_cfg = Idefics2VisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            hidden_act="gelu_pytorch_tanh",
        )
        perc_cfg = Idefics2PerceiverConfig(
            resampler_n_latents=4, resampler_depth=1, resampler_n_heads=2,
            resampler_head_dim=16, num_key_value_heads=1, hidden_act="silu",
        )
        cfg_hf = Idefics2Config(
            text_config=text_cfg, vision_config=vis_cfg, perceiver_config=perc_cfg,
            image_token_id=99, tie_word_embeddings=False,
        )
        cfg_hf._attn_implementation = "eager"
        model = Idefics2ForConditionalGeneration(cfg_hf).eval().float()

        B, T, N = 2, 12, 1
        rng = np.random.default_rng(5)
        ids = rng.integers(1, 90, size=(B, T)).astype(np.int64)
        ids[:, 2:6] = 99
        attn = np.ones((B, T), np.int64)
        pixels = rng.normal(size=(B, N, 3, 28, 28)).astype(np.float32)

        gen_common = dict(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
            pixel_values=torch.tensor(pixels),
            pixel_attention_mask=torch.ones((B, N, 28, 28), dtype=torch.long),
            max_new_tokens=6, do_sample=False, pad_token_id=0, eos_token_id=2,
            bos_token_id=1,
        )
        with torch.no_grad():
            hf_greedy = model.generate(**gen_common)[:, T:].numpy()
            hf_beam = model.generate(
                **gen_common, num_beams=3, length_penalty=0.0, early_stopping=False
            )[:, T:].numpy()
            hf_beam_lp = model.generate(
                **gen_common, num_beams=3, length_penalty=1.0, early_stopping=False
            )[:, T:].numpy()

        from mimic_tpu.models.generate import beam_generate, greedy_generate

        cfg = ModelConfig(
            name="p", family="idefics2",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
                            num_kv_heads=2, intermediate_size=128, norm_eps=1e-5),
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=28, patch_size=14,
                                use_class_token=False, hidden_act="gelu_tanh"),
            perceiver=PerceiverConfig(num_latents=4, num_layers=1, num_heads=2,
                                      num_kv_heads=1, head_dim=16,
                                      intermediate_size=128),
            image_token_id=99, pad_token_id=0, eos_token_id=2, image_seq_len=4,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = jax.tree.map(jnp.asarray, convert_idefics2(sd, cfg))
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(attn.astype(np.int32)),
            pixel_values=jnp.asarray(pixels.transpose(0, 1, 3, 4, 2)),
            pixel_mask=jnp.ones((B, N), jnp.int32),
            patch_mask=jnp.ones((B, N, 2, 2), jnp.int32),
        )
        ours_g = np.asarray(greedy_generate(params, cfg, batch, 6, 2, 0).tokens)
        np.testing.assert_array_equal(ours_g, hf_greedy)

        ours_b = np.asarray(
            beam_generate(params, cfg, batch, 6, 3, 2, 0, length_penalty=0.0).tokens
        )
        for row_ours, row_hf in zip(ours_b, hf_beam):
            assert self._until_eos(row_ours, 2) == self._until_eos(row_hf, 2)

        # nonzero penalty exercises the penalized-ranking path (HF score/len^lp)
        ours_lp = np.asarray(
            beam_generate(params, cfg, batch, 6, 3, 2, 0, length_penalty=1.0).tokens
        )
        for row_ours, row_hf in zip(ours_lp, hf_beam_lp):
            assert self._until_eos(row_ours, 2) == self._until_eos(row_hf, 2)

    def test_llava_greedy_and_beam_match_hf(self):
        torch.manual_seed(0)
        from transformers import LlavaConfig, LlavaForConditionalGeneration
        from transformers.models.qwen2 import Qwen2Config
        from transformers.models.siglip import SiglipVisionConfig

        cfg_hf = LlavaConfig(
            vision_config=SiglipVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                num_attention_heads=2, image_size=28, patch_size=14,
                hidden_act="gelu_pytorch_tanh",
            ),
            text_config=Qwen2Config(
                vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                rms_norm_eps=1e-6, attn_implementation="eager",
            ),
            image_token_index=99, vision_feature_layer=-2,
            vision_feature_select_strategy="full", projector_hidden_act="gelu",
        )
        cfg_hf._attn_implementation = "eager"
        model = LlavaForConditionalGeneration(cfg_hf).eval().float()

        B, T = 2, 12
        rng = np.random.default_rng(7)
        ids = rng.integers(1, 90, size=(B, T)).astype(np.int64)
        ids[:, 2:6] = 99
        attn = np.ones((B, T), np.int64)
        pixels = rng.normal(size=(B, 3, 28, 28)).astype(np.float32)

        gen_common = dict(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
            pixel_values=torch.tensor(pixels),
            max_new_tokens=6, do_sample=False, pad_token_id=0, eos_token_id=2,
            bos_token_id=1,
        )
        with torch.no_grad():
            hf_greedy = model.generate(**gen_common)[:, T:].numpy()
            hf_beam = model.generate(
                **gen_common, num_beams=3, length_penalty=0.0, early_stopping=False
            )[:, T:].numpy()

        from mimic_tpu.models.generate import beam_generate, greedy_generate

        cfg = ModelConfig(
            name="p", family="llava-interleave",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
                            num_kv_heads=2, intermediate_size=128, norm_eps=1e-6,
                            attn_bias=True),
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=28, patch_size=14,
                                use_class_token=False, hidden_act="gelu_tanh",
                                post_layernorm=False),
            image_token_id=99, pad_token_id=0, eos_token_id=2, image_seq_len=4,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = jax.tree.map(jnp.asarray, convert_llava_interleave(sd, cfg))
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(attn.astype(np.int32)),
            pixel_values=jnp.asarray(pixels.transpose(0, 2, 3, 1)[:, None]),
            pixel_mask=jnp.ones((B, 1), jnp.int32),
        )
        ours_g = np.asarray(greedy_generate(params, cfg, batch, 6, 2, 0).tokens)
        np.testing.assert_array_equal(ours_g, hf_greedy)
        ours_b = np.asarray(
            beam_generate(params, cfg, batch, 6, 3, 2, 0, length_penalty=0.0).tokens
        )
        for row_ours, row_hf in zip(ours_b, hf_beam):
            assert self._until_eos(row_ours, 2) == self._until_eos(row_hf, 2)

    def test_idefics1_greedy_and_beam_match_hf(self):
        torch.manual_seed(0)
        from transformers.models.idefics.configuration_idefics import (
            IdeficsConfig, IdeficsPerceiverConfig, IdeficsVisionConfig,
        )
        from transformers.models.idefics.modeling_idefics import (
            IdeficsForVisionText2Text,
        )

        cfg_hf = IdeficsConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, rms_norm_eps=1e-6,
            cross_layer_interval=2, qk_layer_norms=True, use_resampler=True,
            tie_word_embeddings=False,
            additional_vocab_size=0, freeze_text_layers=False,
            vision_config=IdeficsVisionConfig(
                embed_dim=32, image_size=28, patch_size=14, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
            ),
            perceiver_config=IdeficsPerceiverConfig(
                resampler_n_latents=4, resampler_depth=2, resampler_n_heads=2,
                resampler_head_dim=16, qk_layer_norms_perceiver=True,
            ),
            attn_implementation="eager",
        )
        cfg_hf._attn_implementation = "eager"
        model = IdeficsForVisionText2Text(cfg_hf).eval().float()

        B, T, N = 2, 10, 1
        rng = np.random.default_rng(9)
        ids = rng.integers(3, 120, size=(B, T)).astype(np.int64)
        attn = np.ones((B, T), np.int64)
        pixels = rng.normal(size=(B, N, 3, 28, 28)).astype(np.float32)
        img_attn = np.zeros((B, T, N), np.int64)
        img_attn[:, 3:, 0] = 1

        gen_common = dict(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
            pixel_values=torch.tensor(pixels),
            image_attention_mask=torch.tensor(img_attn),
            max_new_tokens=6, do_sample=False, pad_token_id=0, eos_token_id=2,
            bos_token_id=1,
        )
        with torch.no_grad():
            hf_greedy = model.generate(**gen_common)[:, T:].numpy()
            hf_beam = model.generate(
                **gen_common, num_beams=3, length_penalty=0.0, early_stopping=False
            )[:, T:].numpy()

        from mimic_tpu.models.generate import beam_generate, greedy_generate

        cfg = ModelConfig(
            name="p", family="idefics1",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=4, num_heads=4,
                            num_kv_heads=4, intermediate_size=128, norm_eps=1e-6,
                            cross_qk_layernorm=True, cross_attn_interval=2,
                            cross_kv_dim=32),
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=28, patch_size=14,
                                use_class_token=True, hidden_act="quick_gelu",
                                norm_eps=1e-5),
            perceiver=PerceiverConfig(num_latents=4, num_layers=2, num_heads=2,
                                      head_dim=16, style="idefics1",
                                      qk_layernorm=True),
            image_token_id=-1, pad_token_id=0, eos_token_id=2, image_seq_len=0,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = jax.tree.map(jnp.asarray, convert_idefics1(sd, cfg))
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(attn.astype(np.int32)),
            pixel_values=jnp.asarray(pixels.transpose(0, 1, 3, 4, 2)),
            pixel_mask=jnp.ones((B, N), jnp.int32),
            image_attention_mask=jnp.asarray(img_attn.astype(np.int32)),
        )
        ours_g = np.asarray(greedy_generate(params, cfg, batch, 6, 2, 0).tokens)
        np.testing.assert_array_equal(ours_g, hf_greedy)
        ours_b = np.asarray(
            beam_generate(params, cfg, batch, 6, 3, 2, 0, length_penalty=0.0).tokens
        )
        for row_ours, row_hf in zip(ours_b, hf_beam):
            assert self._until_eos(row_ours, 2) == self._until_eos(row_hf, 2)


class TestLlava15Parity:
    """llava-1.5 flavor: CLIP tower (class token, quick_gelu, pre-layernorm) with
    vision_feature_select_strategy="default" (CLS dropped before the projector)."""

    def test_logits_match_hf(self):
        torch.manual_seed(0)
        from transformers import LlavaConfig, LlavaForConditionalGeneration
        from transformers.models.clip import CLIPVisionConfig
        from transformers.models.llama import LlamaConfig

        cfg_hf = LlavaConfig(
            vision_config=CLIPVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                num_attention_heads=2, image_size=28, patch_size=14,
                hidden_act="quick_gelu",
            ),
            text_config=LlamaConfig(
                vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
                rms_norm_eps=1e-5, attn_implementation="eager",
                attention_bias=False,
            ),
            image_token_index=99, vision_feature_layer=-2,
            vision_feature_select_strategy="default", projector_hidden_act="gelu",
        )
        cfg_hf._attn_implementation = "eager"
        model = LlavaForConditionalGeneration(cfg_hf).eval().float()

        B, T = 1, 12
        rng = np.random.default_rng(3)
        ids = rng.integers(1, 90, size=(B, T)).astype(np.int64)
        ids[0, 2:6] = 99  # 4 image slots = (28/14)^2 patches, CLS dropped
        attn = np.ones((B, T), np.int64)
        pixels = rng.normal(size=(B, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
                pixel_values=torch.tensor(pixels),
            ).logits.numpy()

        cfg = ModelConfig(
            name="parity", family="llava-interleave",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
                            num_kv_heads=4, intermediate_size=128, norm_eps=1e-5,
                            attn_bias=False),
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=28, patch_size=14,
                                use_class_token=True, hidden_act="quick_gelu",
                                norm_eps=1e-5, post_layernorm=False),
            image_token_id=99, pad_token_id=0, image_seq_len=4,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_llava_interleave(sd, cfg)
        ours = run_ours(cfg, params, ids, attn, pixels.transpose(0, 2, 3, 1)[:, None])
        np.testing.assert_allclose(ours, hf_logits, rtol=TOL, atol=TOL)


class TestTextOnlyParity:
    """Text-only towers (the reference's mistral/qwen2 testbed wrappers)."""

    def _check(self, hf_model, cfg):
        from mimic_tpu.models.convert import convert_text

        B, T = 2, 10
        rng = np.random.default_rng(4)
        ids = rng.integers(1, 120, size=(B, T)).astype(np.int64)
        attn = np.ones((B, T), np.int64)
        with torch.no_grad():
            hf_logits = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn)
            ).logits.numpy()
        sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
        params = convert_text(sd, cfg)
        ours = run_ours(cfg, params, ids, attn)
        np.testing.assert_allclose(ours, hf_logits, rtol=TOL, atol=TOL)

    def test_mistral_logits_match_hf(self):
        torch.manual_seed(0)
        from transformers.models.mistral import MistralConfig, MistralForCausalLM

        model = MistralForCausalLM(MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, attn_implementation="eager",
            tie_word_embeddings=False,
        )).eval().float()
        cfg = ModelConfig(
            name="p", family="text",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, intermediate_size=128,
                            norm_eps=1e-5),
            image_token_id=-1, pad_token_id=0,
        )
        self._check(model, cfg)

    def test_qwen2_logits_match_hf(self):
        torch.manual_seed(0)
        from transformers.models.qwen2 import Qwen2Config, Qwen2ForCausalLM

        model = Qwen2ForCausalLM(Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, attn_implementation="eager",
            tie_word_embeddings=False,
        )).eval().float()
        cfg = ModelConfig(
            name="p", family="text",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, intermediate_size=128,
                            norm_eps=1e-6, attn_bias=True),
            image_token_id=-1, pad_token_id=0,
        )
        self._check(model, cfg)


class TestSlidingWindowParity:
    """Mistral sliding-window attention vs HF (reference llava/mistral paths
    pass config.sliding_window into SDPA, src/shift_encoder.py:514-523)."""

    def test_mistral_sliding_window_logits_match_hf(self):
        torch.manual_seed(0)
        from transformers.models.mistral import MistralConfig, MistralForCausalLM

        from mimic_tpu.models.convert import convert_text

        W, B, T = 4, 2, 12
        mk = lambda window: MistralForCausalLM(MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, attn_implementation="eager",
            tie_word_embeddings=False, sliding_window=window,
        )).eval().float()
        torch.manual_seed(0)
        model = mk(W)
        torch.manual_seed(0)
        model_nw = mk(None)  # same weights, no window — oracle sanity check

        rng = np.random.default_rng(7)
        ids = rng.integers(1, 120, size=(B, T)).astype(np.int64)
        attn = np.ones((B, T), np.int64)
        with torch.no_grad():
            hf = model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn)
            ).logits.numpy()
            hf_nw = model_nw(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn)
            ).logits.numpy()
        # the window must actually bite at T > W, else this test proves nothing
        assert not np.allclose(hf, hf_nw, atol=1e-5)

        cfg = ModelConfig(
            name="p", family="text",
            text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, intermediate_size=128,
                            norm_eps=1e-5, sliding_window=W),
            image_token_id=-1, pad_token_id=0,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_text(sd, cfg)
        ours = run_ours(cfg, params, ids, attn)
        np.testing.assert_allclose(ours, hf, rtol=TOL, atol=TOL)
