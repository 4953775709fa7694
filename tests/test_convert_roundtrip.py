"""End-to-end checkpoint conversion flow: HF save_pretrained on disk →
``convert_checkpoint`` → ``factory.load_params`` → forward parity."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from mimic_tpu.models.config import ModelConfig, PerceiverConfig, TextConfig, VisionConfig
from mimic_tpu.models.convert import convert_checkpoint, load_torch_state_dict
from mimic_tpu.models.factory import load_params
from mimic_tpu.models.lvlm import LVLMBatch, lvlm_forward


def tiny_hf_idefics2():
    torch.manual_seed(0)
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2Config, Idefics2PerceiverConfig, Idefics2VisionConfig,
    )
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2ForConditionalGeneration,
    )
    from transformers.models.mistral.configuration_mistral import MistralConfig

    cfg_hf = Idefics2Config(
        text_config=MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-5,
            attn_implementation="eager",
        ),
        vision_config=Idefics2VisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            hidden_act="gelu_pytorch_tanh",
        ),
        perceiver_config=Idefics2PerceiverConfig(
            resampler_n_latents=4, resampler_depth=1, resampler_n_heads=2,
            resampler_head_dim=16, num_key_value_heads=1, hidden_act="silu",
        ),
        image_token_id=99, tie_word_embeddings=False,
    )
    cfg_hf._attn_implementation = "eager"
    return Idefics2ForConditionalGeneration(cfg_hf).eval().float()


OUR_CFG = ModelConfig(
    name="roundtrip", family="idefics2",
    text=TextConfig(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
                    num_kv_heads=2, intermediate_size=128, norm_eps=1e-5),
    vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
                        image_size=28, patch_size=14, use_class_token=False,
                        hidden_act="gelu_tanh"),
    perceiver=PerceiverConfig(num_latents=4, num_layers=1, num_heads=2, num_kv_heads=1,
                              head_dim=16, intermediate_size=128),
    image_token_id=99, pad_token_id=0, image_seq_len=4,
)


def test_disk_roundtrip(tmp_path, monkeypatch):
    model = tiny_hf_idefics2()
    hf_dir = str(tmp_path / "hf")
    model.save_pretrained(hf_dir, safe_serialization=True)
    assert any(f.endswith(".safetensors") for f in os.listdir(hf_dir))

    # the converter resolves architecture by model name; register the tiny config
    import mimic_tpu.models.config as C

    monkeypatch.setitem(C.MODEL_CONFIGS, "roundtrip", lambda: OUR_CFG)

    out = convert_checkpoint("roundtrip", hf_dir)
    assert out.endswith("params.msgpack") and os.path.exists(out)

    params = load_params(OUR_CFG, hf_dir, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, size=(1, 10)).astype(np.int32)
    ids[0, 2:6] = 99
    pixels = rng.normal(size=(1, 1, 28, 28, 3)).astype(np.float32)
    batch = LVLMBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 10), jnp.int32),
        pixel_values=jnp.asarray(pixels),
        pixel_mask=jnp.ones((1, 1), jnp.int32),
    )
    ours = np.asarray(lvlm_forward(params, OUR_CFG, batch).logits)

    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.ones((1, 10), dtype=torch.long),
            pixel_values=torch.tensor(pixels.transpose(0, 1, 4, 2, 3)),
            pixel_attention_mask=torch.ones((1, 1, 28, 28), dtype=torch.long),
        ).logits.numpy()
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_disk_roundtrip_bf16_checkpoint(tmp_path, monkeypatch):
    """Real checkpoints ship as (sharded) bf16 safetensors; the whole
    load → convert → save → load flow must survive ml_dtypes bfloat16 arrays."""
    model = tiny_hf_idefics2().to(torch.bfloat16)
    hf_dir = str(tmp_path / "hf16")
    model.save_pretrained(hf_dir, safe_serialization=True)

    import mimic_tpu.models.config as C

    monkeypatch.setitem(C.MODEL_CONFIGS, "roundtrip", lambda: OUR_CFG)
    out = convert_checkpoint("roundtrip", hf_dir)
    assert os.path.exists(out)

    params = load_params(OUR_CFG, hf_dir, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, size=(1, 10)).astype(np.int32)
    ids[0, 2:6] = 99
    pixels = rng.normal(size=(1, 1, 28, 28, 3)).astype(np.float32)
    batch = LVLMBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 10), jnp.int32),
        pixel_values=jnp.asarray(pixels),
        pixel_mask=jnp.ones((1, 1), jnp.int32),
    )
    ours = np.asarray(lvlm_forward(params, OUR_CFG, batch).logits)

    with torch.no_grad():
        hf_logits = model.float()(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.ones((1, 10), dtype=torch.long),
            pixel_values=torch.tensor(pixels.transpose(0, 1, 4, 2, 3)),
            pixel_attention_mask=torch.ones((1, 1, 28, 28), dtype=torch.long),
        ).logits.numpy()
    # bf16 storage costs precision; fp32 recompute differs at ~bf16 ulp scale
    np.testing.assert_allclose(ours, hf_logits, rtol=0.05, atol=0.05)


def test_sharded_checkpoint_loads(tmp_path, monkeypatch):
    """8B checkpoints ship sharded (model-0000X-of-0000N.safetensors + index);
    the loader must merge every shard."""
    model = tiny_hf_idefics2()
    hf_dir = str(tmp_path / "sharded")
    model.save_pretrained(hf_dir, safe_serialization=True, max_shard_size="200KB")
    shards = [f for f in os.listdir(hf_dir) if f.endswith(".safetensors")]
    assert len(shards) > 1, shards

    sd = load_torch_state_dict(hf_dir)
    assert "model.text_model.embed_tokens.weight" in sd or any(
        "embed_tokens" in k for k in sd
    )
    import mimic_tpu.models.config as C

    monkeypatch.setitem(C.MODEL_CONFIGS, "roundtrip", lambda: OUR_CFG)
    out = convert_checkpoint("roundtrip", hf_dir)
    assert os.path.exists(out)
