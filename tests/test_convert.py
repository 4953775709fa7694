"""Weight-conversion structure tests with synthetic HF-layout state dicts."""

import numpy as np
import pytest

import jax

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.convert import (
    _conv_to_dense,
    convert_idefics2,
    convert_llava_interleave,
)
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.vision import patchify


def synth_idefics2_sd(cfg):
    """Synthetic HF-layout state dict at tiny dims matching cfg."""
    t, v, p = cfg.text, cfg.vision, cfg.perceiver
    rng = np.random.default_rng(0)
    sd = {}
    r = lambda *s: rng.normal(size=s).astype(np.float32)
    D, H, Hkv, Dh, F = t.hidden_size, t.num_heads, t.num_kv_heads, t.head_size, t.intermediate_size
    sd["model.text_model.embed_tokens.weight"] = r(t.vocab_size, D)
    sd["lm_head.weight"] = r(t.vocab_size, D)
    for i in range(t.num_layers):
        pre = f"model.text_model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = r(D)
        sd[pre + "self_attn.q_proj.weight"] = r(H * Dh, D)
        sd[pre + "self_attn.k_proj.weight"] = r(Hkv * Dh, D)
        sd[pre + "self_attn.v_proj.weight"] = r(Hkv * Dh, D)
        sd[pre + "self_attn.o_proj.weight"] = r(D, H * Dh)
        sd[pre + "post_attention_layernorm.weight"] = r(D)
        sd[pre + "mlp.gate_proj.weight"] = r(F, D)
        sd[pre + "mlp.up_proj.weight"] = r(F, D)
        sd[pre + "mlp.down_proj.weight"] = r(D, F)
    sd["model.text_model.norm.weight"] = r(D)
    # vision
    Dv, Fv = v.hidden_size, v.intermediate_size
    sd["model.vision_model.embeddings.patch_embedding.weight"] = r(Dv, 3, v.patch_size, v.patch_size)
    sd["model.vision_model.embeddings.patch_embedding.bias"] = r(Dv)
    sd["model.vision_model.embeddings.position_embedding.weight"] = r(v.num_patches, Dv)
    for i in range(v.num_layers):
        pre = f"model.vision_model.encoder.layers.{i}."
        for nm, shape in (
            ("layer_norm1.weight", (Dv,)), ("layer_norm1.bias", (Dv,)),
            ("self_attn.q_proj.weight", (Dv, Dv)), ("self_attn.q_proj.bias", (Dv,)),
            ("self_attn.k_proj.weight", (Dv, Dv)), ("self_attn.k_proj.bias", (Dv,)),
            ("self_attn.v_proj.weight", (Dv, Dv)), ("self_attn.v_proj.bias", (Dv,)),
            ("self_attn.out_proj.weight", (Dv, Dv)), ("self_attn.out_proj.bias", (Dv,)),
            ("layer_norm2.weight", (Dv,)), ("layer_norm2.bias", (Dv,)),
            ("mlp.fc1.weight", (Fv, Dv)), ("mlp.fc1.bias", (Fv,)),
            ("mlp.fc2.weight", (Dv, Fv)), ("mlp.fc2.bias", (Dv,)),
        ):
            sd[pre + nm] = r(*shape)
    sd["model.vision_model.post_layernorm.weight"] = r(Dv)
    sd["model.vision_model.post_layernorm.bias"] = r(Dv)
    # connector
    width = D
    Hp = p.num_heads
    Hkvp = p.num_kv_heads or Hp
    Dhp = p.head_dim or width // Hp
    Fp = p.intermediate_size or 4 * width
    sd["model.connector.modality_projection.gate_proj.weight"] = r(Fp, Dv)
    sd["model.connector.modality_projection.up_proj.weight"] = r(Fp, Dv)
    sd["model.connector.modality_projection.down_proj.weight"] = r(D, Fp)
    pv = "model.connector.perceiver_resampler."
    sd[pv + "latents"] = r(p.num_latents, width)
    for i in range(p.num_layers):
        pre = pv + f"layers.{i}."
        sd[pre + "input_latents_norm.weight"] = r(width)
        sd[pre + "input_context_norm.weight"] = r(width)
        sd[pre + "self_attn.q_proj.weight"] = r(Hp * Dhp, width)
        sd[pre + "self_attn.k_proj.weight"] = r(Hkvp * Dhp, width)
        sd[pre + "self_attn.v_proj.weight"] = r(Hkvp * Dhp, width)
        sd[pre + "self_attn.o_proj.weight"] = r(width, Hp * Dhp)
        sd[pre + "post_attention_layernorm.weight"] = r(width)
        sd[pre + "mlp.gate_proj.weight"] = r(Fp, width)
        sd[pre + "mlp.up_proj.weight"] = r(Fp, width)
        sd[pre + "mlp.down_proj.weight"] = r(width, Fp)
    sd[pv + "norm.weight"] = r(width)
    return sd


class TestConvToDense:
    def test_matches_conv_semantics(self):
        """dense(patchify(x)) with the converted kernel == conv patch embedding."""
        rng = np.random.default_rng(0)
        p, C, D = 4, 3, 6
        w_conv = rng.normal(size=(D, C, p, p)).astype(np.float32)
        x = rng.normal(size=(1, 8, 8, C)).astype(np.float32)
        dense = _conv_to_dense(w_conv)
        got = patchify(x, p) @ dense  # [1, 4, D]
        # direct conv computation per patch
        want = np.zeros((1, 4, D), np.float32)
        idx = 0
        for pi in range(2):
            for pj in range(2):
                patch = x[0, pi * p : (pi + 1) * p, pj * p : (pj + 1) * p]  # [p,p,C]
                for d in range(D):
                    want[0, idx, d] = np.sum(patch * w_conv[d].transpose(1, 2, 0))
                idx += 1
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


class TestIdefics2Conversion:
    def test_structure_matches_init(self):
        cfg = get_model_config("tiny-idefics2")
        # perceiver intermediate for the synthetic dict must be consistent
        sd = synth_idefics2_sd(cfg)
        params = convert_idefics2(sd, cfg)
        template = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        t_shapes = jax.tree.map(lambda a: tuple(np.shape(a)), template)
        c_shapes = jax.tree.map(lambda a: tuple(np.shape(a)), params)
        assert t_shapes == c_shapes

    def test_transpose_applied(self):
        cfg = get_model_config("tiny-idefics2")
        sd = synth_idefics2_sd(cfg)
        params = convert_idefics2(sd, cfg)
        # q_proj torch [out,in] → ours [L,in,out]
        q0 = params["lm"]["decoder"]["layers"]["q_proj"][0]
        np.testing.assert_allclose(
            q0, sd["model.text_model.layers.0.self_attn.q_proj.weight"].T
        )
