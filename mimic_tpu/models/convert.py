"""PyTorch → JAX weight conversion for the three LVLM families.

Reads a local HF checkpoint directory (safetensors preferred, torch .bin
fallback) and emits this framework's stacked-parameter pytree, saved as
``params.msgpack`` next to the source weights (consumed by ``factory.load_params``).

Layout notes:

- torch ``nn.Linear.weight`` is ``[out, in]``; our kernels are ``[in, out]`` → transpose.
- per-layer weights are stacked along a leading ``[L]`` axis (decoder scan).
- conv patch-embeddings ``[D, C, p, p]`` become dense kernels ``[p*p*C, D]``
  matching ``vision.patchify``'s ``[p, p, C]`` row-major flattening.
- IDEFICS-1's decoupled embeddings (base + additional trainable rows) are merged
  into one embedding/lm-head matrix.

Run: ``python -m mimic_tpu.models.convert <model_name> <hf_checkpoint_dir>``.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

from .config import ModelConfig, get_model_config

StateDict = Dict[str, np.ndarray]


def load_torch_state_dict(path: str) -> StateDict:
    """Load all weights from a HF checkpoint dir into numpy arrays."""
    state: StateDict = {}
    st_files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            state.update(load_file(os.path.join(path, f)))
        return state
    bin_files = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
    if not bin_files:
        raise FileNotFoundError(f"No safetensors/bin weights under {path}")
    import torch

    for f in bin_files:
        sd = torch.load(os.path.join(path, f), map_location="cpu", weights_only=True)
        state.update({k: v.float().numpy() for k, v in sd.items()})
    return state


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _stack(sd: StateDict, pattern: str, n: int, transform: Callable = _t) -> np.ndarray:
    return np.stack([transform(sd[pattern.format(i=i)]) for i in range(n)])


def _conv_to_dense(w: np.ndarray) -> np.ndarray:
    """[D, C, p, p] conv kernel → [p*p*C, D] dense kernel for patchify order."""
    d, c, ph, pw = w.shape
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(ph * pw * c, d))


def _identity(w: np.ndarray) -> np.ndarray:
    return np.asarray(w)


def convert_decoder(sd: StateDict, prefix: str, cfg, attn_bias: bool) -> Dict:
    L = cfg.num_layers
    layers = {
        "input_ln": _stack(sd, prefix + "layers.{i}.input_layernorm.weight", L, _identity),
        "q_proj": _stack(sd, prefix + "layers.{i}.self_attn.q_proj.weight", L),
        "k_proj": _stack(sd, prefix + "layers.{i}.self_attn.k_proj.weight", L),
        "v_proj": _stack(sd, prefix + "layers.{i}.self_attn.v_proj.weight", L),
        "o_proj": _stack(sd, prefix + "layers.{i}.self_attn.o_proj.weight", L),
        "post_ln": _stack(
            sd, prefix + "layers.{i}.post_attention_layernorm.weight", L, _identity
        ),
        "gate_proj": _stack(sd, prefix + "layers.{i}.mlp.gate_proj.weight", L),
        "up_proj": _stack(sd, prefix + "layers.{i}.mlp.up_proj.weight", L),
        "down_proj": _stack(sd, prefix + "layers.{i}.mlp.down_proj.weight", L),
    }
    if attn_bias:
        layers["q_bias"] = _stack(sd, prefix + "layers.{i}.self_attn.q_proj.bias", L, _identity)
        layers["k_bias"] = _stack(sd, prefix + "layers.{i}.self_attn.k_proj.bias", L, _identity)
        layers["v_bias"] = _stack(sd, prefix + "layers.{i}.self_attn.v_proj.bias", L, _identity)
    if cfg.qk_layernorm:
        layers["q_ln"] = _stack(
            sd, prefix + "layers.{i}.self_attn.q_layer_norm.weight", L, _identity
        )
        layers["k_ln"] = _stack(
            sd, prefix + "layers.{i}.self_attn.k_layer_norm.weight", L, _identity
        )
    return {"layers": layers, "final_ln": np.asarray(sd[prefix + "norm.weight"])}


def convert_vit(sd: StateDict, prefix: str, vcfg, post_layernorm: bool = True) -> Dict:
    L = vcfg.num_layers
    p: Dict = {
        "patch_embed": {
            "kernel": _conv_to_dense(sd[prefix + "embeddings.patch_embedding.weight"]),
            # CLIP-style towers (idefics1) have no patch-conv bias
            "bias": np.asarray(
                sd.get(
                    prefix + "embeddings.patch_embedding.bias",
                    np.zeros(vcfg.hidden_size, np.float32),
                )
            ),
        },
        "pos_embed": np.asarray(sd[prefix + "embeddings.position_embedding.weight"]),
        "layers": {
            "ln1_w": _stack(sd, prefix + "encoder.layers.{i}.layer_norm1.weight", L, _identity),
            "ln1_b": _stack(sd, prefix + "encoder.layers.{i}.layer_norm1.bias", L, _identity),
            "q_proj": _stack(sd, prefix + "encoder.layers.{i}.self_attn.q_proj.weight", L),
            "q_bias": _stack(sd, prefix + "encoder.layers.{i}.self_attn.q_proj.bias", L, _identity),
            "k_proj": _stack(sd, prefix + "encoder.layers.{i}.self_attn.k_proj.weight", L),
            "k_bias": _stack(sd, prefix + "encoder.layers.{i}.self_attn.k_proj.bias", L, _identity),
            "v_proj": _stack(sd, prefix + "encoder.layers.{i}.self_attn.v_proj.weight", L),
            "v_bias": _stack(sd, prefix + "encoder.layers.{i}.self_attn.v_proj.bias", L, _identity),
            "o_proj": _stack(sd, prefix + "encoder.layers.{i}.self_attn.out_proj.weight", L),
            "o_bias": _stack(sd, prefix + "encoder.layers.{i}.self_attn.out_proj.bias", L, _identity),
            "ln2_w": _stack(sd, prefix + "encoder.layers.{i}.layer_norm2.weight", L, _identity),
            "ln2_b": _stack(sd, prefix + "encoder.layers.{i}.layer_norm2.bias", L, _identity),
            "fc1": _stack(sd, prefix + "encoder.layers.{i}.mlp.fc1.weight", L),
            "fc1_bias": _stack(sd, prefix + "encoder.layers.{i}.mlp.fc1.bias", L, _identity),
            "fc2": _stack(sd, prefix + "encoder.layers.{i}.mlp.fc2.weight", L),
            "fc2_bias": _stack(sd, prefix + "encoder.layers.{i}.mlp.fc2.bias", L, _identity),
        },
        # llava takes vision_feature_layer=-2: features leave the tower BEFORE
        # the final norm, so the converted post-layernorm becomes identity
        "post_ln_w": (
            np.asarray(sd[prefix + "post_layernorm.weight"])
            if post_layernorm
            else np.ones(vcfg.hidden_size, np.float32)
        ),
        "post_ln_b": (
            np.asarray(sd[prefix + "post_layernorm.bias"])
            if post_layernorm
            else np.zeros(vcfg.hidden_size, np.float32)
        ),
    }
    if vcfg.use_class_token:
        p["class_embed"] = np.asarray(sd[prefix + "embeddings.class_embedding"]).reshape(-1)
        p["pre_ln_w"] = np.asarray(sd[prefix + "pre_layrnorm.weight"])  # HF CLIP typo
        p["pre_ln_b"] = np.asarray(sd[prefix + "pre_layrnorm.bias"])
    return p


def convert_idefics2(sd: StateDict, cfg: ModelConfig) -> Dict:
    text = cfg.text
    lm = convert_decoder(sd, "model.text_model.", text, attn_bias=False)
    params = {
        "lm": {
            "embed": np.asarray(sd["model.text_model.embed_tokens.weight"]),
            "decoder": lm,
            "lm_head": _t(sd["lm_head.weight"]),
        },
        "vision": convert_vit(sd, "model.vision_model.", cfg.vision),
        "connector": _convert_idefics2_connector(sd, cfg),
    }
    return params


def _convert_idefics2_connector(sd: StateDict, cfg: ModelConfig) -> Dict:
    pc = cfg.perceiver
    L = pc.num_layers
    pre = "model.connector.perceiver_resampler."
    return {
        "latents": np.asarray(sd[pre + "latents"]),
        "modality_proj": {
            "gate": _t(sd["model.connector.modality_projection.gate_proj.weight"]),
            "up": _t(sd["model.connector.modality_projection.up_proj.weight"]),
            "down": _t(sd["model.connector.modality_projection.down_proj.weight"]),
        },
        "layers": {
            "ln_latents": _stack(sd, pre + "layers.{i}.input_latents_norm.weight", L, _identity),
            "ln_context": _stack(sd, pre + "layers.{i}.input_context_norm.weight", L, _identity),
            "q_proj": _stack(sd, pre + "layers.{i}.self_attn.q_proj.weight", L),
            "k_proj": _stack(sd, pre + "layers.{i}.self_attn.k_proj.weight", L),
            "v_proj": _stack(sd, pre + "layers.{i}.self_attn.v_proj.weight", L),
            "o_proj": _stack(sd, pre + "layers.{i}.self_attn.o_proj.weight", L),
            "post_ln": _stack(sd, pre + "layers.{i}.post_attention_layernorm.weight", L, _identity),
            "gate_proj": _stack(sd, pre + "layers.{i}.mlp.gate_proj.weight", L),
            "up_proj": _stack(sd, pre + "layers.{i}.mlp.up_proj.weight", L),
            "down_proj": _stack(sd, pre + "layers.{i}.mlp.down_proj.weight", L),
        },
        "final_ln": np.asarray(sd[pre + "norm.weight"]),
    }


def _normalize_llava_keys(sd: StateDict) -> StateDict:
    """Map the newer transformers layout (model.language_model.*) onto the
    released-checkpoint layout (language_model.model.*) this converter targets."""
    if "model.language_model.embed_tokens.weight" not in sd:
        return sd
    out = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            k = "language_model.model." + k[len("model.language_model."):]
        elif k.startswith("model.vision_tower."):
            k = "vision_tower." + k[len("model.vision_tower."):]
        elif k.startswith("model.multi_modal_projector."):
            k = "multi_modal_projector." + k[len("model.multi_modal_projector."):]
        out[k] = v
    if "lm_head.weight" in sd:
        out["language_model.lm_head.weight"] = sd["lm_head.weight"]
    return out


def convert_llava_interleave(sd: StateDict, cfg: ModelConfig) -> Dict:
    sd = _normalize_llava_keys(sd)
    # llava-interleave (Qwen2 text tower) has qkv biases; llava-1.5 (llama) doesn't
    lm = convert_decoder(sd, "language_model.model.", cfg.text, attn_bias=cfg.text.attn_bias)
    return {
        "lm": {
            "embed": np.asarray(sd["language_model.model.embed_tokens.weight"]),
            "decoder": lm,
            "lm_head": _t(sd["language_model.lm_head.weight"]),
        },
        "vision": convert_vit(sd, "vision_tower.vision_model.", cfg.vision, post_layernorm=False),
        "projector": {
            "fc1": _t(sd["multi_modal_projector.linear_1.weight"]),
            "fc1_bias": np.asarray(sd["multi_modal_projector.linear_1.bias"]),
            "fc2": _t(sd["multi_modal_projector.linear_2.weight"]),
            "fc2_bias": np.asarray(sd["multi_modal_projector.linear_2.bias"]),
        },
    }


def convert_idefics1(sd: StateDict, cfg: ModelConfig) -> Dict:
    """IDEFICS-1: merges DecoupledEmbedding/DecoupledLinear extra rows."""
    text = cfg.text
    lm = convert_decoder(sd, "model.", text, attn_bias=False)
    embed = np.asarray(sd["model.embed_tokens.weight"])
    if "model.embed_tokens.additional_embedding.weight" in sd:
        embed = np.concatenate(
            [embed, np.asarray(sd["model.embed_tokens.additional_embedding.weight"])], 0
        )
    head = _t(sd["lm_head.weight"])
    if "lm_head.additional_fc.weight" in sd:
        head = np.concatenate([head, _t(sd["lm_head.additional_fc.weight"])], 1)

    G = text.num_cross_layers
    pre = "model.gated_cross_attn_layers.{i}."
    cross = {
        "input_ln": _stack(sd, pre + "input_layernorm.weight", G, _identity),
        "q_proj": _stack(sd, pre + "cross_attn.q_proj.weight", G),
        "k_proj": _stack(sd, pre + "cross_attn.k_proj.weight", G),
        "v_proj": _stack(sd, pre + "cross_attn.v_proj.weight", G),
        "o_proj": _stack(sd, pre + "cross_attn.o_proj.weight", G),
        "post_ln": _stack(sd, pre + "post_attention_layernorm.weight", G, _identity),
        "gate_proj": _stack(sd, pre + "mlp.gate_proj.weight", G),
        "up_proj": _stack(sd, pre + "mlp.up_proj.weight", G),
        "down_proj": _stack(sd, pre + "mlp.down_proj.weight", G),
        "alpha_attn": _stack(sd, pre + "alpha_cross_attn", G, lambda w: np.asarray(w).reshape(())),
        "alpha_dense": _stack(sd, pre + "alpha_dense", G, lambda w: np.asarray(w).reshape(())),
    }
    if text.cross_qk_layernorm:
        cross["q_ln"] = _stack(sd, pre + "cross_attn.q_layer_norm.weight", G, _identity)
        cross["k_ln"] = _stack(sd, pre + "cross_attn.k_layer_norm.weight", G, _identity)
    lm["cross"] = cross

    # HF IdeficsPerceiverResampler layout (verified against transformers
    # idefics/perceiver.py): blocks.{i}.0 = attention (context/latents layer norms,
    # q/k/v/output_proj, optional qk layer norms), blocks.{i}.1 = ReLU MLP
    # (ln, fc, c_proj), plus a final layer_norm.
    pv = "model.perceiver_resampler."
    pc = cfg.perceiver
    L = pc.num_layers
    layers = {
        "ln_context_w": _stack(sd, pv + "blocks.{i}.0.context_layer_norm.weight", L, _identity),
        "ln_context_b": _stack(sd, pv + "blocks.{i}.0.context_layer_norm.bias", L, _identity),
        "ln_latents_w": _stack(sd, pv + "blocks.{i}.0.latents_layer_norm.weight", L, _identity),
        "ln_latents_b": _stack(sd, pv + "blocks.{i}.0.latents_layer_norm.bias", L, _identity),
        "q_proj": _stack(sd, pv + "blocks.{i}.0.q_proj.weight", L),
        "k_proj": _stack(sd, pv + "blocks.{i}.0.k_proj.weight", L),
        "v_proj": _stack(sd, pv + "blocks.{i}.0.v_proj.weight", L),
        "o_proj": _stack(sd, pv + "blocks.{i}.0.output_proj.weight", L),
        "mlp_ln_w": _stack(sd, pv + "blocks.{i}.1.ln.weight", L, _identity),
        "mlp_ln_b": _stack(sd, pv + "blocks.{i}.1.ln.bias", L, _identity),
        "fc": _stack(sd, pv + "blocks.{i}.1.fc.weight", L),
        "c_proj": _stack(sd, pv + "blocks.{i}.1.c_proj.weight", L),
    }
    if pv + "blocks.0.0.q_layer_norm.weight" in sd:
        layers["q_ln_w"] = _stack(sd, pv + "blocks.{i}.0.q_layer_norm.weight", L, _identity)
        layers["q_ln_b"] = _stack(sd, pv + "blocks.{i}.0.q_layer_norm.bias", L, _identity)
        layers["k_ln_w"] = _stack(sd, pv + "blocks.{i}.0.k_layer_norm.weight", L, _identity)
        layers["k_ln_b"] = _stack(sd, pv + "blocks.{i}.0.k_layer_norm.bias", L, _identity)
    perceiver = {
        "latents": np.asarray(sd[pv + "latents"]),
        "layers": layers,
        "final_ln_w": np.asarray(sd[pv + "layer_norm.weight"]),
        "final_ln_b": np.asarray(sd[pv + "layer_norm.bias"]),
    }
    return {
        "lm": {"embed": embed, "decoder": lm, "lm_head": head},
        "vision": convert_vit(sd, "model.vision_model.", cfg.vision),
        "perceiver": perceiver,
    }


def convert_text(sd: StateDict, cfg: ModelConfig) -> Dict:
    """Plain HF causal LM (MistralForCausalLM / Qwen2ForCausalLM — the
    reference's text-only testbed wrappers, testbed/models/{mistral,qwen2}.py)."""
    lm = convert_decoder(sd, "model.", cfg.text, attn_bias=cfg.text.attn_bias)
    out = {
        "lm": {
            "embed": np.asarray(sd["model.embed_tokens.weight"]),
            "decoder": lm,
        }
    }
    if not cfg.text.tie_word_embeddings:
        out["lm"]["lm_head"] = _t(sd["lm_head.weight"])
    return out


_CONVERTERS = {
    "idefics2": convert_idefics2,
    "llava-interleave": convert_llava_interleave,
    "idefics1": convert_idefics1,
    "text": convert_text,
}


def convert_checkpoint(model_name: str, hf_dir: str, out_path: Optional[str] = None) -> str:
    cfg = get_model_config(model_name)
    sd = load_torch_state_dict(hf_dir)
    params = _CONVERTERS[cfg.family](sd, cfg)
    out_path = out_path or os.path.join(hf_dir, "params.msgpack")
    from flax import serialization

    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return out_path


if __name__ == "__main__":
    import sys

    convert_checkpoint(sys.argv[1], sys.argv[2])
    print("converted.")
