"""Vision towers and vision→text connectors.

- ``vit_forward``: CLIP-style (class token, quick_gelu, pre-norm) and SigLIP-style
  (no class token, gelu_tanh) encoders under one config.
- ``perceiver_forward``: IDEFICS-1 perceiver resampler (latents cross-attend to
  vision features) and IDEFICS-2 connector (modality projection + GQA perceiver in
  text width) under one parameterization.
- ``llava_project``: LLaVA's 2-layer MLP projector.

Patch embedding is implemented as unfold + dense — identical math to the conv
patchify, and it maps onto a single MXU matmul.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import PerceiverConfig, VisionConfig
from .layers import gelu_act, layer_norm, repeat_kv, rms_norm, sdpa_with_lse

Params = Dict[str, Any]


def _dense(key, shape, dtype, scale=0.02):
    return (jax.random.normal(key, shape) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------


def init_vit_params(cfg: VisionConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    p = cfg.patch_size
    keys = iter(jax.random.split(key, 12))
    n_pos = cfg.num_patches
    params: Params = {
        "patch_embed": {
            "kernel": _dense(next(keys), (p * p * 3, D), dtype),
            "bias": jnp.zeros((D,), dtype),
        },
        "pos_embed": _dense(next(keys), (n_pos, D), dtype),
        "layers": {
            "ln1_w": jnp.ones((L, D), dtype),
            "ln1_b": jnp.zeros((L, D), dtype),
            "q_proj": _dense(next(keys), (L, D, D), dtype),
            "q_bias": jnp.zeros((L, D), dtype),
            "k_proj": _dense(next(keys), (L, D, D), dtype),
            "k_bias": jnp.zeros((L, D), dtype),
            "v_proj": _dense(next(keys), (L, D, D), dtype),
            "v_bias": jnp.zeros((L, D), dtype),
            "o_proj": _dense(next(keys), (L, D, D), dtype),
            "o_bias": jnp.zeros((L, D), dtype),
            "ln2_w": jnp.ones((L, D), dtype),
            "ln2_b": jnp.zeros((L, D), dtype),
            "fc1": _dense(next(keys), (L, D, F), dtype),
            "fc1_bias": jnp.zeros((L, F), dtype),
            "fc2": _dense(next(keys), (L, F, D), dtype),
            "fc2_bias": jnp.zeros((L, D), dtype),
        },
        "post_ln_w": jnp.ones((D,), dtype),
        "post_ln_b": jnp.zeros((D,), dtype),
    }
    if cfg.use_class_token:
        params["class_embed"] = _dense(next(keys), (D,), dtype)
        params["pre_ln_w"] = jnp.ones((D,), dtype)
        params["pre_ln_b"] = jnp.zeros((D,), dtype)
    return params


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B,H,W,C] → [B, (H/p)*(W/p), p*p*C]; row-major patch scan order."""
    B, H, W, C = pixels.shape
    nh, nw = H // patch, W // patch
    x = pixels.reshape(B, nh, patch, nw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, nh, nw, p, p, C]
    return x.reshape(B, nh * nw, patch * patch * C)


def bucket_position_ids(patch_mask: jnp.ndarray) -> jnp.ndarray:
    """NaViT-style bucketized position ids for variable-aspect images.

    patch_mask [B, nh, nw] (top-left valid region) → pos ids [B, nh*nw] into a
    ``nh*nw``-entry position table: the valid ``nb_h × nb_w`` grid is stretched
    over the full grid with ``bucketize(arange(nb)/nb, boundaries, right)``
    (HF Idefics2VisionEmbeddings semantics); padded patches get id 0 (masked).
    """
    B, nh, nw = patch_mask.shape
    valid_h = jnp.maximum(jnp.sum(jnp.any(patch_mask > 0, axis=2), axis=1), 1)  # [B]
    valid_w = jnp.maximum(jnp.sum(jnp.any(patch_mask > 0, axis=1), axis=1), 1)

    def buckets(valid_n, side):
        frac = jnp.arange(side)[None, :] / valid_n[:, None]          # [B, side]
        boundaries = jnp.arange(1, side) / side                       # [side-1]
        return jnp.sum(frac[:, :, None] >= boundaries[None, None, :], axis=-1)

    bh = buckets(valid_h, nh)  # [B, nh]
    bw = buckets(valid_w, nw)  # [B, nw]
    ids = bh[:, :, None] * nw + bw[:, None, :]  # [B, nh, nw]
    ids = jnp.where(patch_mask > 0, ids, 0)
    return ids.reshape(B, nh * nw)


def vit_forward(
    params: Params,
    cfg: VisionConfig,
    pixels: jnp.ndarray,
    patch_mask: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """pixels [B,H,W,C] → features [B, N, D] (post-layernorm applied).

    ``patch_mask`` [B, nh, nw] enables variable-aspect processing (idefics2):
    padded patches are masked out of attention and position ids are bucketized.

    ``attn_impl="flash"`` routes attention through XLA's fused
    ``jax.nn.dot_product_attention`` on a 128-aligned sequence: the patch
    sequence is zero-padded once outside the layer scan (ViT patch counts like
    729/577 are lane-misaligned) and padded slots are masked out of attention;
    the pad rows' MLP output is discarded by the final slice.
    """
    x = jnp.dot(patchify(pixels, cfg.patch_size), params["patch_embed"]["kernel"])
    x = x + params["patch_embed"]["bias"]
    B = x.shape[0]
    if cfg.use_class_token:
        cls = jnp.broadcast_to(params["class_embed"][None, None], (B, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x.astype(cls.dtype)], axis=1)
    if patch_mask is not None:
        pos_ids = bucket_position_ids(patch_mask)
        # one-hot matmul instead of jnp.take: TPU lowers the batched table
        # gather to a serial loop (36 ms at [16,729]×[729,1152] measured vs
        # ~0.2 ms on the MXU); single nonzero term per row → exact
        n_pos = params["pos_embed"].shape[0]
        onehot = (pos_ids[:, :, None] == jnp.arange(n_pos)[None, None, :]).astype(
            params["pos_embed"].dtype
        )
        x = x + jnp.einsum("bnt,td->bnd", onehot, params["pos_embed"])
        key_mask = (patch_mask.reshape(B, -1) > 0)[:, None, None, :]  # [B,1,1,N]
    else:
        x = x + params["pos_embed"][None]
        key_mask = None
    if cfg.use_class_token:
        x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.norm_eps)

    H = cfg.num_heads
    Dh = cfg.hidden_size // H
    n_tokens = x.shape[1]
    use_flash = attn_impl == "flash"
    flash_kmask = None
    if use_flash:
        # patch counts ≤8192 go through the one-shot kernel (bq=128), which
        # only needs 128-aligned keys (4900 → 4992, not 5120 — 2.5% less
        # softmax).  Beyond that the flash kernel takes over and wants
        # 512/1024 blocks (4992 = 39×128 would force 384-blocks, where
        # per-program overhead dominates: measured 113 → ~30 ms/layer).
        from ..ops.flash_attention import ONEPASS_MAX_S_NONCAUSAL

        n128 = n_tokens + (-n_tokens) % 128
        n_pad = (-n_tokens) % (128 if n128 <= ONEPASS_MAX_S_NONCAUSAL else 1024)
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        if patch_mask is not None:
            valid = patch_mask.reshape(B, -1) > 0
            if cfg.use_class_token:
                valid = jnp.concatenate([jnp.ones((B, 1), bool), valid], axis=1)
        else:
            valid = jnp.ones((B, n_tokens), bool)
        flash_kmask = jnp.pad(valid.astype(jnp.int32), ((0, 0), (0, n_pad)))

    def step(h, lp):
        residual = h
        hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
        B_, N, D = hn.shape
        q = (jnp.dot(hn, lp["q_proj"]) + lp["q_bias"]).reshape(B_, N, H, Dh)
        k = (jnp.dot(hn, lp["k_proj"]) + lp["k_bias"]).reshape(B_, N, H, Dh)
        v = (jnp.dot(hn, lp["v_proj"]) + lp["v_bias"]).reshape(B_, N, H, Dh)
        if use_flash and jax.default_backend() == "tpu":
            # Pallas attention at every patch count: short sequences (≤3k,
            # e.g. 378px → 729→768 patches) dispatch to the one-shot kernel
            # (13.7 ms/12L vs XLA fused 29.0 at B16 N768 D72 on v5e); large
            # ones (idefics2-8b 980px → 4900→5120) stream through the flash
            # kernel — XLA's dot_product_attention would materialize the
            # [B,H,N,N] f32 score tensor (25.5 GB at B16 N4992, OOM on 16 GB)
            from ..ops.flash_attention import flash_attention

            attn, _, _ = flash_attention(
                q, k, v, flash_kmask, causal=False, need_unmasked=False
            )
        elif use_flash:
            # non-TPU backends: XLA's fused attention on the padded sequence
            attn = jax.nn.dot_product_attention(
                q, k, v, mask=(flash_kmask > 0)[:, None, None, :]
            )
        else:
            attn, _ = sdpa_with_lse(q, k, v, mask=key_mask)
        h = residual + jnp.dot(attn.reshape(B_, N, D), lp["o_proj"]) + lp["o_bias"]
        residual = h
        hn = layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
        hn = gelu_act(jnp.dot(hn, lp["fc1"]) + lp["fc1_bias"], cfg.hidden_act)
        h = residual + jnp.dot(hn, lp["fc2"]) + lp["fc2_bias"]
        return h, None

    x, _ = jax.lax.scan(step, x, params["layers"])
    if use_flash and x.shape[1] != n_tokens:
        x = x[:, :n_tokens]
    if not cfg.post_layernorm:
        return x
    return layer_norm(x, params["post_ln_w"], params["post_ln_b"], cfg.norm_eps)


# ---------------------------------------------------------------------------
# perceiver resampler / connector
# ---------------------------------------------------------------------------


def init_perceiver_params(
    pcfg: PerceiverConfig,
    vision_dim: int,
    out_dim: int,
    key: jax.Array,
    dtype=jnp.float32,
    project_first: bool = False,
) -> Params:
    """IDEFICS-1 style (``project_first=False``): latents live in ``vision_dim``;
    LayerNorm + ReLU MLP + optional per-head qk-layernorms
    (HF ``IdeficsPerceiverResampler``).
    IDEFICS-2 connector (``project_first=True``): vision features are first
    MLP-projected to ``out_dim`` and the perceiver runs in ``out_dim`` with
    RMSNorm + gated-SiLU MLP (HF ``Idefics2PerceiverResampler``)."""
    H = pcfg.num_heads
    Hkv = pcfg.num_kv_heads or H
    width = out_dim if project_first else vision_dim
    Dh = pcfg.head_dim or width // H
    F = pcfg.intermediate_size or 4 * width
    L = pcfg.num_layers
    keys = iter(jax.random.split(key, 12))
    if pcfg.style == "idefics1":
        layers = {
            "ln_latents_w": jnp.ones((L, width), dtype),
            "ln_latents_b": jnp.zeros((L, width), dtype),
            "ln_context_w": jnp.ones((L, width), dtype),
            "ln_context_b": jnp.zeros((L, width), dtype),
            "q_proj": _dense(next(keys), (L, width, H * Dh), dtype),
            "k_proj": _dense(next(keys), (L, width, Hkv * Dh), dtype),
            "v_proj": _dense(next(keys), (L, width, Hkv * Dh), dtype),
            "o_proj": _dense(next(keys), (L, H * Dh, width), dtype),
            "mlp_ln_w": jnp.ones((L, width), dtype),
            "mlp_ln_b": jnp.zeros((L, width), dtype),
            "fc": _dense(next(keys), (L, width, F), dtype),
            "c_proj": _dense(next(keys), (L, F, width), dtype),
        }
        if pcfg.qk_layernorm:
            layers["q_ln_w"] = jnp.ones((L, Dh), dtype)
            layers["q_ln_b"] = jnp.zeros((L, Dh), dtype)
            layers["k_ln_w"] = jnp.ones((L, Dh), dtype)
            layers["k_ln_b"] = jnp.zeros((L, Dh), dtype)
        return {
            "latents": _dense(next(keys), (pcfg.num_latents, width), dtype),
            "layers": layers,
            "final_ln_w": jnp.ones((width,), dtype),
            "final_ln_b": jnp.zeros((width,), dtype),
        }
    params: Params = {
        "latents": _dense(next(keys), (pcfg.num_latents, width), dtype),
        "layers": {
            "ln_latents": jnp.ones((L, width), dtype),
            "ln_context": jnp.ones((L, width), dtype),
            "q_proj": _dense(next(keys), (L, width, H * Dh), dtype),
            "k_proj": _dense(next(keys), (L, width, Hkv * Dh), dtype),
            "v_proj": _dense(next(keys), (L, width, Hkv * Dh), dtype),
            "o_proj": _dense(next(keys), (L, H * Dh, width), dtype),
            "post_ln": jnp.ones((L, width), dtype),
            "gate_proj": _dense(next(keys), (L, width, F), dtype),
            "up_proj": _dense(next(keys), (L, width, F), dtype),
            "down_proj": _dense(next(keys), (L, F, width), dtype),
        },
        "final_ln": jnp.ones((width,), dtype),
    }
    if project_first:
        params["modality_proj"] = {
            "gate": _dense(next(keys), (vision_dim, F), dtype),
            "up": _dense(next(keys), (vision_dim, F), dtype),
            "down": _dense(next(keys), (F, out_dim), dtype),
        }
    return params


def perceiver_forward(
    params: Params,
    pcfg: PerceiverConfig,
    vision_feats: jnp.ndarray,
    norm_eps: float = 1e-6,
    context_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """vision_feats [B, N, width_in] → [B, num_latents, width_out].

    Each layer: latents attend to concat(context, latents) (Flamingo-style),
    then a gated MLP; both with residuals.  ``context_mask`` [B, N] masks padded
    vision patches out of the cross-attention keys (idefics2 variable aspect).
    """
    if pcfg.style == "idefics1":
        return _perceiver_idefics1(params, pcfg, vision_feats, norm_eps, context_mask)

    if "modality_proj" in params:
        mp = params["modality_proj"]
        gate = jax.nn.silu(jnp.dot(vision_feats, mp["gate"]))
        up = jnp.dot(vision_feats, mp["up"])
        vision_feats = jnp.dot(gate * up, mp["down"])

    B = vision_feats.shape[0]
    width = vision_feats.shape[-1]
    H = pcfg.num_heads
    Hkv = pcfg.num_kv_heads or H
    Dh = pcfg.head_dim or width // H
    latents = jnp.broadcast_to(
        params["latents"][None], (B, params["latents"].shape[0], width)
    ).astype(vision_feats.dtype)

    kv_mask = None
    if context_mask is not None:
        n_lat = params["latents"].shape[0]
        full = jnp.concatenate(
            [context_mask.astype(bool), jnp.ones((B, n_lat), bool)], axis=1
        )
        kv_mask = full[:, None, None, :]  # [B,1,1,N+latents]

    def step(lat, lp):
        residual = lat
        ln_lat = rms_norm(lat, lp["ln_latents"], norm_eps)
        ln_ctx = rms_norm(vision_feats, lp["ln_context"], norm_eps)
        kv_input = jnp.concatenate([ln_ctx, ln_lat], axis=1)
        nq, nk = ln_lat.shape[1], kv_input.shape[1]
        q = jnp.dot(ln_lat, lp["q_proj"]).reshape(B, nq, H, Dh)
        k = jnp.dot(kv_input, lp["k_proj"]).reshape(B, nk, Hkv, Dh)
        v = jnp.dot(kv_input, lp["v_proj"]).reshape(B, nk, Hkv, Dh)
        attn, _ = sdpa_with_lse(q, repeat_kv(k, H // Hkv), repeat_kv(v, H // Hkv), kv_mask)
        lat = residual + jnp.dot(attn.reshape(B, nq, H * Dh), lp["o_proj"])
        residual = lat
        ln = rms_norm(lat, lp["post_ln"], norm_eps)
        gate = jax.nn.silu(jnp.dot(ln, lp["gate_proj"]))
        up = jnp.dot(ln, lp["up_proj"])
        lat = residual + jnp.dot(gate * up, lp["down_proj"])
        return lat, None

    latents, _ = jax.lax.scan(step, latents, params["layers"])
    return rms_norm(latents, params["final_ln"], norm_eps)


def _perceiver_idefics1(
    params: Params,
    pcfg: PerceiverConfig,
    vision_feats: jnp.ndarray,
    norm_eps: float,
    context_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """HF IdeficsPerceiverResampler semantics: per layer,
    latents += attn(ln(context)⊕ln(latents), q=ln(latents)); latents += ReLU-MLP;
    final LayerNorm."""
    B = vision_feats.shape[0]
    width = vision_feats.shape[-1]
    H = pcfg.num_heads
    Dh = pcfg.head_dim or width // H
    n_lat = params["latents"].shape[0]
    latents = jnp.broadcast_to(
        params["latents"][None], (B, n_lat, width)
    ).astype(vision_feats.dtype)

    kv_mask = None
    if context_mask is not None:
        full = jnp.concatenate(
            [context_mask.astype(bool), jnp.ones((B, n_lat), bool)], axis=1
        )
        kv_mask = full[:, None, None, :]

    def step(lat, lp):
        ctx_n = layer_norm(vision_feats, lp["ln_context_w"], lp["ln_context_b"], norm_eps)
        lat_n = layer_norm(lat, lp["ln_latents_w"], lp["ln_latents_b"], norm_eps)
        kv_in = jnp.concatenate([ctx_n, lat_n], axis=1)
        nq, nk = lat_n.shape[1], kv_in.shape[1]
        q = jnp.dot(lat_n, lp["q_proj"]).reshape(B, nq, H, Dh)
        k = jnp.dot(kv_in, lp["k_proj"]).reshape(B, nk, H, Dh)
        v = jnp.dot(kv_in, lp["v_proj"]).reshape(B, nk, H, Dh)
        if "q_ln_w" in lp:
            q = layer_norm(q, lp["q_ln_w"], lp["q_ln_b"], norm_eps)
            k = layer_norm(k, lp["k_ln_w"], lp["k_ln_b"], norm_eps)
        attn, _ = sdpa_with_lse(q, k, v, kv_mask)
        lat = lat + jnp.dot(attn.reshape(B, nq, H * Dh), lp["o_proj"])
        m = layer_norm(lat, lp["mlp_ln_w"], lp["mlp_ln_b"], norm_eps)
        m = jnp.maximum(jnp.dot(m, lp["fc"]), 0.0)
        lat = lat + jnp.dot(m, lp["c_proj"])
        return lat, None

    latents, _ = jax.lax.scan(step, latents, params["layers"])
    return layer_norm(latents, params["final_ln_w"], params["final_ln_b"], norm_eps)


# ---------------------------------------------------------------------------
# llava projector
# ---------------------------------------------------------------------------


def init_llava_projector(vision_dim: int, text_dim: int, key: jax.Array, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _dense(k1, (vision_dim, text_dim), dtype),
        "fc1_bias": jnp.zeros((text_dim,), dtype),
        "fc2": _dense(k2, (text_dim, text_dim), dtype),
        "fc2_bias": jnp.zeros((text_dim,), dtype),
    }


def llava_project(params: Params, vision_feats: jnp.ndarray) -> jnp.ndarray:
    x = jnp.dot(vision_feats, params["fc1"]) + params["fc1_bias"]
    x = jax.nn.gelu(x, approximate=False)
    return jnp.dot(x, params["fc2"]) + params["fc2_bias"]
