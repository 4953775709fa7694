"""LVLM assembly: vision tower + connector + text decoder as one pure function.

Replaces the reference's HF model wrappers (``testbed/models/*.py``).  The three
families differ only in how vision enters the text stream:

- **idefics2**: SigLIP features → perceiver connector → 64 tokens per image spliced
  into ``<image>`` positions of the text embedding sequence.
- **llava-interleave**: SigLIP features → MLP projector → one token per patch,
  spliced likewise.
- **idefics1**: CLIP features → perceiver resampler → latents consumed by gated
  cross-attention inside the decoder (no inline tokens).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .decoder import make_causal_mask, positions_from_mask
from .lm import LMOutput, embed_tokens, init_lm_params, lm_forward
from .vision import (
    init_llava_projector,
    init_perceiver_params,
    init_vit_params,
    llava_project,
    perceiver_forward,
    vit_forward,
)

Params = Dict[str, Any]


def init_lvlm_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    k_lm, k_vit, k_conn = jax.random.split(key, 3)
    params: Params = {"lm": init_lm_params(cfg.text, k_lm, dtype)}
    if cfg.vision is not None:
        params["vision"] = init_vit_params(cfg.vision, k_vit, dtype)
        if cfg.family == "idefics2":
            params["connector"] = init_perceiver_params(
                cfg.perceiver, cfg.vision.hidden_size, cfg.text.hidden_size, k_conn,
                dtype, project_first=True,
            )
        elif cfg.family == "idefics1":
            params["perceiver"] = init_perceiver_params(
                cfg.perceiver, cfg.vision.hidden_size, cfg.vision.hidden_size, k_conn,
                dtype, project_first=False,
            )
        elif cfg.family == "llava-interleave":
            params["projector"] = init_llava_projector(
                cfg.vision.hidden_size, cfg.text.hidden_size, k_conn, dtype
            )
    return params


def encode_images(
    params: Params,
    cfg: ModelConfig,
    pixel_values: jnp.ndarray,
    patch_mask: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """pixel_values [B,N,H,W,C] → per-image feature tokens.

    Returns [B, N*S, D_text] for inline families, [B, N*latents, D_vision] for
    idefics1 (cross-attention states).  ``patch_mask`` [B,N,nh,nw] carries the
    valid-patch grid for variable-aspect images (idefics2).
    """
    B, N = pixel_values.shape[:2]
    flat = pixel_values.reshape((B * N,) + pixel_values.shape[2:])
    flat_patch = (
        patch_mask.reshape((B * N,) + patch_mask.shape[2:])
        if patch_mask is not None
        else None
    )
    feats = vit_forward(
        params["vision"], cfg.vision, flat, patch_mask=flat_patch, attn_impl=attn_impl
    )
    ctx_mask = flat_patch.reshape(B * N, -1) if flat_patch is not None else None
    if cfg.family == "idefics2":
        feats = perceiver_forward(
            params["connector"], cfg.perceiver, feats,
            norm_eps=cfg.text.norm_eps, context_mask=ctx_mask,
        )
    elif cfg.family == "idefics1":
        # HF IdeficsPerceiverResampler uses torch LayerNorm defaults (eps 1e-5)
        feats = perceiver_forward(
            params["perceiver"], cfg.perceiver, feats,
            norm_eps=1e-5, context_mask=ctx_mask,
        )
    elif cfg.family == "llava-interleave":
        if cfg.vision.use_class_token:
            # llava-1.5: vision_feature_select_strategy="default" drops the CLS token
            feats = feats[:, 1:]
        feats = llava_project(params["projector"], feats)
    S = feats.shape[1]
    return feats.reshape(B, N * S, feats.shape[-1])


def splice_image_embeds(
    text_embeds: jnp.ndarray,
    image_feats: jnp.ndarray,
    input_ids: jnp.ndarray,
    image_token_id: int,
) -> jnp.ndarray:
    """Replace embeddings at ``<image>`` token positions with image features, in
    order of appearance (the functional analog of HF's masked_scatter)."""
    is_img = input_ids == image_token_id  # [B,T]
    idx = jnp.cumsum(is_img.astype(jnp.int32), axis=-1) - 1  # [B,T]
    idx = jnp.clip(idx, 0, image_feats.shape[1] - 1)
    gathered = jnp.take_along_axis(
        image_feats, idx[..., None], axis=1
    )  # [B,T,D]
    return jnp.where(is_img[..., None], gathered.astype(text_embeds.dtype), text_embeds)


class LVLMBatch(NamedTuple):
    """Device-ready batch (all arrays; see LVLMProcessor for construction)."""

    input_ids: jnp.ndarray                       # [B,T]
    attention_mask: jnp.ndarray                  # [B,T]
    pixel_values: Optional[jnp.ndarray] = None   # [B,N,H,W,C]
    pixel_mask: Optional[jnp.ndarray] = None     # [B,N]
    image_attention_mask: Optional[jnp.ndarray] = None  # [B,T,N] (idefics1)
    patch_mask: Optional[jnp.ndarray] = None     # [B,N,nh,nw] (idefics2 aspect)


def lvlm_forward(
    params: Params,
    cfg: ModelConfig,
    batch: LVLMBatch,
    *,
    image_feats: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    kv_cache: Optional[Dict[str, jnp.ndarray]] = None,
    kv_total_len: Optional[int] = None,
    cache_empty: bool = False,
    **decoder_kwargs,
) -> LMOutput:
    """Full forward.  ``image_feats`` may be precomputed (generation reuses them).

    With a kv_cache, ``batch.attention_mask`` must cover all cached+current keys
    (length S); without one, a causal mask over the current sequence is built.
    """
    input_ids = batch.input_ids
    embeds = embed_tokens(params["lm"], input_ids)

    cross_states = None
    cross_mask = None
    if batch.pixel_values is not None and image_feats is None:
        image_feats = encode_images(
            params, cfg, batch.pixel_values, batch.patch_mask,
            attn_impl=decoder_kwargs.get("attn_impl", "xla"),
        )
    if image_feats is not None:
        if cfg.family == "idefics1":
            cross_states = image_feats
            n_img = batch.pixel_values.shape[1] if batch.pixel_values is not None else 1
            latents = image_feats.shape[1] // n_img
            if batch.image_attention_mask is not None:
                m = batch.image_attention_mask.astype(bool)  # [B,T,N]
                if batch.pixel_mask is not None:
                    m = m & batch.pixel_mask[:, None, :].astype(bool)
                cross_mask = jnp.repeat(m, latents, axis=-1)[:, None]  # [B,1,T,N*lat]
        else:
            embeds = splice_image_embeds(
                embeds, image_feats, input_ids, cfg.image_token_id
            )

    if kv_cache is not None:
        if cache_empty:
            # prefill: attention only covers the current block (flash-eligible);
            # the decoder appends k/v into the empty cache afterwards
            mask4 = make_causal_mask(batch.attention_mask, cfg.text.sliding_window)
            decoder_kwargs.setdefault("key_mask", batch.attention_mask)
            decoder_kwargs.setdefault("cache_empty", True)
        else:
            # cached two-part attention: only a 2D slot-validity mask is needed
            # (causality and the written-slot cutoff are handled inside)
            total = kv_total_len or (
                kv_cache["k"].shape[2]
                + (kv_cache["prompt_k"].shape[2] if "prompt_k" in kv_cache else 0)
            )
            key_mask2d = batch.attention_mask
            pad = total - key_mask2d.shape[1]
            if pad > 0:
                key_mask2d = jnp.pad(key_mask2d, ((0, 0), (0, pad)))
            decoder_kwargs.setdefault("key_mask", key_mask2d)
            mask4 = None
    else:
        mask4 = make_causal_mask(batch.attention_mask, cfg.text.sliding_window)
        # flash-eligible: mask is exactly causal + key padding
        decoder_kwargs.setdefault("key_mask", batch.attention_mask)

    if position_ids is None:
        position_ids = positions_from_mask(batch.attention_mask)
        if kv_cache is not None and input_ids.shape[1] == 1:
            # single-token decode: position = count of real tokens so far - 1
            position_ids = position_ids[:, -1:]

    return lm_forward(
        params["lm"],
        cfg.text,
        input_embeds=embeds,
        attn_mask=mask4,
        position_ids=position_ids,
        kv_cache=kv_cache,
        cross_states=cross_states,
        cross_mask=cross_mask,
        **decoder_kwargs,
    )
