"""Text language model = embedding + decoder stack + lm head."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import TextConfig
from .decoder import DecoderOutput, decoder_forward, init_decoder_params

Params = Dict[str, Any]


class LMOutput(NamedTuple):
    logits: jnp.ndarray
    decoder: DecoderOutput


def init_lm_params(cfg: TextConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    k_embed, k_dec, k_head = jax.random.split(key, 3)
    params: Params = {
        "embed": (jax.random.normal(k_embed, (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(dtype),
        "decoder": init_decoder_params(cfg, k_dec, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (
            jax.random.normal(k_head, (cfg.hidden_size, cfg.vocab_size)) * 0.02
        ).astype(dtype)
    return params


def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"], input_ids, axis=0)


def lm_head(params: Params, cfg: TextConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    if cfg.tie_word_embeddings:
        return jnp.einsum(
            "btd,vd->btv", hidden, params["embed"], preferred_element_type=jnp.float32
        )
    from ..ops.quant import qdot

    return qdot(hidden, params["lm_head"], preferred_element_type=jnp.float32)


def lm_forward(
    params: Params,
    cfg: TextConfig,
    input_ids: Optional[jnp.ndarray] = None,
    *,
    input_embeds: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    last_logit_only: bool = False,
    **decoder_kwargs,
) -> LMOutput:
    if input_embeds is None:
        input_embeds = embed_tokens(params, input_ids)
    B, T, _ = input_embeds.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    out = decoder_forward(
        params["decoder"], cfg, input_embeds, attn_mask, position_ids, **decoder_kwargs
    )
    hidden = out.hidden
    if last_logit_only:
        # generation prefill only reads the final position's logits — skip the
        # [B,T,V] unembed (≥1 TFLOP + a ~GB logits write at eval-protocol shapes)
        hidden = hidden[:, -1:]
    logits = lm_head(params, cfg, hidden)
    return LMOutput(logits=logits, decoder=out)
