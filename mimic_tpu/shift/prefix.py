"""Prefix-tuning adapter (HF peft ``PrefixTuningConfig`` analog).

The reference peft factory accepts ``peft.name == "prefix-tuning"``
(``src/utils.py:50-63``) but ships no config that uses it; this module provides
the capability with HF peft semantics:

- ``num_virtual_tokens`` learned key/value slots per decoder self-attention
  layer, injected as ``past_key_values`` — i.e. **post-RoPE** raw KV entries
  every real query attends to (HF applies rotary embeddings only to new keys).
- The attention mask is extended by P leading ones, so real-token positions
  shift by P (HF computes positions as ``cumsum(attention_mask) - 1`` with the
  prefix mask prepended).
- Initialization: standard-normal embedding (torch ``nn.Embedding`` default),
  trained in fp32 over the frozen bf16 tower.

TPU-native mapping: the prefix is a pre-written KV cache region.  The decoder's
two-part ``cached_attention`` (cache slots all-attendable + causal current
block) gives exactly prefix-tuning attention semantics with zero new kernel
code — training runs the query forward with a cache of length P, generation
prefills into a cache whose first P slots hold the prefix.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PrefixConfig
from ..models.config import TextConfig

PrefixParams = Dict[str, jnp.ndarray]


def init_prefix_params(
    prefix_cfg: PrefixConfig, text_cfg: TextConfig, key: jax.Array,
    dtype=jnp.float32,
) -> PrefixParams:
    """{"k": [L, P, Hkv, Dh], "v": [L, P, Hkv, Dh]} ~ N(0, 1)."""
    L, P = text_cfg.num_layers, prefix_cfg.num_virtual_tokens
    Hkv, Dh = text_cfg.num_kv_heads, text_cfg.head_size
    kk, kv = jax.random.split(key)
    return {
        "k": jax.random.normal(kk, (L, P, Hkv, Dh), dtype),
        "v": jax.random.normal(kv, (L, P, Hkv, Dh), dtype),
    }


def prefix_len(prefix: Optional[PrefixParams]) -> int:
    return 0 if prefix is None else prefix["k"].shape[1]


def prefix_forward_args(
    prefix: PrefixParams,
    batch,
    dtype,
    extra_len: int = 0,
) -> Tuple[object, jnp.ndarray, Dict[str, jnp.ndarray], int]:
    """Thread a learned prefix into a forward as pre-written cache slots.

    Returns ``(batch', position_ids, kv_cache, total_len)`` where

    - ``batch'`` carries the timeline attention mask ``[ones(P) | mask |
      zeros(extra_len)]`` (``extra_len`` reserves decode slots for generation),
    - ``position_ids`` are the real tokens' positions shifted by P,
    - ``kv_cache`` holds the prefix in slots ``[0, P)`` (length P) with room
      for the T current + ``extra_len`` future tokens.

    Differentiable w.r.t. the prefix leaves (broadcast + concat), so the same
    helper serves the train step and generation prefill.
    """
    from ..models.decoder import positions_from_mask

    k, v = prefix["k"], prefix["v"]
    L, P, Hkv, Dh = k.shape
    B, T = batch.input_ids.shape
    total = P + T + extra_len

    def expand(x):
        xb = jnp.broadcast_to(x[:, None], (L, B, P, Hkv, Dh)).astype(dtype)
        tail = jnp.zeros((L, B, T + extra_len, Hkv, Dh), dtype)
        return jnp.concatenate([xb, tail], axis=2)

    cache = {
        "k": expand(k),
        "v": expand(v),
        "length": jnp.asarray(P, jnp.int32),
    }
    am = batch.attention_mask
    mask = jnp.concatenate(
        [
            jnp.ones((B, P), am.dtype),
            am,
            jnp.zeros((B, extra_len), am.dtype),
        ],
        axis=-1,
    )
    pos = positions_from_mask(am) + P
    return batch._replace(attention_mask=mask), pos, cache, total
