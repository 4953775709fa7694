"""Shift-parameter pytrees.

The reference's shift encoders are ``nn.Module``s holding per-layer parameters and
mutating the wrapped model with hooks (``src/shift_encoder.py:143-247, 580-680``).
Here a shift encoder is just a pytree of stacked per-layer arrays, consumed by the
decoder scan — layer ``l`` receives slice ``tree[l]`` alongside its weights.

Keys (all optional, present according to strategy flags):

- ``attn_v``           [L,H,Dh] (MULTI_HEAD) or [L,D] — MimIC shift vector v
- ``attn_logz1_w/b``   [L,H,Dh]/[L,H] or [L,D]/[L,1] — the log Z₁ linear
- ``attn_out_shift``   [L,D] — LIVE-style shift added to the attention block output
- ``attn_out_scale``   [L]   — learnable (or fixed 1.0) scale for the above
- ``ffn_shift``        [L,D] — LIVE-style shift added to the MLP output
- ``ffn_scale``        [L]
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import EncoderConfig, ShiftStrategy
from ..models.config import TextConfig

ShiftParams = Dict[str, jnp.ndarray]


def init_shift_params(
    encoder_cfg: EncoderConfig,
    text_cfg: TextConfig,
    key: jax.Array,
    dtype=jnp.float32,
) -> ShiftParams:
    """Initialize shift parameters for the configured encoder kind.

    Init distributions mirror the reference:
    - MimIC shift v ~ N(0, 1)·0.001 (``src/shift_encoder.py:609-620``)
    - log Z₁ linear weight ~ N(0, 0.02), bias 0 (``MultiheadLinear``, ``:547-556``)
    - LIVE shift ~ N(0, 0.01), scale init ``shift_scale_init_value`` (``:171-199``)
    """
    attn = encoder_cfg.attn()
    ffn = encoder_cfg.ffn()
    L = text_cfg.num_layers
    D = text_cfg.hidden_size
    H = text_cfg.num_heads
    Dh = text_cfg.head_size
    params: ShiftParams = {}
    keys = jax.random.split(key, 4)

    if encoder_cfg.kind == "attn_approximator":
        multi = ShiftStrategy.MULTI_HEAD in attn
        if ShiftStrategy.VECTOR_SHIFT in attn:
            shape = (L, H, Dh) if multi else (L, D)
            params["attn_v"] = (jax.random.normal(keys[0], shape) * 0.001).astype(dtype)
        if ShiftStrategy.LEARNABLE_SHIFT_SCALE in attn:
            w_shape = (L, H, Dh) if multi else (L, D)
            b_shape = (L, H) if multi else (L, 1)
            params["attn_logz1_w"] = (jax.random.normal(keys[1], w_shape) * 0.02).astype(dtype)
            params["attn_logz1_b"] = jnp.zeros(b_shape, dtype)
        if ShiftStrategy.VECTOR_SHIFT in ffn:
            params["ffn_shift"] = (jax.random.normal(keys[2], (L, D)) * 0.001).astype(dtype)
    elif encoder_cfg.kind == "attn_ffn_shift":
        init_scale = (
            encoder_cfg.shift_scale_init_value
            if encoder_cfg.shift_scale_init_value is not None
            else 1.0
        )
        if ShiftStrategy.MULTI_HEAD in attn or ShiftStrategy.MULTI_HEAD in ffn:
            raise ValueError("MULTI_HEAD is not supported for output shifts")
        if ShiftStrategy.VECTOR_SHIFT in attn:
            params["attn_out_shift"] = (
                jax.random.normal(keys[0], (L, D)) * 0.01
            ).astype(dtype)
            params["attn_out_scale"] = jnp.full((L,), init_scale, dtype)
        if ShiftStrategy.VECTOR_SHIFT in ffn:
            params["ffn_shift"] = (jax.random.normal(keys[1], (L, D)) * 0.01).astype(dtype)
            params["ffn_scale"] = jnp.full((L,), init_scale, dtype)
    elif encoder_cfg.kind == "none":
        pass
    else:
        raise ValueError(f"Unknown encoder kind {encoder_cfg.kind!r}")
    return params


def needs_attn_capture(encoder_cfg: EncoderConfig) -> bool:
    return ShiftStrategy.RECORD_HIDDEN_STATES in encoder_cfg.attn()


def needs_ffn_capture(encoder_cfg: EncoderConfig) -> bool:
    return ShiftStrategy.RECORD_HIDDEN_STATES in encoder_cfg.ffn()


def multi_head(encoder_cfg: EncoderConfig) -> bool:
    return ShiftStrategy.MULTI_HEAD in encoder_cfg.attn()
