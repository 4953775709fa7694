"""Shift application math (pure functions, one decoder layer at a time).

Implements the reference ``do_shift`` (``src/shift_encoder.py:682-732``) and the
output-shift hooks (``src/shift_encoder.py:222-247, 653-672``) functionally.

μ derivation: the reference computes ``μ = exp(log Z₁ − logaddexp(log Z₁, log Z₂))``
which equals ``sigmoid(log Z₁ − log Z₂)`` — that form is used here (numerically
identical, one transcendental cheaper).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

LayerShift = Dict[str, jnp.ndarray]  # per-layer slices (leading L axis removed)


def attn_shift_delta(
    layer_shift: LayerShift,
    q: jnp.ndarray,
    log_z2: jnp.ndarray,
    multi_head: bool,
) -> Optional[jnp.ndarray]:
    """The additive MimIC term μ·v for one layer; None when not configured.

    q:      [B,T,H,Dh] post-RoPE query states (post qk-layernorm where applicable,
            matching the reference's do_shift inputs)
    log_z2: [B,T,H] attention log-normalizer (log Z₂)
    returns [B,T,H,Dh] (multi-head) or [B,T,H*Dh] (single) delta, fp32.
    """
    if "attn_v" not in layer_shift:
        return None
    v = layer_shift["attn_v"].astype(jnp.float32)
    if "attn_logz1_w" not in layer_shift:
        # VECTOR_SHIFT without LEARNABLE_SHIFT_SCALE: plain additive shift
        if multi_head:
            return jnp.broadcast_to(v[None, None], q.shape).astype(jnp.float32)
        b, t = q.shape[:2]
        return jnp.broadcast_to(v[None, None], (b, t, v.shape[-1]))
    w = layer_shift["attn_logz1_w"].astype(jnp.float32)
    bias = layer_shift["attn_logz1_b"].astype(jnp.float32)
    qf = q.astype(jnp.float32)
    if multi_head:
        # log Z₁ = einsum(q[B,T,H,Dh], w[H,Dh]) + b[H]  (MultiheadLinear, :547-556)
        log_z1 = jnp.einsum("bthd,hd->bth", qf, w) + bias
        mu = jax.nn.sigmoid(log_z1 - log_z2)  # [B,T,H]
        return mu[..., None] * v[None, None]  # [B,T,H,Dh]
    # single-head: flatten heads, Linear(D→1), mean log Z₂ over heads (:705-709)
    b, t, h, d = q.shape
    q_flat = qf.reshape(b, t, h * d)
    log_z1 = jnp.einsum("btd,d->bt", q_flat, w.reshape(-1))[..., None] + bias  # [B,T,1]
    log_z2_mean = jnp.mean(log_z2, axis=-1, keepdims=True)  # [B,T,1]
    mu = jax.nn.sigmoid(log_z1 - log_z2_mean)
    return mu * v[None, None]  # [B,T,H*Dh]


def apply_attn_shift(
    layer_shift: LayerShift,
    q: jnp.ndarray,
    log_z2: jnp.ndarray,
    attn_out: jnp.ndarray,
    multi_head: bool,
) -> jnp.ndarray:
    """attn_out [B,T,H,Dh] → shifted output, same shape/dtype."""
    delta = attn_shift_delta(layer_shift, q, log_z2, multi_head)
    if delta is None:
        return attn_out
    b, t, h, d = attn_out.shape
    if multi_head:
        return (attn_out.astype(jnp.float32) + delta).astype(attn_out.dtype)
    flat = attn_out.reshape(b, t, h * d).astype(jnp.float32) + delta
    return flat.reshape(b, t, h, d).astype(attn_out.dtype)


def norm_preserving_shift(
    hidden: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """LIVE-style output shift: h' = (h + s·v) / ‖h + s·v‖ · ‖h‖
    (reference ``src/shift_encoder.py:233-240``)."""
    hf = hidden.astype(jnp.float32)
    shifted = hf + scale.astype(jnp.float32) * shift.astype(jnp.float32)[None, None, :]
    old_norm = jnp.linalg.norm(hf, axis=-1, keepdims=True)
    new_norm = jnp.linalg.norm(shifted, axis=-1, keepdims=True)
    return (shifted / new_norm * old_norm).astype(hidden.dtype)


def apply_output_shift(
    hidden: jnp.ndarray,
    shift: Optional[jnp.ndarray],
    scale: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Apply a norm-preserving output shift when configured; identity otherwise."""
    if shift is None:
        return hidden
    if scale is None:
        scale = jnp.ones((), dtype=jnp.float32)
    return norm_preserving_shift(hidden, shift, scale)
