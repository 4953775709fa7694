"""Core functional layers: norms, RoPE, attention-with-logsumexp, MLP.

All functions are pure; parameters are plain pytrees.  Attention returns the softmax
log-normalizer (lse) alongside the output so the MimIC shift
(reference ``src/shift_encoder.py:694-715``) can reuse it as log Z₂ — on TPU the
flash kernel carries this value anyway (``mimic_tpu/ops``), so emitting it is free.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# large-negative fill for masked logits; finite to keep lse well-defined in fp32
NEG_INF = -2.0e38


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray], eps: float
) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    x = x * weight.astype(jnp.float32)
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# rotary position embeddings (llama convention: rotate_half)
# ---------------------------------------------------------------------------


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions [..., T] → [..., T, head_dim]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q,k: [B,T,H,D]; cos,sin: [B,T,D] (broadcast over heads)."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    return q, k


# ---------------------------------------------------------------------------
# scaled dot-product attention with logsumexp
# ---------------------------------------------------------------------------


def repeat_kv(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[B,S,Hkv,D] → [B,S,Hkv*groups,D] (GQA key/value head expansion)."""
    if groups == 1:
        return x
    b, s, h, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, groups, d))
    return x.reshape(b, s, h * groups, d)


def sdpa_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attention returning (output [B,T,H,D], lse [B,T,H]).

    q: [B,T,H,D], k/v: [B,S,H,D]; mask: broadcastable to [B,H,T,S], True = attend.
    Scores accumulate in fp32; ``lse`` is the masked log-normalizer
    log Σ_s exp(q·k_s·scale) over attendable positions.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    lse = jax.nn.logsumexp(scores, axis=-1)  # [B,H,T]
    probs = jnp.exp(scores - lse[..., None])
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v)
    return out, jnp.transpose(lse, (0, 2, 1))  # lse → [B,T,H]


def unmasked_lse(q: jnp.ndarray, k: jnp.ndarray, scale: Optional[float] = None) -> jnp.ndarray:
    """log Σ_s exp(q·k_s·scale) over *all* key positions, ignoring any mask.

    This reproduces the reference ``do_shift`` exactly: it computes
    ``logsumexp(q @ kᵀ/√d)`` on the raw projected states with no causal or padding
    mask (``src/shift_encoder.py:697-703``).  Returns [B,T,H].
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32) * scale
    return jnp.transpose(jax.nn.logsumexp(scores, axis=-1), (0, 2, 1))


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------


def swiglu_mlp(x: jnp.ndarray, gate_w: jnp.ndarray, up_w: jnp.ndarray, down_w: jnp.ndarray) -> jnp.ndarray:
    """LLaMA-family MLP: down(silu(gate(x)) * up(x)); weights stored [in, out]."""
    gate = jax.nn.silu(jnp.dot(x, gate_w))
    up = jnp.dot(x, up_w)
    return jnp.dot(gate * up, down_w)


def gelu_act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(f"Unknown activation {kind!r}")
