"""Introspection utilities — the TPU-native answer to the reference trackers.

The reference's ``ForwardTracker``/``GradTracker``/``LocalsTracker``
(``testbed/utils/tracker.py``) capture per-module activations, gradients, and even
method locals via forward hooks and CPython bytecode rewriting.  In a functional
model none of that machinery is needed: intermediates are explicit outputs.  This
module packages the equivalents:

- ``capture_forward``: run a model forward returning all per-layer attention/MLP
  block outputs (the ForwardTracker analog — richer than hooks because outputs are
  stacked ``[L,B,T,D]`` arrays, not Python lists).
- ``capture_grads``: gradients of a scalar function of the logits w.r.t. every
  per-layer block output (the GradTracker analog), computed with one ``jax.vjp``.
- ``attention_probs``: recompute the attention probabilities of any layer from the
  captured inputs (the LocalsTracker analog — instead of exfiltrating a method's
  locals via bytecode injection, recompute them functionally; XLA would have
  rematerialized them anyway).
- ``profile``: wrap a region in a ``jax.profiler`` trace for TensorBoard.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.lvlm import LVLMBatch, lvlm_forward


def capture_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    batch: LVLMBatch,
    **kwargs,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward pass returning (logits, {"attn": [L,B,T,D], "ffn": [L,B,T,D]})."""
    out = lvlm_forward(params, cfg, batch, capture_attn=True, capture_ffn=True, **kwargs)
    return out.logits, {
        "attn": out.decoder.attn_capture,
        "ffn": out.decoder.ffn_capture,
    }


def capture_grads(
    params: Dict[str, Any],
    cfg: ModelConfig,
    batch: LVLMBatch,
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    **kwargs,
) -> Dict[str, jnp.ndarray]:
    """d loss(logits) / d (per-layer block outputs), one vjp.

    The functional GradTracker: instead of backward hooks on modules, treat the
    captured intermediates as differentiable outputs and pull back the loss.
    """

    logits, caps = capture_forward(params, cfg, batch, **kwargs)

    def loss_with_perturbation(eps_attn, eps_ffn):
        # inject additive perturbations at every layer's block outputs by linearity:
        # d loss/d caps equals the vjp of the perturbed forward at eps=0
        out = lvlm_forward(
            params, cfg, batch,
            capture_attn=True, capture_ffn=True,
            perturb_attn=eps_attn, perturb_ffn=eps_ffn, **kwargs,
        )
        return loss_fn(out.logits)

    zeros_attn = jnp.zeros_like(caps["attn"])
    zeros_ffn = jnp.zeros_like(caps["ffn"])
    g_attn, g_ffn = jax.grad(loss_with_perturbation, argnums=(0, 1))(
        zeros_attn, zeros_ffn
    )
    return {"attn": g_attn, "ffn": g_ffn}


def attention_probs(
    params: Dict[str, Any],
    cfg: ModelConfig,
    batch: LVLMBatch,
    layer: int,
    **kwargs,
) -> jnp.ndarray:
    """Recompute layer ``layer``'s attention probabilities [B,H,T,S].

    LocalsTracker analog: the reference rewrites the attention method's bytecode to
    leak its local ``attn_weights``; here we simply recompute them from the layer
    input (captured hidden states), which XLA-level rematerialization makes cheap.
    """
    from ..models.decoder import make_causal_mask
    from ..models.layers import apply_rope, repeat_kv, rms_norm, rope_cos_sin
    from ..models.lm import embed_tokens

    out = lvlm_forward(
        params, cfg, batch, capture_layer_inputs=True, **kwargs
    )
    h = out.decoder.layer_inputs[layer]  # [B,T,D]
    text = cfg.text
    lp = jax.tree.map(lambda a: a[layer], params["lm"]["decoder"]["layers"])
    x = rms_norm(h, lp["input_ln"], text.norm_eps)
    B, T, _ = x.shape
    H, Hkv, Dh = text.num_heads, text.num_kv_heads, text.head_size
    q = jnp.dot(x, lp["q_proj"])
    k = jnp.dot(x, lp["k_proj"])
    if "q_bias" in lp:
        q = q + lp["q_bias"]
        k = k + lp["k_bias"]
    q = q.reshape(B, T, H, Dh)
    k = k.reshape(B, T, Hkv, Dh)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    cos, sin = rope_cos_sin(positions, Dh, text.rope_theta, x.dtype)
    q, k = apply_rope(q, k, cos, sin)
    if text.qk_layernorm:
        q = rms_norm(q, lp["q_ln"], text.norm_eps)
        k = rms_norm(k, lp["k_ln"], text.norm_eps)
    k = repeat_kv(k, text.num_groups)
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores / (Dh**0.5)
    mask = make_causal_mask(batch.attention_mask, text.sliding_window)
    scores = jnp.where(mask, scores, -1e30)
    return jax.nn.softmax(scores, axis=-1)


@contextlib.contextmanager
def profile(log_dir: str):
    """``jax.profiler`` trace for TensorBoard (replaces ad-hoc timing)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
