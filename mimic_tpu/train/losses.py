"""Training losses for the dual-pass objective (jitted, static shapes).

Numerical parity targets in the reference:

- layer-wise MSE / cosine (``src/shift_model.py:145-179``): per sample, the mean
  over (layers × selected tokens × dims) of the squared difference between the
  shift-pass and record-pass hidden states at *query* tokens; then mean over batch.
- LM cross-entropy (HF ``...ForConditionalGeneration`` with ``labels=input_ids``):
  next-token CE over positions whose shifted attention-mask is 1, mean over all
  selected positions in the batch.
- logits KL (``src/shift_model.py:181-191``): ``F.kl_div(log_softmax(shift),
  softmax(prefix), reduction="batchmean")`` over answer+EOS tokens.

Selected-token sets are passed as fixed-width ``(indices, valid)`` gathers computed
on the host (see ``masking.py``); all means are mask-weighted so the results equal
the reference's dynamic ``masked_select`` means.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def gather_tokens(x: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """x [..., B, T, D], indices [B, M] → [..., B, M, D] (supports leading L axis).

    Row selection runs as a one-hot matmul: TPU lowers broadcast
    ``take_along_axis`` to a serial gather loop (~70× slower at training shapes),
    while the one-hot contraction rides the MXU and is exact (a single nonzero
    term per output row)."""
    T = x.shape[-2]
    onehot = (indices[:, :, None] == jnp.arange(T)[None, None, :]).astype(x.dtype)
    if x.ndim == 4:  # [L,B,T,D]
        return jnp.einsum("bmt,lbtd->lbmd", onehot, x)
    return jnp.einsum("bmt,btd->bmd", onehot, x)


def layer_wise_mse(
    shift_hidden: jnp.ndarray,   # [L,B,T2,D]
    prefix_hidden: jnp.ndarray,  # [L,B,T1,D]
    shift_idx: jnp.ndarray,      # [B,M]
    prefix_idx: jnp.ndarray,     # [B,M]
    valid: jnp.ndarray,          # [B,M] (same counts in both passes by construction)
) -> jnp.ndarray:
    s = gather_tokens(shift_hidden, shift_idx).astype(jnp.float32)   # [L,B,M,D]
    p = gather_tokens(prefix_hidden, prefix_idx).astype(jnp.float32)
    sq = jnp.sum(jnp.square(s - p), axis=-1)                         # [L,B,M]
    sq = jnp.where(valid[None], sq, 0.0)
    per_sample = jnp.sum(sq, axis=(0, 2))                            # [B]
    L, _, _, D = s.shape
    counts = jnp.maximum(jnp.sum(valid, axis=1), 1)                  # [B]
    per_sample = per_sample / (L * counts * D)
    return jnp.mean(per_sample)


def layer_wise_cos(
    shift_hidden: jnp.ndarray,
    prefix_hidden: jnp.ndarray,
    shift_idx: jnp.ndarray,
    prefix_idx: jnp.ndarray,
    valid: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    s = gather_tokens(shift_hidden, shift_idx).astype(jnp.float32)
    p = gather_tokens(prefix_hidden, prefix_idx).astype(jnp.float32)
    dot = jnp.sum(s * p, axis=-1)
    ns = jnp.linalg.norm(s, axis=-1)
    np_ = jnp.linalg.norm(p, axis=-1)
    # torch.cosine_similarity clamps each norm at eps
    cos = dot / (jnp.maximum(ns, eps) * jnp.maximum(np_, eps))       # [L,B,M]
    cos = jnp.where(valid[None], cos, 0.0)
    counts = jnp.maximum(jnp.sum(valid, axis=1), 1)                  # [B]
    mean_t = jnp.sum(cos, axis=2) / counts[None]                     # [L,B]
    return jnp.mean(1.0 - mean_t)


def lm_cross_entropy(
    logits: jnp.ndarray,          # [B,T,V]
    labels: jnp.ndarray,          # [B,T]
    attention_mask: jnp.ndarray,  # [B,T] (pad-excluding, HF semantics)
) -> jnp.ndarray:
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    mask = attention_mask[:, 1:].astype(jnp.float32)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def logits_kl(
    shift_logits: jnp.ndarray,   # [B,T2,V]
    prefix_logits: jnp.ndarray,  # [B,T1,V]
    shift_idx: jnp.ndarray,      # [B,M] answer+EOS positions in the shift pass
    prefix_idx: jnp.ndarray,     # [B,M] answer+EOS positions in the record pass
    valid: jnp.ndarray,          # [B,M]
) -> jnp.ndarray:
    q = gather_tokens(shift_logits, shift_idx).astype(jnp.float32)   # [B,M,V]
    p = gather_tokens(prefix_logits, prefix_idx).astype(jnp.float32)
    log_q = jax.nn.log_softmax(q, axis=-1)
    log_p = jax.nn.log_softmax(p, axis=-1)
    p_prob = jnp.exp(log_p)
    kl = jnp.sum(p_prob * (log_p - log_q), axis=-1)                  # [B,M]
    kl = jnp.where(valid, kl, 0.0)
    # batchmean over gathered rows (the reference flattens selected tokens into the
    # batch dimension before kl_div)
    return jnp.sum(kl) / jnp.maximum(jnp.sum(valid), 1)
