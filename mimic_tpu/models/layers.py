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


def cached_attention(
    q: jnp.ndarray,        # [B,T,H,D] current queries
    k_new: jnp.ndarray,    # [B,T,Hkv,D] current keys (kv heads, not expanded)
    v_new: jnp.ndarray,    # [B,T,Hkv,D]
    cache_k: jnp.ndarray,  # [B,S,Hkv,D] read-only cache
    cache_v: jnp.ndarray,  # [B,S,Hkv,D]
    cache_len,             # scalar: number of written timeline slots
    key_mask: jnp.ndarray, # [B,S] slot validity over cache_k's region (padding)
    key_mask_new: jnp.ndarray,  # [B,T] validity of the current block's tokens
    scale: Optional[float] = None,
    prompt_k: Optional[jnp.ndarray] = None,  # [B0,Sp,Hkv,D] beam-shared prompt
    prompt_v: Optional[jnp.ndarray] = None,
    prompt_mask: Optional[jnp.ndarray] = None,  # [B0,Sp]
    window: Optional[int] = None,  # sliding-window size (Mistral), slot-indexed
    need_unmasked: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-part attention for autoregressive decode/prefill with a KV cache.

    The current block's keys are NOT written into the cache here (the caller
    appends them once, outside the layer scan) — the cache stays a read-only
    scan input, eliminating the full-cache copy per layer per step.  GQA is
    handled by grouped einsums (no materialized head expansion).

    Masks: cache part = slot < cache_len AND key_mask; current part = causal
    within the block AND key_mask_new.  Returns (out [B,T,H,D], lse [B,T,H],
    lse_unmasked [B,T,H]) where the unmasked variant spans exactly the written
    cache slots + current block, ignoring padding/causality (reference do_shift
    semantics — its live k tensor contains exactly those positions).

    Beam-shared prompt (``prompt_k/v/mask``, batch B0 = B/beams): the prompt
    region of a beam-search cache is identical across a row's beams (one
    prefill), so it is stored ONCE at batch B0 and the beams are folded into
    the query-group axis for its score/value einsums — the dominant per-step
    HBM read (prompt KV) drops by the beam factor.  ``cache_k/v`` then hold
    only the generated region and ``cache_len`` still counts the full timeline
    (prompt + generated); all prompt slots are written by construction.
    """
    B, T, H, D = q.shape
    S, Hkv = cache_k.shape[1], cache_k.shape[2]
    G = H // Hkv
    scale = scale if scale is not None else 1.0 / (D**0.5)
    # keep the cache in its storage dtype — casting it up would materialize a
    # full fp32 copy per layer; fp32 accumulation happens inside the einsum
    qg = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(B, T, Hkv, G, D)
    s_cache = jnp.einsum(
        "btkgd,bskd->bkgts", qg, cache_k, preferred_element_type=jnp.float32
    )  # [B,Hkv,G,T,S]
    s_new = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k_new.astype(cache_k.dtype),
        preferred_element_type=jnp.float32,
    )

    from ..ops.decode_attention import is_quantized_kv, prompt_kv_len

    gen_len = cache_len
    s_prompt = None
    quant_prompt = prompt_k is not None and is_quantized_kv(prompt_k)
    if quant_prompt:
        # int8 prompt KV (serving mode): the Pallas kernel below handles the
        # whole prompt region; only the thin generated/current parts run here
        from .decoder import ATTN_PATH_LOG

        ATTN_PATH_LOG.append("quant_kv")  # trace-time: tests assert the path ran
        if window is not None or need_unmasked:
            raise NotImplementedError(
                "int8 prompt KV supports plain causal decode only "
                "(no sliding window, no unmasked-lse shift consumer)"
            )
        Sp = prompt_kv_len(prompt_k)
        gen_len = cache_len - Sp
    elif prompt_k is not None:
        B0, Sp = prompt_k.shape[0], prompt_k.shape[1]
        Kb = B // B0
        gen_len = cache_len - Sp  # written slots within the generated region
        # fold beams into the group axis: prompt KV is read once per batch row
        qf = qg.reshape(B0, Kb, T, Hkv, G, D).transpose(0, 2, 3, 1, 4, 5)
        qf = qf.reshape(B0, T, Hkv, Kb * G, D)
        s_prompt = jnp.einsum(
            "btkgd,bskd->bkgts", qf, prompt_k.astype(cache_k.dtype),
            preferred_element_type=jnp.float32,
        )  # [B0,Hkv,Kb*G,T,Sp]

    slot = jnp.arange(S)[None, None, None, None, :]
    written = slot < gen_len
    cache_mask = written & key_mask[:, None, None, None, :].astype(bool)
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None, None]
    new_mask = causal & key_mask_new[:, None, None, None, :].astype(bool)
    if window is not None:
        # sliding window on timeline slot indices (HF Mistral semantics: query
        # at timeline position p attends keys at positions p' with p-p' < W).
        # Current-block query t sits at timeline position cache_len + t; a
        # gen-region cache slot s sits at prompt_len + s; a prompt slot at s.
        t_idx = jnp.arange(T)
        prompt_off = prompt_k.shape[1] if prompt_k is not None else 0
        q_pos = cache_len + t_idx  # [T]
        gen_pos = prompt_off + jnp.arange(S)  # [S]
        win_cache = (q_pos[:, None] - gen_pos[None, :]) < window  # [T,S]
        cache_mask = cache_mask & win_cache[None, None, None]
        win_new = (t_idx[:, None] - t_idx[None, :]) < window
        new_mask = new_mask & win_new[None, None, None]

    masked_cache = jnp.where(cache_mask, s_cache, NEG_INF)
    masked_new = jnp.where(new_mask, s_new, NEG_INF)

    if quant_prompt:
        # prompt region: one Pallas call streams the int8 KV and returns the
        # partial softmax triple; merge with the thin XLA parts by logsumexp
        from ..ops.decode_attention import prompt_attention_int8

        o_p, m_p, l_p = prompt_attention_int8(qg, prompt_k, prompt_v, prompt_mask)
        rest = jnp.concatenate([masked_cache, masked_new], axis=-1)  # [B,Hkv,G,T,S+T]
        m_r = jnp.max(rest, axis=-1)
        p_r = jnp.exp(rest - m_r[..., None])
        l_r = jnp.sum(p_r, axis=-1)
        p_r = p_r.astype(cache_v.dtype)
        o_r = jnp.einsum(
            "bkgts,bskd->bkgtd", p_r[..., :S], cache_v,
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bkgts,bskd->bkgtd", p_r[..., S:], v_new.astype(cache_v.dtype),
            preferred_element_type=jnp.float32,
        )
        m_tot = jnp.maximum(m_p, m_r)
        ap = jnp.exp(m_p - m_tot)
        ar = jnp.exp(m_r - m_tot)
        l_tot = jnp.maximum(l_p * ap + l_r * ar, 1e-30)
        o = o_p * ap[..., None] + o_r * ar[..., None]
        out = (
            (o / l_tot[..., None])
            .transpose(0, 3, 1, 2, 4)
            .reshape(B, T, H, D)
            .astype(q.dtype)
        )
        lse = jnp.transpose((m_tot + jnp.log(l_tot)).reshape(B, H, T), (0, 2, 1))
        return out, lse, lse

    parts = [masked_cache, masked_new]
    u_parts = (
        [jnp.where(written, s_cache, NEG_INF), s_new] if need_unmasked else None
    )
    if s_prompt is not None:
        unfold = lambda s: s.reshape(B0, Hkv, Kb, G, T, Sp).transpose(
            0, 2, 1, 3, 4, 5
        ).reshape(B, Hkv, G, T, Sp)
        s_prompt_b = unfold(s_prompt)
        pm = jnp.repeat(prompt_mask.astype(bool), Kb, axis=0)  # [B,Sp]
        pmask = pm[:, None, None, None, :]
        if window is not None:
            win_prompt = (
                (cache_len + jnp.arange(T))[:, None] - jnp.arange(Sp)[None, :]
            ) < window  # [T,Sp]
            pmask = pmask & win_prompt[None, None, None]
        parts.insert(0, jnp.where(pmask, s_prompt_b, NEG_INF))
        if need_unmasked:
            u_parts.insert(0, s_prompt_b)  # prompt slots are all written

    all_scores = jnp.concatenate(parts, axis=-1)
    lse = jax.nn.logsumexp(all_scores, axis=-1)  # [B,Hkv,G,T]
    p = jnp.exp(all_scores - lse[..., None]).astype(cache_v.dtype)
    out = jnp.zeros((B, T, Hkv, G, D), jnp.float32)
    off = 0
    if s_prompt is not None:
        # fold the prompt probabilities back to B0×(Kb·G) so prompt_v is read once
        p_pf = p[..., :Sp].reshape(B, Hkv, G, T, Sp).reshape(
            B0, Kb, Hkv, G, T, Sp
        ).transpose(0, 2, 1, 3, 4, 5).reshape(B0, Hkv, Kb * G, T, Sp)
        o_p = jnp.einsum(
            "bkgts,bskd->btkgd", p_pf, prompt_v.astype(cache_v.dtype),
            preferred_element_type=jnp.float32,
        )  # [B0,T,Hkv,Kb*G,D]
        o_p = o_p.reshape(B0, T, Hkv, Kb, G, D).transpose(0, 3, 1, 2, 4, 5)
        out = out + o_p.reshape(B, T, Hkv, G, D)
        off = Sp
    p_cache, p_new = p[..., off:off + S], p[..., off + S:]
    out = out + jnp.einsum(
        "bkgts,bskd->btkgd", p_cache, cache_v, preferred_element_type=jnp.float32
    )
    out = out + jnp.einsum(
        "bkgts,bskd->btkgd", p_new, v_new.astype(cache_v.dtype),
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(B, T, H, D).astype(q.dtype)

    # unmasked logsumexp over written slots + full current block — only when
    # a shift consumes it (MimIC log Z₂); the plain decode path skips the
    # second full reduce over every score part
    lse_u = (
        jax.nn.logsumexp(jnp.concatenate(u_parts, axis=-1), axis=-1)
        if need_unmasked
        else lse
    )

    def to_bth(x):
        return jnp.transpose(x.reshape(B, H, T), (0, 2, 1))

    return out, to_bth(lse), to_bth(lse_u)


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
    """LLaMA-family MLP: down(silu(gate(x)) * up(x)); weights stored [in, out].

    Weights may be int8-quantized dicts (``ops/quant.py``) — ``qdot`` dispatches.
    """
    from ..ops.quant import qdot

    gate = jax.nn.silu(qdot(x, gate_w))
    up = qdot(x, up_w)
    return qdot(gate * up, down_w)


def gelu_act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(f"Unknown activation {kind!r}")
