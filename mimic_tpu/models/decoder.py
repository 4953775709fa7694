"""Functional decoder stack (LLaMA / Mistral / Qwen2 families + IDEFICS-1 cross-attn).

TPU-first design decisions:

- **Stacked layer parameters + ``lax.scan``**: every per-layer weight is stored with a
  leading ``[L, ...]`` axis and the layer loop is a single scanned XLA region —
  constant compile time in depth, natural sharding, and per-layer capture falls out
  as scan ``ys`` (replacing the reference's 32-40 Python forward hooks per step,
  ``src/shift_encoder.py:113-140``).
- **Explicit shift/capture**: the MimIC/LIVE shift parameters enter as scan inputs
  and per-layer attention/MLP block outputs exit as scan outputs; nothing is mutated.
- **logsumexp reuse**: attention returns its log-normalizer; the MimIC μ-gate
  consumes either that (``logz2="masked"``, the fused fast path) or an unmasked
  recompute matching the reference ``do_shift`` exactly (``logz2="unmasked"``,
  reference ``src/shift_encoder.py:697-703`` applies no mask).
- IDEFICS-1's gated cross-attention layers run as a grouped scan: layers are
  reshaped ``[L] → [G, K]`` (one cross-attn before each group of K self-attn
  layers, reference interval semantics).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..shift.functional import apply_attn_shift, apply_output_shift
from .config import TextConfig
from .layers import (
    apply_rope,
    repeat_kv,
    rms_norm,
    rope_cos_sin,
    sdpa_with_lse,
    swiglu_mlp,
    unmasked_lse,
)

Params = Dict[str, Any]


class DecoderOutput(NamedTuple):
    hidden: jnp.ndarray                      # [B,T,D] final hidden states (pre lm_head)
    attn_capture: Optional[jnp.ndarray]      # [L,B,T,D] self-attn block outputs
    ffn_capture: Optional[jnp.ndarray]       # [L,B,T,D] MLP block outputs
    kv_cache: Optional[Dict[str, jnp.ndarray]]
    layer_inputs: Optional[jnp.ndarray] = None  # [L,B,T,D] hidden state at layer entry


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _dense_init(key, shape, dtype, scale=0.02):
    return (jax.random.normal(key, shape) * scale).astype(dtype)


def init_decoder_params(cfg: TextConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    L, D, H, Hkv, Dh, F = (
        cfg.num_layers,
        cfg.hidden_size,
        cfg.num_heads,
        cfg.num_kv_heads,
        cfg.head_size,
        cfg.intermediate_size,
    )
    keys = iter(jax.random.split(key, 32))
    layers = {
        "input_ln": jnp.ones((L, D), dtype),
        "q_proj": _dense_init(next(keys), (L, D, H * Dh), dtype),
        "k_proj": _dense_init(next(keys), (L, D, Hkv * Dh), dtype),
        "v_proj": _dense_init(next(keys), (L, D, Hkv * Dh), dtype),
        "o_proj": _dense_init(next(keys), (L, H * Dh, D), dtype),
        "post_ln": jnp.ones((L, D), dtype),
        "gate_proj": _dense_init(next(keys), (L, D, F), dtype),
        "up_proj": _dense_init(next(keys), (L, D, F), dtype),
        "down_proj": _dense_init(next(keys), (L, F, D), dtype),
    }
    if cfg.attn_bias:
        layers["q_bias"] = jnp.zeros((L, H * Dh), dtype)
        layers["k_bias"] = jnp.zeros((L, Hkv * Dh), dtype)
        layers["v_bias"] = jnp.zeros((L, Hkv * Dh), dtype)
    if cfg.qk_layernorm:
        layers["q_ln"] = jnp.ones((L, Dh), dtype)
        layers["k_ln"] = jnp.ones((L, Dh), dtype)
    params: Params = {"layers": layers, "final_ln": jnp.ones((D,), dtype)}

    G = cfg.num_cross_layers
    if G:
        # gated cross-attention (IDEFICS-1): q from text, k/v from image states
        kv_dim = cfg.cross_kv_dim or D
        params["cross"] = {
            "input_ln": jnp.ones((G, D), dtype),
            "q_proj": _dense_init(next(keys), (G, D, H * Dh), dtype),
            "k_proj": _dense_init(next(keys), (G, kv_dim, Hkv * Dh), dtype),
            "v_proj": _dense_init(next(keys), (G, kv_dim, Hkv * Dh), dtype),
            "o_proj": _dense_init(next(keys), (G, H * Dh, D), dtype),
            "post_ln": jnp.ones((G, D), dtype),
            "gate_proj": _dense_init(next(keys), (G, D, F), dtype),
            "up_proj": _dense_init(next(keys), (G, D, F), dtype),
            "down_proj": _dense_init(next(keys), (G, F, D), dtype),
            "alpha_attn": jnp.zeros((G,), dtype),
            "alpha_dense": jnp.zeros((G,), dtype),
        }
        if cfg.cross_qk_layernorm:
            params["cross"]["q_ln"] = jnp.ones((G, Dh), dtype)
            params["cross"]["k_ln"] = jnp.ones((G, Dh), dtype)
    return params


def init_kv_cache(
    cfg: TextConfig, batch: int, max_len: int, dtype=jnp.float32
) -> Dict[str, jnp.ndarray]:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_size)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "length": jnp.zeros((), jnp.int32),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _lora_delta(
    ad: Params, name: str, x: jnp.ndarray, scaling, drop_key=None, drop_rate: float = 0.0
) -> Optional[jnp.ndarray]:
    """LoRA low-rank delta: scaling · B(A(dropout(x))) for one projection, or None
    (dropout on the adapter input only, peft semantics)."""
    a, b = ad.get(f"{name}_a"), ad.get(f"{name}_b")
    if a is None:
        return None
    if drop_key is not None and drop_rate > 0.0:
        keep = jax.random.bernoulli(drop_key, 1.0 - drop_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - drop_rate), 0.0).astype(x.dtype)
    # adapter math runs in the adapter dtype (fp32 trainables over a bf16 frozen
    # tower); the delta re-enters the activation dtype so residual streams and
    # the layer-scan carry keep the model dtype
    return (scaling * jnp.dot(jnp.dot(x, a), b)).astype(x.dtype)


def _project_qkv(
    lp: Params, ad: Params, x: jnp.ndarray, cfg: TextConfig, scaling,
    drop_keys=None, drop_rate: float = 0.0,
):
    from ..ops.quant import qdot

    B, T, _ = x.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    if "qkv_proj" in lp:
        # int8 serving copy fuses q/k/v into one kernel call (decode matmuls are
        # per-call-overhead bound at small transfer sizes; see ops/quant.py)
        qkv = qdot(x, lp["qkv_proj"])
        q = qkv[..., : H * Dh]
        k = qkv[..., H * Dh : (H + Hkv) * Dh]
        v = qkv[..., (H + Hkv) * Dh :]
    else:
        q = qdot(x, lp["q_proj"])
        k = qdot(x, lp["k_proj"])
        v = qdot(x, lp["v_proj"])
    if "q_bias" in lp:
        q = q + lp["q_bias"]
        k = k + lp["k_bias"]
        v = v + lp["v_bias"]
    dk_ = lambda i: None if drop_keys is None else drop_keys[i]
    dq = _lora_delta(ad, "q", x, scaling, dk_(0), drop_rate)
    dk = _lora_delta(ad, "k", x, scaling, dk_(1), drop_rate)
    dv = _lora_delta(ad, "v", x, scaling, dk_(2), drop_rate)
    if dq is not None:
        q = q + dq
    if dk is not None:
        k = k + dk
    if dv is not None:
        v = v + dv
    return (
        q.reshape(B, T, H, Dh),
        k.reshape(B, T, Hkv, Dh),
        v.reshape(B, T, Hkv, Dh),
    )


def _self_attention(
    lp: Params,
    ls: Params,
    ad: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    cfg: TextConfig,
    cache_k: Optional[jnp.ndarray],
    cache_v: Optional[jnp.ndarray],
    cache_len,
    multi_head: bool,
    logz2: str,
    lora_scaling,
    key_mask: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    drop_keys=None,
    drop_rate: float = 0.0,
    prompt_k: Optional[jnp.ndarray] = None,
    prompt_v: Optional[jnp.ndarray] = None,
    prompt_mask: Optional[jnp.ndarray] = None,
    ring: Optional[Tuple[Any, str, Optional[str]]] = None,  # (mesh, seq_axis, batch_axis)
    prefix_merge_len: int = 0,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Returns (attn block output [B,T,D], new_k_block, new_v_block).

    With a cache, the cache refs stay READ-ONLY: attention runs in two parts
    (cache + current block, ``cached_attention``) and the new k/v blocks are
    returned for a single post-scan cache append — no full-cache copy per layer.
    ``prompt_k/v/mask``: beam-shared prompt region at batch B/beams (see
    ``cached_attention``); ``key_mask`` stays full-timeline and is split here.

    ``prefix_merge_len`` (static, P>0 = the prefix-tuning prefill path): the
    cache holds ONLY the P virtual prefix slots at [0, P) (always attendable
    by construction).  The prompt block then attends causally over itself via
    the cacheless machinery (flash-eligible — no [B,Hkv,G,T,S] score tensor)
    and the tiny prefix part is merged in by logsumexp combination.
    """
    B, T, _ = x.shape
    q, k, v = _project_qkv(lp, ad, x, cfg, lora_scaling, drop_keys, drop_rate)
    q, k = apply_rope(q, k, cos, sin)
    if cfg.qk_layernorm:
        q = rms_norm(q, lp["q_ln"], cfg.norm_eps)
        k = rms_norm(k, lp["k_ln"], cfg.norm_eps)

    if cache_k is not None and prefix_merge_len:
        P = prefix_merge_len
        G = cfg.num_groups
        need_unmasked = bool(ls) and logz2 == "unmasked"
        key_mask_new = jax.lax.dynamic_slice(key_mask, (0, cache_len), (B, T))
        if use_flash:
            from ..ops.flash_attention import (
                DEFAULT_BK, DEFAULT_BQ, flash_attention_diff,
            )

            attn_f, lse_f, lse_u_f = flash_attention_diff(
                q, k, v, key_mask_new, True, None, DEFAULT_BQ, DEFAULT_BK,
                need_unmasked, False,
            )
        else:
            causal = jnp.tril(jnp.ones((T, T), bool))
            mask2 = causal[None, None] & (key_mask_new > 0)[:, None, None, :]
            k_rep, v_rep = repeat_kv(k, G), repeat_kv(v, G)
            attn_f, lse_f = sdpa_with_lse(q, k_rep, v_rep, mask2)
            lse_u_f = unmasked_lse(q, k_rep) if need_unmasked else None
        # prefix part: static slice of the cache's first P slots, no mask
        pk_ = jax.lax.slice_in_dim(cache_k, 0, P, axis=1)
        pv_ = jax.lax.slice_in_dim(cache_v, 0, P, axis=1)
        attn_p, lse_p = sdpa_with_lse(
            q, repeat_kv(pk_, G), repeat_kv(pv_, G), None
        )
        # logsumexp-combine the two normalized parts (f32 for stability)
        m = jnp.maximum(lse_f, lse_p)
        wf = jnp.exp(lse_f - m)
        wp = jnp.exp(lse_p - m)
        denom = wf + wp
        attn = (
            attn_f.astype(jnp.float32) * (wf / denom)[..., None]
            + attn_p.astype(jnp.float32) * (wp / denom)[..., None]
        ).astype(q.dtype)
        lse = m + jnp.log(denom)
        if ls:
            if logz2 == "masked":
                log_z2 = lse
            else:
                mu_ = jnp.maximum(lse_u_f, lse_p)
                log_z2 = mu_ + jnp.log(
                    jnp.exp(lse_u_f - mu_) + jnp.exp(lse_p - mu_)
                )
            attn = apply_attn_shift(ls, q, log_z2, attn, multi_head)
        attn_flat = attn.reshape(B, T, -1)
        from ..ops.quant import qdot

        out = qdot(attn_flat, lp["o_proj"])
        do = _lora_delta(
            ad, "o", attn_flat, lora_scaling,
            None if drop_keys is None else drop_keys[3], drop_rate,
        )
        if do is not None:
            out = out + do
        return out, k, v

    if cache_k is not None:
        from .layers import cached_attention

        key_mask_new = jax.lax.dynamic_slice(
            key_mask, (0, cache_len), (B, T)
        )
        gen_key_mask = key_mask
        if prompt_k is not None:
            from ..ops.decode_attention import prompt_kv_len

            gen_key_mask = key_mask[:, prompt_kv_len(prompt_k):]
        # serve slots carry one extra mask column for the current token (their
        # timeline is cache capacity + 1); attention over the cache region only
        # reads the first S columns
        gen_key_mask = gen_key_mask[:, : cache_k.shape[1]]
        attn, lse, lse_u = cached_attention(
            q, k, v, cache_k, cache_v, cache_len, gen_key_mask, key_mask_new,
            prompt_k=prompt_k, prompt_v=prompt_v, prompt_mask=prompt_mask,
            window=cfg.sliding_window,
            # the second full reduce over every score part only matters when a
            # shift consumes log Z₂ — the plain decode path skips it
            need_unmasked=bool(ls) and logz2 == "unmasked",
        )
        if ls:
            log_z2 = lse if logz2 == "masked" else lse_u
            attn = apply_attn_shift(ls, q, log_z2, attn, multi_head)
        attn_flat = attn.reshape(B, T, -1)
        from ..ops.quant import qdot

        out = qdot(attn_flat, lp["o_proj"])
        do = _lora_delta(
            ad, "o", attn_flat, lora_scaling,
            None if drop_keys is None else drop_keys[3], drop_rate,
        )
        if do is not None:
            out = out + do
        return out, k, v

    k_all, v_all = k, v

    if ring is not None:
        # sequence-parallel exact attention: Q stays local, K/V blocks rotate
        # around the mesh axis via ppermute (ICI); same (out, lse, lse_u)
        # contract as the flash kernel — the MimIC μ-gate works under SP
        from ..ops.ring_attention import ring_attention_sharded

        mesh_, seq_axis, batch_axis = ring
        attn, lse, lse_u = ring_attention_sharded(
            mesh_, q, k_all, v_all, key_mask,
            axis_name=seq_axis, causal=True,
            need_unmasked=bool(ls) and logz2 == "unmasked",
            batch_axis=batch_axis,
        )
        if ls:
            log_z2 = lse if logz2 == "masked" else lse_u
            attn = apply_attn_shift(ls, q, log_z2, attn, multi_head)
    elif use_flash:
        # Pallas fused path: causal + key-padding handled in-kernel; both the
        # masked lse and the reference-parity unmasked logsumexp come out free
        from ..ops.flash_attention import DEFAULT_BK, DEFAULT_BQ, flash_attention_diff

        need_unmasked = bool(ls) and logz2 == "unmasked"
        # custom_vjp requires positional args
        attn, lse, lse_u = flash_attention_diff(
            q, k_all, v_all, key_mask, True, None, DEFAULT_BQ, DEFAULT_BK,
            need_unmasked, False,
        )
        if ls:
            log_z2 = lse if logz2 == "masked" else lse_u
            attn = apply_attn_shift(ls, q, log_z2, attn, multi_head)
    else:
        k_rep = repeat_kv(k_all, cfg.num_groups)
        v_rep = repeat_kv(v_all, cfg.num_groups)
        attn, lse = sdpa_with_lse(q, k_rep, v_rep, mask)

        if ls:
            log_z2 = lse if logz2 == "masked" else unmasked_lse(q, k_rep)
            attn = apply_attn_shift(ls, q, log_z2, attn, multi_head)

    attn_flat = attn.reshape(B, T, -1)
    from ..ops.quant import qdot

    out = qdot(attn_flat, lp["o_proj"])
    do = _lora_delta(
        ad, "o", attn_flat, lora_scaling,
        None if drop_keys is None else drop_keys[3], drop_rate,
    )
    if do is not None:
        out = out + do
    return out, k, v


def _cross_attention(
    cp: Params,
    x: jnp.ndarray,
    cross_states: jnp.ndarray,
    cross_mask: Optional[jnp.ndarray],
    cfg: TextConfig,
) -> jnp.ndarray:
    """IDEFICS-1 gated cross-attention + gated MLP for one cross layer."""
    from ..ops.quant import qdot

    B, T, _ = x.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    residual = x
    h = rms_norm(x, cp["input_ln"], cfg.norm_eps)
    q = qdot(h, cp["q_proj"]).reshape(B, T, H, Dh)
    S = cross_states.shape[1]
    k = qdot(cross_states, cp["k_proj"]).reshape(B, S, Hkv, Dh)
    v = qdot(cross_states, cp["v_proj"]).reshape(B, S, Hkv, Dh)
    if cfg.cross_qk_layernorm:
        q = rms_norm(q, cp["q_ln"], cfg.norm_eps)
        k = rms_norm(k, cp["k_ln"], cfg.norm_eps)
    attn, _ = sdpa_with_lse(q, repeat_kv(k, cfg.num_groups), repeat_kv(v, cfg.num_groups), cross_mask)
    attn_out = qdot(attn.reshape(B, T, -1), cp["o_proj"])
    h = residual + jnp.tanh(cp["alpha_attn"]).astype(x.dtype) * attn_out
    residual = h
    m = rms_norm(h, cp["post_ln"], cfg.norm_eps)
    mlp_out = swiglu_mlp(m, cp["gate_proj"], cp["up_proj"], cp["down_proj"])
    return residual + jnp.tanh(cp["alpha_dense"]).astype(x.dtype) * mlp_out


def decoder_forward(
    params: Params,
    cfg: TextConfig,
    input_embeds: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray],
    position_ids: jnp.ndarray,
    *,
    shift: Optional[Params] = None,
    adapters: Optional[Params] = None,
    lora_scaling: float = 1.0,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    multi_head: bool = True,
    capture_attn: bool = False,
    capture_ffn: bool = False,
    capture_gather_idx: Optional[jnp.ndarray] = None,
    kv_cache: Optional[Dict[str, jnp.ndarray]] = None,
    cross_states: Optional[jnp.ndarray] = None,
    cross_mask: Optional[jnp.ndarray] = None,
    logz2: str = "unmasked",
    key_mask: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    ring_mesh: Any = None,
    ring_axis: str = "sp",
    ring_batch_axis: Optional[str] = None,
    ring_min_len: int = 0,
    capture_layer_inputs: bool = False,
    perturb_attn: Optional[jnp.ndarray] = None,
    perturb_ffn: Optional[jnp.ndarray] = None,
    remat: bool = False,
    cache_empty: bool = False,
    cache_write_pos: Optional[jnp.ndarray] = None,
    prefix_flash_len: int = 0,
) -> DecoderOutput:
    """Run the decoder stack.

    attn_mask: [B,1,T,S] boolean (True = attend) over cached+current keys, or None.
    position_ids: [B,T] absolute positions for RoPE.
    shift: stacked shift pytree ([L, ...] leaves) or None.
    attn_impl: "xla" or "flash" — the Pallas fused kernel is used when "flash" is
    requested, there is no KV cache, a 2D ``key_mask`` is given, and shapes are
    block-aligned (caller guarantees the mask is causal+key-padding form).
    """
    B, T, D = input_embeds.shape
    cos, sin = rope_cos_sin(position_ids, cfg.head_size, cfg.rope_theta, input_embeds.dtype)

    shift = shift or {}
    # split shift keys by where they apply
    attn_shift_keys = ("attn_v", "attn_logz1_w", "attn_logz1_b")
    layer_shift = {k: v for k, v in shift.items() if k in attn_shift_keys}
    out_shift = {k: v for k, v in shift.items() if k not in attn_shift_keys}

    use_cache = kv_cache is not None
    cache_len = kv_cache["length"] if use_cache else jnp.zeros((), jnp.int32)
    has_prompt = use_cache and "prompt_k" in kv_cache
    from ..ops.decode_attention import is_quantized_kv, prompt_kv_len

    prompt_quant = has_prompt and is_quantized_kv(kv_cache["prompt_k"])
    prompt_len = prompt_kv_len(kv_cache["prompt_k"]) if has_prompt else 0
    if use_cache and key_mask is None:
        key_mask = jnp.ones((B, prompt_len + kv_cache["k"].shape[2]), jnp.int32)
    prompt_mask = None
    if has_prompt:
        # per-beam rows of the full-timeline mask are identical within a batch
        # row's beam group (one prefill, tiled) — reduce to B0 rows once
        B0 = (
            kv_cache["prompt_k"]["q8"].shape[1]
            if prompt_quant
            else kv_cache["prompt_k"].shape[1]
        )
        prompt_mask = key_mask[:, :prompt_len].reshape(B0, B // B0, prompt_len)[:, 0]
    # cache_empty (static hint from prefill): attention only needs the current
    # block — run the no-cache path (flash-eligible) and just append k/v after
    attend_cacheless = not use_cache or cache_empty
    # prefix-tuning prefill (cache holds ONLY the P virtual slots): the block
    # attends itself cachelessly (flash-eligible) + a logsumexp-merged prefix
    # part — avoids cached_attention's [B,Hkv,G,T,S] f32 score tensor at
    # multi-thousand-token prompts
    prefix_merge = (
        prefix_flash_len > 0
        and use_cache
        and not cache_empty
        and not has_prompt
        and T > 1
        and cfg.sliding_window is None
    )
    selected = select_attn_path(
        cfg, attn_impl, T,
        cacheless=attend_cacheless or prefix_merge,
        has_key_mask=key_mask is not None,
        ring_mesh=ring_mesh, ring_axis=ring_axis, ring_min_len=ring_min_len,
    )
    if prefix_merge and selected == "ring":
        selected = "xla"  # ring has no prefix-merge contract
    ATTN_PATH_LOG.append(selected + "+prefix" if prefix_merge else selected)
    use_flash = selected == "flash"
    ring = (
        (ring_mesh, ring_axis, ring_batch_axis) if selected == "ring" else None
    )

    use_dropout = (
        dropout_rng is not None and lora_dropout > 0.0 and adapters is not None
    )

    def layer_step(h, xs):
        lp, ls, os_, ad, pa, pf, dkeys, ck, cv, pk, pv = xs
        layer_in = h
        residual = h
        hn = rms_norm(h, lp["input_ln"], cfg.norm_eps)
        attn_out, k_new, v_new = _self_attention(
            lp, ls, ad, hn, cos, sin, attn_mask, cfg,
            None if attend_cacheless else ck,
            None if attend_cacheless else cv,
            cache_len,
            multi_head, logz2, lora_scaling,
            key_mask=key_mask if not (use_cache and cache_empty) else key_mask[:, :T],
            use_flash=use_flash,
            drop_keys=dkeys, drop_rate=lora_dropout if use_dropout else 0.0,
            prompt_k=pk, prompt_v=pv, prompt_mask=prompt_mask,
            ring=ring,
            prefix_merge_len=prefix_flash_len if prefix_merge else 0,
        )
        attn_out = apply_output_shift(
            attn_out, os_.get("attn_out_shift"), os_.get("attn_out_scale")
        )
        if pa is not None:
            attn_out = attn_out + pa.astype(attn_out.dtype)
        h = residual + attn_out
        residual = h
        hn = rms_norm(h, lp["post_ln"], cfg.norm_eps)
        if "gateup_proj" in lp:
            from ..ops.quant import fused_mlp, qdot

            # decode-sized M on TPU: the whole SwiGLU MLP in one Pallas call
            # (gate/up/down blocks stream once; no [M,2F] HBM round trip)
            ffn_out = fused_mlp(hn, lp["gateup_proj"], lp["down_proj"])
            if ffn_out is None:
                gu = qdot(hn, lp["gateup_proj"])
                F = gu.shape[-1] // 2
                ffn_out = qdot(
                    jax.nn.silu(gu[..., :F]) * gu[..., F:], lp["down_proj"]
                )
        else:
            ffn_out = swiglu_mlp(hn, lp["gate_proj"], lp["up_proj"], lp["down_proj"])
        ffn_out = apply_output_shift(ffn_out, os_.get("ffn_shift"), os_.get("ffn_scale"))
        if pf is not None:
            ffn_out = ffn_out + pf.astype(ffn_out.dtype)
        h = residual + ffn_out
        ys = {}

        def _cap(x):
            # capture only the selected token rows when a gather index is given —
            # at 8B/4k-context scale the full [L,B,T,D] streams would cost
            # gigabytes of HBM; the loss only reads ~M query tokens per sample.
            # The row selection runs as a one-hot matmul, not take_along_axis:
            # TPU lowers batched gathers to a serial scatter loop (~70× slower
            # measured at [2,2048,2048]×128 rows), while the one-hot contraction
            # rides the MXU and is exact (single nonzero term per output row).
            if capture_gather_idx is None:
                return x
            onehot = (
                capture_gather_idx[:, :, None] == jnp.arange(x.shape[1])[None, None, :]
            ).astype(x.dtype)
            return jnp.einsum("bmt,btd->bmd", onehot, x)

        if capture_attn:
            ys["attn"] = _cap(attn_out)
        if capture_ffn:
            ys["ffn"] = _cap(ffn_out)
        if capture_layer_inputs:
            ys["layer_in"] = layer_in
        if use_cache:
            ys["k"] = k_new
            ys["v"] = v_new
        return h, ys

    layers = params["layers"]
    ls_stack = layer_shift if layer_shift else None
    os_stack = out_shift if out_shift else None
    ad_stack = adapters if adapters else None
    dk_full = None
    if dropout_rng is not None and lora_dropout > 0.0 and ad_stack is not None:
        # 4 independent dropout masks per layer (q/k/v/o adapter inputs)
        dk_full = jax.random.split(dropout_rng, cfg.num_layers * 4).reshape(
            cfg.num_layers, 4, 2
        )

    def scan_layers(
        h, lp_stack, ls, os_, ad, pa, pf, dk_stack, ck, cv, pk=None, pv=None,
        layer_offset: int = 0,
    ):
        """Scan over a stack of self-attn layers; returns (h, ys_stacked).

        Absent optional inputs (shift pytrees, caches) are replaced by tiny dummy
        arrays so every scan xs leaf has the same leading axis; static flags decide
        which inputs the step actually reads.

        Int8-quantized weights (``ops/quant.py`` dicts) are NOT threaded through
        the scan xs — a dynamic slice feeding an opaque Pallas call would
        materialize a per-layer HBM copy.  Instead the full stacked int8 arrays
        stay closure-captured and the scan carries only the layer index; ``qdot``
        reads blocks straight out of the stack (scalar-prefetch index map).
        """
        from ..ops.quant import is_quantized

        lp_plain = {k: v for k, v in lp_stack.items() if not is_quantized(v)}
        lp_quant = {k: v for k, v in lp_stack.items() if is_quantized(v)}
        n = jax.tree.leaves(lp_plain)[0].shape[0]
        idx = jnp.arange(layer_offset, layer_offset + n, dtype=jnp.int32)
        dummy = jnp.zeros((n, 1))
        has_ls, has_os, has_ad = ls is not None, os_ is not None, ad is not None
        has_pa, has_pf = pa is not None, pf is not None
        # int8-quantized prompt KV stays closure-captured like quantized
        # weights (a scan-xs dynamic slice feeding a Pallas call would
        # materialize a per-layer HBM copy); the kernel indexes the stacked
        # arrays with the carried layer index instead
        thread_prompt = has_prompt and not prompt_quant
        dkeys = dk_stack
        xs = (
            lp_plain,
            idx,
            ls if has_ls else dummy,
            os_ if has_os else dummy,
            ad if has_ad else dummy,
            pa if has_pa else dummy,
            pf if has_pf else dummy,
            dkeys if dkeys is not None else dummy,
            ck if use_cache else dummy,
            cv if use_cache else dummy,
            pk if thread_prompt else dummy,
            pv if thread_prompt else dummy,
        )

        def step(h, xs_):
            lp, idx_, ls_, os__, ad_, pa_, pf_, dk__, ck_, cv_, pk_, pv_ = xs_
            if lp_quant:
                lp = dict(lp)
                for name, qw in lp_quant.items():
                    lp[name] = dict(qw, layer=idx_)
            if prompt_quant:
                pk_arg = dict(kv_cache["prompt_k"], layer=idx_)
                pv_arg = dict(kv_cache["prompt_v"], layer=idx_)
            else:
                pk_arg = pk_ if thread_prompt else None
                pv_arg = pv_ if thread_prompt else None
            return layer_step(
                h,
                (
                    lp,
                    ls_ if has_ls else {},
                    os__ if has_os else {},
                    ad_ if has_ad else {},
                    pa_ if has_pa else None,
                    pf_ if has_pf else None,
                    dk__ if dkeys is not None else None,
                    ck_ if use_cache else None,
                    cv_ if use_cache else None,
                    pk_arg,
                    pv_arg,
                ),
            )

        if remat:
            # trade FLOPs for HBM: recompute layer internals in the backward pass
            # (the reference leans on ZeRO-offload + fp16 to fit long contexts;
            # rematerialization is the TPU-native lever)
            step = jax.checkpoint(step)
        return jax.lax.scan(step, h, xs)

    h = input_embeds
    ck_stack = kv_cache["k"] if use_cache else None
    cv_stack = kv_cache["v"] if use_cache else None
    thread_prompt = has_prompt and not prompt_quant
    pk_stack = kv_cache["prompt_k"] if thread_prompt else None
    pv_stack = kv_cache["prompt_v"] if thread_prompt else None

    if cfg.cross_attn_interval:
        # grouped execution: cross-attn g, then K self layers, for each group g
        K = cfg.cross_attn_interval
        G = cfg.num_cross_layers
        ys_groups = []
        from ..ops.quant import is_quantized

        for g in range(G):
            cp = jax.tree.map(lambda a: a[g], params["cross"])
            if cross_states is not None:
                h = _cross_attention(cp, h, cross_states, cross_mask, cfg)
            lo, hi = g * K, (g + 1) * K
            sl = lambda t: jax.tree.map(lambda a: a[lo:hi], t)
            # quantized stacks stay whole (scan carries indices lo..hi instead)
            sl_layers = {
                k: (v if is_quantized(v) else v[lo:hi]) for k, v in layers.items()
            }
            h, ys = scan_layers(
                h,
                sl_layers,
                sl(ls_stack) if ls_stack else None,
                sl(os_stack) if os_stack else None,
                sl(ad_stack) if ad_stack else None,
                perturb_attn[lo:hi] if perturb_attn is not None else None,
                perturb_ffn[lo:hi] if perturb_ffn is not None else None,
                dk_full[lo:hi] if dk_full is not None else None,
                ck_stack[lo:hi] if use_cache else None,
                cv_stack[lo:hi] if use_cache else None,
                pk_stack[lo:hi] if thread_prompt else None,
                pv_stack[lo:hi] if thread_prompt else None,
                layer_offset=lo,
            )
            ys_groups.append(ys)
        ys = jax.tree.map(lambda *a: jnp.concatenate(a, axis=0), *ys_groups)
    else:
        h, ys = scan_layers(
            h, layers, ls_stack, os_stack, ad_stack, perturb_attn, perturb_ffn,
            dk_full, ck_stack, cv_stack, pk_stack, pv_stack,
        )

    h = rms_norm(h, params["final_ln"], cfg.norm_eps)

    new_cache = None
    if use_cache and cache_write_pos is not None:
        # per-row write positions (continuous-batching serve slots: every slot
        # sits at its own sequence length); T must be 1.  A B-row scatter of
        # [L,B,Hkv,Dh] — a few MB, nothing like the full-cache copies the
        # per-layer approach would cost.
        idx_b = jnp.arange(B)
        new_k = kv_cache["k"].at[:, idx_b, cache_write_pos].set(
            ys["k"][:, :, 0].astype(kv_cache["k"].dtype)
        )
        new_v = kv_cache["v"].at[:, idx_b, cache_write_pos].set(
            ys["v"][:, :, 0].astype(kv_cache["v"].dtype)
        )
        new_cache = {"k": new_k, "v": new_v, "length": cache_len}
    elif use_cache:
        # single append of all layers' new k/v blocks ([L,B,T,Hkv,Dh]) into the
        # carried cache — the per-layer full-cache copies are gone.  With a
        # beam-shared prompt region, "k"/"v" hold only the generated slots, so
        # the write lands at (timeline length − prompt length).
        write_at = cache_len - prompt_len
        new_k = jax.lax.dynamic_update_slice(
            kv_cache["k"], ys["k"].astype(kv_cache["k"].dtype), (0, 0, write_at, 0, 0)
        )
        new_v = jax.lax.dynamic_update_slice(
            kv_cache["v"], ys["v"].astype(kv_cache["v"].dtype), (0, 0, write_at, 0, 0)
        )
        new_cache = {"k": new_k, "v": new_v, "length": cache_len + T}
        if has_prompt:
            new_cache["prompt_k"] = kv_cache["prompt_k"]
            new_cache["prompt_v"] = kv_cache["prompt_v"]
    return DecoderOutput(
        hidden=h,
        attn_capture=ys.get("attn") if capture_attn else None,
        ffn_capture=ys.get("ffn") if capture_ffn else None,
        kv_cache=new_cache,
        layer_inputs=ys.get("layer_in") if capture_layer_inputs else None,
    )


# ---------------------------------------------------------------------------
# attention path selection
# ---------------------------------------------------------------------------

# trace-time log of the attention path each decoder_forward trace selected —
# tests assert which implementation actually ran (the flash kernel silently
# falls back to XLA for e.g. head_size not a lane multiple; that fallback must
# be visible, not inferred)
ATTN_PATH_LOG: list = []


def select_attn_path(
    cfg: TextConfig,
    attn_impl: str,
    T: int,
    *,
    cacheless: bool,
    has_key_mask: bool,
    ring_mesh: Any = None,
    ring_axis: str = "sp",
    ring_min_len: int = 0,
) -> str:
    """Which attention implementation a decoder_forward trace will use.

    - ``"flash"``: the Pallas fused kernel — cacheless, 2D key mask present,
      block-aligned T, lane-aligned head size, and no sliding window narrower
      than the block (the kernel masks causal+padding only).
    - ``"ring"``: sequence-parallel ppermute ring over ``ring_axis`` — long
      cacheless sequences whose length divides the mesh axis (record pass of a
      >32-shot MimIC step); short passes stay single-device.
    - ``"cached"``: the two-part read-only-cache path (decode steps).
    - ``"xla"``: plain masked sdpa.
    """
    if not cacheless:
        return "cached"
    if (
        attn_impl == "flash"
        and has_key_mask
        and T % 128 == 0
        and cfg.head_size % 128 == 0
        and (cfg.sliding_window is None or T <= cfg.sliding_window)
    ):
        return "flash"
    if (
        attn_impl == "ring"
        and has_key_mask
        and ring_mesh is not None
        and cfg.sliding_window is None
    ):
        n_sp = dict(zip(ring_mesh.axis_names, ring_mesh.devices.shape))[ring_axis]
        if T % n_sp == 0 and T >= max(ring_min_len, n_sp):
            return "ring"
    return "xla"


# ---------------------------------------------------------------------------
# masks / positions helpers
# ---------------------------------------------------------------------------


def make_causal_mask(
    attention_mask: jnp.ndarray, sliding_window: Optional[int] = None
) -> jnp.ndarray:
    """[B,T] padding mask → [B,1,T,T] causal+padding boolean mask (True=attend).

    ``sliding_window``: Mistral-style local attention — query at slot t attends
    only to keys at slots s with ``t - s < window`` (HF semantics: the window
    is counted on padded-sequence slot indices, reference
    ``src/shift_encoder.py:514-523`` passes ``sliding_window`` to SDPA).
    """
    B, T = attention_mask.shape
    causal = jnp.tril(jnp.ones((T, T), bool))
    if sliding_window is not None:
        idx = jnp.arange(T)
        causal = causal & ((idx[:, None] - idx[None, :]) < sliding_window)
    key_ok = attention_mask[:, None, None, :].astype(bool)
    return causal[None, None] & key_ok


def make_decode_mask(attention_mask: jnp.ndarray, total_len: int) -> jnp.ndarray:
    """[B,S_valid-ish] running key mask → [B,1,1,S] mask for single-token decode."""
    B = attention_mask.shape[0]
    pad = total_len - attention_mask.shape[1]
    if pad > 0:
        attention_mask = jnp.pad(attention_mask, ((0, 0), (0, pad)))
    return attention_mask[:, None, None, :].astype(bool)


def positions_from_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """HF-style position ids for left/right padded batches:
    cumsum(mask) - 1, clamped to 0 at pad positions."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)
