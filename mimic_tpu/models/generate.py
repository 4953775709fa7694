"""Autoregressive generation: greedy and beam search.

Parity targets (reference ``src/config/eval.yaml:13-16``): ``num_beams=3``,
``length_penalty=0.0``, ``max_new_tokens`` 10/20; HF semantics for beam
bookkeeping (score = Σ logprob / len^length_penalty, early_stopping=False).

The whole decode loop is a single ``lax.scan`` over steps — one compilation per
(batch, prompt_len, max_new_tokens) bucket.  Prompts must be **left-padded** so the
last prompt position is aligned across the batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .decoder import init_kv_cache
from .lvlm import LVLMBatch, encode_images, lvlm_forward

NEG = -1.0e9


def _param_dtype(params):
    """Model compute dtype: the first floating-point leaf (int8-quantized weight
    tables and their scales don't define the KV-cache/activation dtype)."""
    for leaf in jax.tree.leaves(params):
        if jnp.issubdtype(leaf.dtype, jnp.floating) and leaf.dtype != jnp.float32:
            return leaf.dtype
    return jnp.float32


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_new_tokens], pad-filled after EOS
    scores: jnp.ndarray  # [B] sequence scores (beam) or 0.0 (greedy)


def _prefill(params, cfg, batch: LVLMBatch, total_len: int, shift, adapters, lora_scaling, logz2, dtype, attn_impl="xla", prefix=None, image_feats=None):
    """Run the prompt through the model, returning (last_logits, cache, state).

    ``prefix``: prefix-tuning virtual KV ({"k","v"} [L,P,Hkv,Dh], see
    ``shift/prefix.py``) — pre-written into cache slots [0, P); the prompt then
    prefills through the cached two-part attention (every prompt token attends
    the prefix) instead of the cache-empty fast path.  ``total_len`` includes P.

    The prefix path prefills through the cacheless machinery (flash-eligible)
    with the P virtual slots merged in by logsumexp combination
    (``decoder.py`` ``prefix_merge``) — no [B,Hkv,G,T,S] f32 score tensor even
    at multi-thousand-token prompts.

    ``image_feats``: precomputed encoded image features [B, N*S, D] (e.g. from
    ``feature_cache.VisionFeatureCache``) — skips the vision tower.
    """
    B, T = batch.input_ids.shape
    if image_feats is None and batch.pixel_values is not None:
        image_feats = encode_images(
            params, cfg, batch.pixel_values, batch.patch_mask, attn_impl=attn_impl
        )
    if prefix is None:
        cache = init_kv_cache(cfg.text, B, total_len, dtype)
        extra = dict(kv_cache=cache, cache_empty=True)
    else:
        from ..shift.prefix import prefix_forward_args

        P = prefix["k"].shape[1]
        batch, pos, cache, _ = prefix_forward_args(
            prefix, batch, dtype, extra_len=total_len - P - T
        )
        extra = dict(kv_cache=cache, position_ids=pos, prefix_flash_len=P)
    out = lvlm_forward(
        params, cfg, batch,
        image_feats=image_feats,
        kv_total_len=total_len,
        shift=shift,
        adapters=adapters,
        lora_scaling=lora_scaling,
        logz2=logz2,
        attn_impl=attn_impl,
        last_logit_only=True,
        **extra,
    )
    last_logits = out.logits[:, -1]  # left padding → last position is the prompt end
    return last_logits, out.decoder.kv_cache, image_feats


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "eos_token_id", "pad_token_id", "logz2", "attn_impl",
    ),
)
def greedy_generate(
    params,
    cfg: ModelConfig,
    batch: LVLMBatch,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    shift: Optional[Dict[str, jnp.ndarray]] = None,
    adapters: Optional[Dict[str, jnp.ndarray]] = None,
    lora_scaling: float = 1.0,
    logz2: str = "unmasked",
    attn_impl: str = "xla",
    decode_params=None,
    prefix=None,
    image_feats=None,
) -> GenerateResult:
    B, T = batch.input_ids.shape
    from ..shift.prefix import prefix_len

    P = prefix_len(prefix)  # prefix-tuning virtual slots lead the timeline
    total = P + T + max_new_tokens
    # serving mode: prefill runs the full-precision tree at matmul roofline;
    # decode steps stream the int8 copy (weight HBM is the decode bound)
    dparams = decode_params if decode_params is not None else params
    dtype = _param_dtype(params)
    last_logits, cache, image_feats = _prefill(
        params, cfg, batch, total, shift, adapters, lora_scaling, logz2, dtype,
        attn_impl, prefix, image_feats,
    )

    n_real = jnp.sum(batch.attention_mask, axis=-1)  # [B]
    mask_full = jnp.concatenate(
        [
            jnp.ones((B, P), batch.attention_mask.dtype),
            batch.attention_mask,
            jnp.zeros((B, max_new_tokens), batch.attention_mask.dtype),
        ],
        axis=-1,
    )
    # idefics1: generated tokens keep attending to the image of the last prompt token
    last_img_row = None
    if batch.image_attention_mask is not None:
        last_img_row = batch.image_attention_mask[:, -1:, :]  # [B,1,N]

    first_tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)  # [B]

    def step(carry, i):
        tok, cache, mask_full, finished = carry
        tok = jnp.where(finished, pad_token_id, tok)
        mask_full = mask_full.at[:, P + T + i].set(1)
        step_batch = LVLMBatch(
            input_ids=tok[:, None],
            attention_mask=mask_full,
            pixel_values=batch.pixel_values,
            pixel_mask=batch.pixel_mask,
            image_attention_mask=last_img_row,
        )
        out = lvlm_forward(
            dparams, cfg, step_batch,
            image_feats=image_feats,
            position_ids=(n_real + P + i)[:, None],
            kv_cache=cache,
            kv_total_len=total,
            shift=shift,
            adapters=adapters,
            lora_scaling=lora_scaling,
            logz2=logz2,
        )
        finished = finished | (tok == eos_token_id)
        next_tok = jnp.argmax(out.logits[:, -1], axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, pad_token_id, next_tok)
        return (next_tok, out.decoder.kv_cache, mask_full, finished), tok

    init = (first_tok, cache, mask_full, jnp.zeros((B,), bool))
    _, toks = jax.lax.scan(step, init, jnp.arange(max_new_tokens))
    return GenerateResult(tokens=toks.T, scores=jnp.zeros((B,), jnp.float32))


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "num_beams", "eos_token_id", "pad_token_id", "logz2", "attn_impl", "quant_kv",
    ),
)
def beam_generate(
    params,
    cfg: ModelConfig,
    batch: LVLMBatch,
    max_new_tokens: int,
    num_beams: int,
    eos_token_id: int,
    pad_token_id: int,
    length_penalty: float = 0.0,
    shift: Optional[Dict[str, jnp.ndarray]] = None,
    adapters: Optional[Dict[str, jnp.ndarray]] = None,
    lora_scaling: float = 1.0,
    logz2: str = "unmasked",
    attn_impl: str = "xla",
    decode_params=None,
    quant_kv: Optional[bool] = None,
    prefix=None,
    image_feats=None,
) -> GenerateResult:
    """HF-semantics beam search (do_sample=False, early_stopping=False).

    ``quant_kv``: store the beam-shared prompt KV region int8 (per position ×
    kv-head scales) and run decode-step attention over it through the
    dequant-fused Pallas kernel (``ops/decode_attention.py``) — halves the
    dominant per-step HBM read.  Defaults to on exactly when a separate int8
    decode copy is in use AND the prompt region is long enough for the byte
    saving to beat the extra per-layer kernel call (measured crossover in
    ``scripts/bench_quant_kv_gate.py``).

    ``prefix``: prefix-tuning virtual KV — P extra leading slots of the
    beam-shared prompt region (``shift/prefix.py``).
    """
    B, T = batch.input_ids.shape
    K = num_beams
    from ..shift.prefix import prefix_len

    P = prefix_len(prefix)
    Tp = P + T  # prompt-region slots (virtual prefix + real prompt)
    total = Tp + max_new_tokens
    # serving mode: prefill runs the full-precision tree at matmul roofline;
    # decode steps stream the int8 copy (weight HBM is the decode bound)
    dparams = decode_params if decode_params is not None else params
    dtype = _param_dtype(params)

    last_logits, cache, image_feats = _prefill(
        params, cfg, batch, total, shift, adapters, lora_scaling, logz2, dtype,
        attn_impl, prefix, image_feats,
    )  # logits [B,V], cache leaves [L,B,S,...]

    V = last_logits.shape[-1]

    def tile_beams(x, axis):
        """[..., B, ...] → [..., B*K, ...] repeating each batch row K times."""
        return jnp.repeat(x, K, axis=axis)

    # split cache: the prompt region [0,T) is identical across a row's beams
    # (one prefill) — keep it ONCE at batch B ("prompt_k/v", read with beams
    # folded into the query-group axis) and give each beam only the thin
    # generated region.  Decode-step HBM drops by ~the beam factor and beam
    # reordering gathers just [L,B·K,max_new,·,·].
    L, _, _, Hkv, Dh = cache["k"].shape
    gen_shape = (L, B * K, max_new_tokens, Hkv, Dh)
    prompt_k, prompt_v = cache["k"][:, :, :Tp], cache["v"][:, :, :Tp]
    if quant_kv is None:
        # measured crossover (scripts/bench_quant_kv_gate.py, v5e): the int8
        # prompt-KV kernel wins from ~1k prompt slots (B8 T1024: 181→178 ms;
        # B8 T2048: 382→376) and loses at the 512-slot eval protocol
        # (B16 T512: 208→215 — per-layer kernel-call + quantize overhead beats
        # the byte saving there)
        quant_kv = decode_params is not None and Tp >= 1024
    # Tq: prompt-region length in the decode timeline.  The int8 kernel needs
    # 128-aligned blocks, so quantization pads the prompt region (zeros, masked
    # out below) — e.g. a 1030-slot ICL prompt becomes 1152.  (Under the
    # default gate above, sub-1024 prompts such as the 8B protocol's 522 slots
    # never take the quant path; the repad branch is reachable for non-aligned
    # prompts ≥ 1024 or an explicit quant_kv=True.)  The pad columns are
    # inserted between the prompt and generated regions of the timeline mask
    # and never attended; RoPE positions count real tokens only.
    Tq = Tp
    cache_len = cache["length"]
    if (
        quant_kv
        and shift is None
        and cfg.text.sliding_window is None
        and Dh % 128 == 0
        and jax.default_backend() == "tpu"
    ):
        from ..ops.decode_attention import quantize_prompt_kv
        from ..ops.quant import _round_up

        Tq = _round_up(Tp, 128)
        if Tq != Tp:
            pad = ((0, 0), (0, 0), (0, Tq - Tp), (0, 0), (0, 0))
            prompt_k = jnp.pad(prompt_k, pad)
            prompt_v = jnp.pad(prompt_v, pad)
            cache_len = cache_len + (Tq - Tp)
        prompt_k, prompt_v = quantize_prompt_kv(prompt_k, prompt_v)
    total = Tq + max_new_tokens
    cache = {
        "prompt_k": prompt_k,
        "prompt_v": prompt_v,
        "k": jnp.zeros(gen_shape, cache["k"].dtype),
        "v": jnp.zeros(gen_shape, cache["v"].dtype),
        "length": cache_len,
    }
    if image_feats is not None:
        image_feats = tile_beams(image_feats, 0)
    pixel_values = tile_beams(batch.pixel_values, 0) if batch.pixel_values is not None else None
    pixel_mask = tile_beams(batch.pixel_mask, 0) if batch.pixel_mask is not None else None
    last_img_row = None
    if batch.image_attention_mask is not None:
        last_img_row = tile_beams(batch.image_attention_mask[:, -1:, :], 0)

    n_real = tile_beams(jnp.sum(batch.attention_mask, axis=-1), 0)  # [B*K]
    mask_full = tile_beams(
        jnp.concatenate(
            [
                jnp.ones((B, P), batch.attention_mask.dtype),  # prefix slots
                batch.attention_mask,
                # (Tq - Tp) masked prompt-pad columns + the generated region
                jnp.zeros((B, total - Tp), batch.attention_mask.dtype),
            ],
            axis=-1,
        ),
        0,
    )  # [B*K, total]

    logprobs0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)  # [B,V]

    # initial expansion: take top-K distinct first tokens per batch row
    first_scores, first_toks = jax.lax.top_k(logprobs0, K)  # [B,K]

    class _State(NamedTuple):
        tokens: jnp.ndarray          # [B,K,max_new] generated so far (pad-filled)
        last_tok: jnp.ndarray        # [B,K]
        scores: jnp.ndarray          # [B,K] running sum logprob
        lengths: jnp.ndarray         # [B,K] generated length incl. current last_tok
        alive: jnp.ndarray           # [B,K] still running
        fin_tokens: jnp.ndarray      # [B,K,max_new]
        fin_scores: jnp.ndarray      # [B,K] (already length-penalized)
        cache: Any
        mask_full: jnp.ndarray

    tokens0 = jnp.full((B, K, max_new_tokens), pad_token_id, jnp.int32)
    state = _State(
        tokens=tokens0.at[:, :, 0].set(first_toks),
        last_tok=first_toks.astype(jnp.int32),
        scores=first_scores,
        lengths=jnp.ones((B, K), jnp.int32),
        alive=jnp.ones((B, K), bool),
        fin_tokens=tokens0,
        fin_scores=jnp.full((B, K), NEG, jnp.float32),
        cache=cache,
        mask_full=mask_full,
    )

    def finalize_eos(state: _State, step_idx):
        """Move beams whose last token is EOS into the finished set."""
        is_eos = state.alive & (state.last_tok == eos_token_id)
        # penalized score of finishing now (HF: score / len**penalty; len counts
        # generated tokens including EOS)
        pen = state.scores / (state.lengths.astype(jnp.float32) ** length_penalty)
        cand_scores = jnp.where(is_eos, pen, NEG)
        # tokens of the finishing beam, with the EOS stripped to pad?  HF keeps EOS
        # in the sequence; decode strips special tokens anyway.
        all_fin_scores = jnp.concatenate([state.fin_scores, cand_scores], axis=1)  # [B,2K]
        all_fin_tokens = jnp.concatenate([state.fin_tokens, state.tokens], axis=1)
        top_scores, top_idx = jax.lax.top_k(all_fin_scores, K)
        fin_tokens = jnp.take_along_axis(all_fin_tokens, top_idx[..., None], axis=1)
        return state._replace(
            fin_tokens=fin_tokens,
            fin_scores=top_scores,
            alive=state.alive & ~is_eos,
            scores=jnp.where(is_eos, NEG, state.scores),
        )

    state = finalize_eos(state, 0)

    def step(state: _State, i):
        # i: index of the position being generated this step (1..max_new-1)
        mask_full = state.mask_full.at[:, Tq + i - 1].set(1)
        flat_tok = state.last_tok.reshape(B * K)
        step_batch = LVLMBatch(
            input_ids=flat_tok[:, None],
            attention_mask=mask_full,
            pixel_values=pixel_values,
            pixel_mask=pixel_mask,
            image_attention_mask=last_img_row,
        )
        out = lvlm_forward(
            dparams, cfg, step_batch,
            image_feats=image_feats,
            position_ids=(n_real + P + i - 1)[:, None],
            kv_cache=state.cache,
            kv_total_len=total,
            shift=shift,
            adapters=adapters,
            lora_scaling=lora_scaling,
            logz2=logz2,
        )
        logprobs = jax.nn.log_softmax(
            out.logits[:, -1].astype(jnp.float32), axis=-1
        ).reshape(B, K, V)
        cand = jnp.where(
            state.alive[..., None], state.scores[..., None] + logprobs, NEG
        )  # [B,K,V]
        flat_cand = cand.reshape(B, K * V)
        top_scores, top_flat = jax.lax.top_k(flat_cand, 2 * K)  # [B,2K]
        parent = top_flat // V  # [B,2K]
        tok = (top_flat % V).astype(jnp.int32)

        # prefer non-EOS continuations for the K running beams (HF takes the top K
        # non-EOS among 2K candidates)
        is_eos_cand = tok == eos_token_id
        rank_key = jnp.where(is_eos_cand, NEG, top_scores)
        _, keep_idx = jax.lax.top_k(rank_key, K)  # indices into 2K
        run_parent = jnp.take_along_axis(parent, keep_idx, axis=1)  # [B,K]
        run_tok = jnp.take_along_axis(tok, keep_idx, axis=1)
        run_scores = jnp.take_along_axis(top_scores, keep_idx, axis=1)
        run_alive = run_scores > NEG / 2

        # EOS candidates finish directly (their sequence = parent's tokens + EOS)
        eos_scores_raw = jnp.where(is_eos_cand, top_scores, NEG)  # [B,2K]
        parent_tokens = jnp.take_along_axis(
            state.tokens, parent[..., None], axis=1
        )  # [B,2K,max_new]
        eos_tokens = parent_tokens.at[:, :, i].set(eos_token_id)
        eos_len = jnp.take_along_axis(state.lengths, parent, axis=1) + 1
        eos_pen = eos_scores_raw / (eos_len.astype(jnp.float32) ** length_penalty)
        eos_pen = jnp.where(is_eos_cand, eos_pen, NEG)
        all_fin_scores = jnp.concatenate([state.fin_scores, eos_pen], axis=1)
        all_fin_tokens = jnp.concatenate([state.fin_tokens, eos_tokens], axis=1)
        fin_scores, fin_idx = jax.lax.top_k(all_fin_scores, K)
        fin_tokens = jnp.take_along_axis(all_fin_tokens, fin_idx[..., None], axis=1)

        # reorder running state by parent beam
        gather_beam = lambda x: jnp.take_along_axis(x, run_parent, axis=1)
        new_tokens = jnp.take_along_axis(
            state.tokens, run_parent[..., None], axis=1
        ).at[:, :, i].set(run_tok)
        flat_parent = (
            jnp.arange(B)[:, None] * K + run_parent
        ).reshape(B * K)  # [B*K] into B*K rows
        # only the generated region is per-beam — reorder is a gather of the
        # thin [L,B·K,max_new,·,·] cache; the shared prompt region never moves
        step_cache = out.decoder.kv_cache
        new_cache = {
            "prompt_k": step_cache["prompt_k"],
            "prompt_v": step_cache["prompt_v"],
            "k": jnp.take(step_cache["k"], flat_parent, axis=1),
            "v": jnp.take(step_cache["v"], flat_parent, axis=1),
            "length": step_cache["length"],
        }
        new_state = _State(
            tokens=new_tokens,
            last_tok=run_tok,
            scores=jnp.where(run_alive, run_scores, NEG),
            lengths=gather_beam(state.lengths) + 1,
            alive=run_alive,
            fin_tokens=fin_tokens,
            fin_scores=fin_scores,
            cache=new_cache,
            mask_full=mask_full,
        )
        return new_state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(1, max_new_tokens))

    # close out still-running beams at max length (HF adds them when no finished
    # hypothesis exists or scores beat finished ones)
    run_pen = state.scores / (state.lengths.astype(jnp.float32) ** length_penalty)
    run_pen = jnp.where(state.alive, run_pen, NEG)
    all_scores = jnp.concatenate([state.fin_scores, run_pen], axis=1)
    all_tokens = jnp.concatenate([state.fin_tokens, state.tokens], axis=1)
    best_scores, best_idx = jax.lax.top_k(all_scores, 1)
    best_tokens = jnp.take_along_axis(all_tokens, best_idx[..., None], axis=1)[:, 0]
    return GenerateResult(tokens=best_tokens, scores=best_scores[:, 0])


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "eos_token_id", "pad_token_id",
        "temperature", "top_k", "top_p", "logz2", "attn_impl",
    ),
)
def sample_generate(
    params,
    cfg: ModelConfig,
    batch: LVLMBatch,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    shift: Optional[Dict[str, jnp.ndarray]] = None,
    adapters: Optional[Dict[str, jnp.ndarray]] = None,
    lora_scaling: float = 1.0,
    logz2: str = "unmasked",
    attn_impl: str = "xla",
    decode_params=None,
    prefix=None,
    image_feats=None,
) -> GenerateResult:
    """Ancestral sampling with HF-style logits processing order:
    temperature → top-k → top-p (``do_sample=True`` path of the reference's
    ``model.generate`` pass-through, testbed/models/model_base.py:383-435).

    ``top_k=0`` / ``top_p=1.0`` disable the respective filters.  Returns the
    per-sequence sum of sampled-token logprobs as ``scores``.
    """
    B, T = batch.input_ids.shape
    from ..shift.prefix import prefix_len

    P = prefix_len(prefix)
    total = P + T + max_new_tokens
    # serving mode: prefill runs the full-precision tree at matmul roofline;
    # decode steps stream the int8 copy (weight HBM is the decode bound)
    dparams = decode_params if decode_params is not None else params
    dtype = _param_dtype(params)
    last_logits, cache, image_feats = _prefill(
        params, cfg, batch, total, shift, adapters, lora_scaling, logz2, dtype,
        attn_impl, prefix, image_feats,
    )

    n_real = jnp.sum(batch.attention_mask, axis=-1)
    mask_full = jnp.concatenate(
        [
            jnp.ones((B, P), batch.attention_mask.dtype),
            batch.attention_mask,
            jnp.zeros((B, max_new_tokens), batch.attention_mask.dtype),
        ],
        axis=-1,
    )
    last_img_row = None
    if batch.image_attention_mask is not None:
        last_img_row = batch.image_attention_mask[:, -1:, :]

    V = last_logits.shape[-1]

    def process_and_sample(logits, key):
        x = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
        if top_k and top_k < V:
            kth = jax.lax.top_k(x, top_k)[0][:, -1:]
            x = jnp.where(x < kth, NEG, x)
        if top_p < 1.0:
            sort_idx = jnp.argsort(-x, axis=-1)
            sorted_x = jnp.take_along_axis(x, sort_idx, axis=-1)
            probs = jax.nn.softmax(sorted_x, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # HF TopPLogitsWarper: keep tokens while cumulative prob (inclusive
            # of the previous token) ≤ top_p — the first token always survives
            keep_sorted = (cum - probs) <= top_p
            keep = jnp.zeros_like(keep_sorted).at[
                jnp.arange(x.shape[0])[:, None], sort_idx
            ].set(keep_sorted)
            x = jnp.where(keep, x, NEG)
        logprobs = jax.nn.log_softmax(x, axis=-1)
        tok = jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
        return tok, jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]

    k0, rng = jax.random.split(rng)
    first_tok, first_lp = process_and_sample(last_logits, k0)

    def step(carry, i):
        tok, lp_sum, cache, mask_full, finished, rng = carry
        tok = jnp.where(finished, pad_token_id, tok)
        mask_full = mask_full.at[:, P + T + i].set(1)
        step_batch = LVLMBatch(
            input_ids=tok[:, None],
            attention_mask=mask_full,
            pixel_values=batch.pixel_values,
            pixel_mask=batch.pixel_mask,
            image_attention_mask=last_img_row,
        )
        out = lvlm_forward(
            dparams, cfg, step_batch,
            image_feats=image_feats,
            position_ids=(n_real + P + i)[:, None],
            kv_cache=cache,
            kv_total_len=total,
            shift=shift,
            adapters=adapters,
            lora_scaling=lora_scaling,
            logz2=logz2,
        )
        finished = finished | (tok == eos_token_id)
        key, rng = jax.random.split(rng)
        next_tok, lp = process_and_sample(out.logits[:, -1], key)
        next_tok = jnp.where(finished, pad_token_id, next_tok)
        lp_sum = lp_sum + jnp.where(finished, 0.0, lp)
        return (next_tok, lp_sum, out.decoder.kv_cache, mask_full, finished, rng), tok

    init = (first_tok, first_lp, cache, mask_full, jnp.zeros((B,), bool), rng)
    (_, lp_sum, *_), toks = jax.lax.scan(step, init, jnp.arange(max_new_tokens))
    return GenerateResult(tokens=toks.T, scores=lp_sum)
