"""Pallas TPU flash attention emitting softmax log-normalizers.

The MimIC shift needs log Z₂ = logsumexp of the attention scores
(reference ``src/shift_encoder.py:697-703`` recomputes a full QKᵀ for it).  A flash
kernel already carries the running (max, denominator) pair — this kernel simply
*emits* it, in two flavors per query row:

- ``lse``: the masked log-normalizer (the actual softmax denominator)
- ``lse_unmasked``: logsumexp over ALL key positions ignoring causal/padding masks,
  bit-matching the reference's ``do_shift`` (which applies no mask)

so the μ-gate costs one extra running pair instead of an O(T·S) matmul.

Layout: q [B,T,H,D], k/v [B,S,Hkv,D] (GQA resolved by index mapping), key_mask
[B,S] (handles the *internal* [PAD] separators of the training batches, not just
suffix padding).  Grid = (B, H, T/bq, S/bk) with the KV axis innermost so Mosaic
double-buffers the K/V block DMAs against compute; running max/denominator/
accumulator live in VMEM scratch across KV steps.  Blocks strictly above the
causal diagonal skip the (masked) PV matmul — only the shared QKᵀ product feeds
the unmasked accumulator there.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30
LOG2E = 1.4426950408889634  # scores are kept in the log2 domain inside the
# kernel: exp(x) = exp2(x·log2e), and the VPU's exp lowers to exactly that —
# folding log2e into the q prescale removes one multiply per score element
# (the softmax VPU path is the roofline on ViT D-72 shapes)
LN2 = 0.6931471805599453

DEFAULT_BQ = 512
DEFAULT_BK = 1024


def _pick_block(n: int, cap: int) -> int:
    """Largest hardware-friendly block ≤ cap that divides n (full length fallback)."""
    for b in (cap, 1024, 512, 384, 256, 128, 64, 32, 16, 8):
        if b <= cap and n % b == 0:
            return b
    return n


def _kernel(
    bvalid_ref,   # [B, S/bk] int32 (SMEM, unblocked): per-(b, jk) any-valid flag
    kmask_ref,    # [1, 1, bk] int32
    q_ref,        # [1, 1, bq, D]
    k_ref,        # [1, 1, bk, D]
    v_ref,        # [1, 1, bk, D]
    o_ref,        # [1, 1, bq, D]
    lse_ref,      # [1, 1, bq, 1] fp32
    lse_u_ref,    # [1, 1, bq, 1] fp32
    m_scr,        # [bq, 1] fp32 scratch
    l_scr,        # [bq, 1]
    acc_scr,      # [bq, D]
    mu_scr,       # [bq, 1]
    lu_scr,       # [bq, 1]
    *,
    scale: float,
    causal: bool,
    need_unmasked: bool,
    mask_in_scores: bool,
):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    bk = k_ref.shape[2]
    jq = pl.program_id(2)
    jk = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(jk == 0)
    def _init():
        m_scr[:] = jnp.full((bq, 1), NEG, jnp.float32)
        l_scr[:] = jnp.zeros((bq, 1), jnp.float32)
        acc_scr[:] = jnp.zeros((bq, d), jnp.float32)
        mu_scr[:] = jnp.full((bq, 1), NEG, jnp.float32)
        lu_scr[:] = jnp.zeros((bq, 1), jnp.float32)

    q_start = jq * bq
    ks = jk * bk
    # blocks strictly above the causal diagonal contribute nothing masked;
    # blocks whose key mask is entirely zero contribute nothing either
    # (variable-aspect vision: a 980×735 image leaves ~28% of key blocks fully
    # padded — the host precomputes per-(b, block) validity)
    block_needed = jnp.logical_and(
        jnp.logical_or(jnp.logical_not(causal), ks <= q_start + bq - 1),
        bvalid_ref[pl.program_id(0), jk] > 0,
    )

    # with the unmasked lse required, every block must be visited; otherwise
    # whole masked-out / above-diagonal blocks are skipped
    compute_pred = (
        jnp.asarray(True) if need_unmasked else block_needed
    )

    @pl.when(compute_pred)
    def _compute():
        # matmuls run in the INPUT dtype with fp32 accumulation (bf16 on the
        # MXU is ~8× an fp32 matmul; matches the XLA path's sdpa_with_lse
        # numerics: einsum(..., preferred_element_type=f32) then scale)
        q = q_ref[0, 0]
        k_blk = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if scale != 1.0:
            s = s * scale

        if need_unmasked:
            # unmasked running pair (log Z₂ parity: no masks)
            m_u = mu_scr[:, 0]
            m_u_new = jnp.maximum(m_u, jnp.max(s, axis=-1))
            lu_scr[:, 0] = lu_scr[:, 0] * jnp.exp2(m_u - m_u_new) + jnp.sum(
                jnp.exp2(s - m_u_new[:, None]), axis=-1
            )
            mu_scr[:, 0] = m_u_new

        @pl.when(block_needed)
        def _masked():
            if mask_in_scores:
                # the key-padding mask rode the MXU: the wrapper appended a
                # q=1/k∈{0,NEG} column in the (free) D-padding lanes, so masked
                # scores already sit at NEG — no select, no kmask load
                masked = s
            else:
                kmask = kmask_ref[0, 0, :] > 0
                masked = jnp.where(kmask[None, :], s, NEG)
            if causal:
                rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
                cols = ks + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
                masked = jnp.where(rows >= cols, masked, NEG)
            m = m_scr[:, 0]
            m_new = jnp.maximum(m, jnp.max(masked, axis=-1))
            p = jnp.exp2(masked - m_new[:, None])
            alpha = jnp.exp2(m - m_new)
            l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
            v_blk = v_ref[0, 0]
            acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[:, 0] = m_new

    @pl.when(jk == n_kv - 1)
    def _finalize():
        # running pairs live in the log2 domain (q was prescaled by ·log2e);
        # emitted log-normalizers convert back to ln
        l_safe = jnp.maximum(l_scr[:, 0], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = ((m_scr[:, 0] + jnp.log2(l_safe)) * LN2)[:, None]
        if need_unmasked:
            lse_u_ref[0, 0] = (
                (mu_scr[:, 0] + jnp.log2(jnp.maximum(lu_scr[:, 0], 1e-30))) * LN2
            )[:, None]
        else:
            lse_u_ref[0, 0] = lse_ref[0, 0]


def flash_attention(
    q: jnp.ndarray,          # [B,T,H,D]
    k: jnp.ndarray,          # [B,S,Hkv,D]
    v: jnp.ndarray,          # [B,S,Hkv,D]
    key_mask: jnp.ndarray,   # [B,S] (1 = attend)
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    need_unmasked: bool = True,
    interpret: bool = False,
    mask_in_scores: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (out [B,T,H,D], lse [B,T,H], lse_unmasked [B,T,H]).

    T and S must be divisible by the block sizes (the input pipeline buckets to
    multiples of 128); D need not be 128-aligned (the MXU pads the contraction
    internally — and when it does, the padding lanes are put to work, see
    below).

    VPU-softmax-path economies (the softmax, not the matmuls, is the roofline
    on ViT D-72 shapes — measured ~84 Gelem/s incl. exp on v5e):

    - the score scale AND log2(e) fold into a one-pass q prescale; the kernel
      runs its running max/denominator in the log2 domain with ``exp2`` (what
      the VPU's exp lowers to anyway) and converts the emitted lse back to ln;
    - when D is not a lane multiple and the unmasked lse isn't needed, the
      key-padding mask rides the MXU for free: an extra q=1 / k∈{0,NEG} column
      in the D-padding lanes lands masked scores at NEG straight out of the
      matmul — the per-element select and the kmask load disappear;
    - fully-masked key blocks are skipped exactly via a per-(batch, key-block)
      validity table reduced from ``key_mask`` outside the kernel.
    """
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    groups = H // Hkv

    # auto-dispatch (only when the caller didn't pin blocks or the mask layout):
    # short key axes fit a whole attention row in VMEM, where the one-shot
    # kernel beats the flash running-pair machinery (measured v5e, 24-layer
    # towers: T=S=512 B16 GQA 28.9→12.6 ms; T=S=2048 B2 34.7→22.2 ms); tiny
    # total work is fastest on the plain XLA path (T=S=256 B2: 7.8→4 ms est.).
    # NON-causal rows (the vision towers) go one-shot up to S=8192: the score
    # tile stays ≤ _ONEPASS_SCORE_BYTES and the kernel beats flash 1.30× at the
    # idefics2-8b 980px shape (27.9 vs 36.2 ms/layer, B16 H16 N4992 D72,
    # bq=416) — flash's diagonal skip buys nothing without causality, so its
    # running-pair machinery is pure overhead there.  Causal keeps the lower
    # cap: above it flash halves the visited blocks.
    max_s = ONEPASS_MAX_S if causal else ONEPASS_MAX_S_NONCAUSAL
    if (
        mask_in_scores is None
        and block_q == DEFAULT_BQ
        and block_k == DEFAULT_BK
        and S % 128 == 0
        and T % 8 == 0
        and S <= max_s
    ):
        if B * H * T * S < ONEPASS_MIN_ELEMS and not interpret:
            return _sdpa_fallback(q, k, v, key_mask, causal, scale, need_unmasked)
        return onepass_attention(
            q, k, v, key_mask, causal=causal, scale=scale,
            need_unmasked=need_unmasked, interpret=interpret,
        )

    scale = scale if scale is not None else 1.0 / (D**0.5)
    bq = _pick_block(T, block_q)
    bk = _pick_block(S, block_k)

    kmask_i32 = key_mask.astype(jnp.int32)
    block_valid = jnp.max(kmask_i32.reshape(B, S // bk, bk), axis=-1)  # [B, S/bk]

    # ride the MXU's D-padding: only when D isn't lane-aligned (the pad lanes
    # are free) and the unmasked lse isn't required (it must not see the mask)
    if mask_in_scores is None:
        mask_in_scores = (not need_unmasked) and D % 128 != 0
    mask_in_scores = mask_in_scores and not need_unmasked
    Dp = D
    if mask_in_scores:
        # next lane multiple STRICTLY above D: even when D is lane-aligned
        # (forced path) the mask column needs a real extra lane — clamped
        # .at[..., D] writes would silently corrupt the last feature lane
        Dp = (D // 128 + 1) * 128
        mask_col = jnp.where(key_mask > 0, 0.0, NEG).astype(k.dtype)  # [B,S]
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        q = q.at[..., D].set(1.0)
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        k = k.at[..., D].set(mask_col[:, :, None])
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

    # fold the score scale (and log2e — the kernel softmax runs in the log2
    # domain) into q with one [B,T,H,D] pass instead of per-score-block work.
    # The mask column scales too: NEG·scale·log2e is still ≪ any real score.
    q = q * jnp.asarray(scale * LOG2E, q.dtype)
    scale = 1.0

    qt = q.transpose(0, 2, 1, 3)  # [B,H,T,D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (B, H, T // bq, S // bk)
    kernel = functools.partial(
        _kernel, scale=scale, causal=causal, need_unmasked=need_unmasked,
        mask_in_scores=mask_in_scores,
    )
    out, lse, lse_u = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # whole [B, S/bk] table in SMEM (Mosaic rejects sub-(8,128) blocks;
            # the kernel indexes it by (program_id(0), jk))
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, bk), lambda b, h, jq, jk: (b, 0, jk)),
            pl.BlockSpec((1, 1, bq, Dp), lambda b, h, jq, jk: (b, h, jq, 0)),
            pl.BlockSpec((1, 1, bk, Dp), lambda b, h, jq, jk: (b, h // groups, jk, 0)),
            pl.BlockSpec((1, 1, bk, Dp), lambda b, h, jq, jk: (b, h // groups, jk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, Dp), lambda b, h, jq, jk: (b, h, jq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, jq, jk: (b, h, jq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, jq, jk: (b, h, jq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dp), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dp), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(block_valid, kmask_i32[:, None, :], qt, kt, vt)

    if mask_in_scores:
        out = out[..., :D]
    return (
        out.transpose(0, 2, 1, 3),
        lse[..., 0].transpose(0, 2, 1),
        lse_u[..., 0].transpose(0, 2, 1),
    )


# ---------------------------------------------------------------------------
# one-shot kernel for short sequences
# ---------------------------------------------------------------------------


def _onepass_kernel(
    kmask_ref,   # [1, 1, S] int32 (None when mask_in_scores)
    q_ref,       # [1, 1, bq, Dp]
    k_ref,       # [1, 1, S, Dp]
    v_ref,       # [1, 1, S, Dp]
    o_ref,       # [1, 1, bq, Dp]
    lse_ref,     # [1, 1, bq, 1] fp32
    lse_u_ref,   # [1, 1, bq, 1] fp32
    *,
    causal: bool,
    need_unmasked: bool,
    mask_in_scores: bool,
    bq: int,
    sum_col: Optional[int],
):
    """Whole attention row in one program: full-row softmax, no running pairs.

    The flash kernel's per-KV-block machinery (running max/denominator, the
    accumulator rescale, the block-validity branch) costs more than it saves
    when the whole [bq, S] score tile fits VMEM — at ViT/eval-prefill sizes
    (S ≤ ~2k) this kernel computes max/exp/sum once over the full row instead.
    Scores arrive pre-scaled by scale·log2e (folded into q outside), so the
    softmax runs on ``exp2`` — what the VPU's exp lowers to anyway.

    ``sum_col`` (set with mask_in_scores on long rows): the softmax denominator
    rides the PV matmul — the wrapper put 1.0 in v's pad column ``sum_col``, so
    ``acc[:, sum_col]`` IS Σp and the [bq, S] VPU sum-reduce disappears.  The
    denominator then sums the same bf16-rounded p the numerator uses
    (self-consistent weighted mean; ≲1e-3 relative drift vs the fp32-p sum).
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, S]

    if need_unmasked:
        m_u = jnp.max(s, axis=-1)
        l_u = jnp.sum(jnp.exp2(s - m_u[:, None]), axis=-1)
        lse_u_ref[0, 0] = ((m_u + jnp.log2(jnp.maximum(l_u, 1e-30))) * LN2)[:, None]

    masked = s
    if not mask_in_scores and kmask_ref is not None:
        masked = jnp.where(kmask_ref[0, 0, :][None, :] > 0, masked, NEG)
    if causal:
        q_start = pl.program_id(2) * bq
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        masked = jnp.where(rows >= cols, masked, NEG)

    m = jnp.max(masked, axis=-1)
    p = jnp.exp2(masked - m[:, None])
    v_blk = v_ref[0, 0]
    acc = jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if sum_col is not None:
        l = acc[:, sum_col]
    else:
        l = jnp.sum(p, axis=-1)
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = ((m + jnp.log2(l_safe)) * LN2)[:, None]
    if not need_unmasked:
        lse_u_ref[0, 0] = lse_ref[0, 0]


# VMEM budget for the [bq, S] fp32 score tile (plus q/k/v blocks + headroom)
ONEPASS_MAX_S = 3072
# non-causal (vision) rows: bq shrinks to keep the tile ≤ _ONEPASS_SCORE_BYTES,
# so longer key axes still fit (S=8192 → bq=256 → 8 MB tile).
# 8 MB cap: every program re-fetches full K/V, so bigger bq directly divides
# that HBM refetch traffic (measured at the idefics2-8b 980px vision shape
# B16 H16 N4992 D72: bq=128 28.6 ms/layer, bq=416 27.9 — both beat flash's
# 36.2); Mosaic fails to compile the kernel once the tile reaches ~16 MB
# (bq=832 at S=4992 → remote_compile HTTP 500), so the cap stays well under.
ONEPASS_MAX_S_NONCAUSAL = 8192
_ONEPASS_SCORE_BYTES = 8 * 1024 * 1024
# below this many score elements per call (B·H·T·S) the fixed kernel cost
# (transposes + per-program setup) loses to a plain XLA softmax-attention
# (measured on v5e: B2 H16 T=S=256 → flash 0.32 ms/layer, onepass 0.61,
# XLA fallback wins; B16 H16 T=S=512 → onepass 0.53 ms/layer vs XLA 1.08)
ONEPASS_MIN_ELEMS = 8 * 1024 * 1024


def _sdpa_fallback(q, k, v, key_mask, causal, scale, need_unmasked):
    """Plain-XLA attention with the (out, lse, lse_unmasked) kernel contract.

    Materializes the [B,H,T,S] score tensor — only dispatched for tiny shapes
    (see ``ONEPASS_MIN_ELEMS``) where that tensor is a few MB and XLA's fusion
    beats any Pallas launch."""
    from ..models.layers import repeat_kv

    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    sc = scale if scale is not None else 1.0 / (D**0.5)
    kf = repeat_kv(k, H // Hkv)
    vf = repeat_kv(v, H // Hkv)
    s = jnp.einsum(
        "bthd,bshd->bhts", q, kf, preferred_element_type=jnp.float32
    ) * sc
    lse_u = (
        jax.scipy.special.logsumexp(s, axis=-1) if need_unmasked else None
    )  # [B,H,T]
    masked = jnp.where(key_mask[:, None, None, :] > 0, s, NEG)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        masked = jnp.where((rows >= cols)[None, None], masked, NEG)
    m = jnp.max(masked, axis=-1)
    p = jnp.exp(masked - m[..., None])
    l = jnp.maximum(jnp.sum(p, axis=-1), 1e-30)  # [B,H,T]
    pv = jnp.einsum(
        "bhts,bshd->bthd", p.astype(v.dtype), vf,
        preferred_element_type=jnp.float32,
    )
    out = (pv / l.transpose(0, 2, 1)[..., None]).astype(q.dtype)
    lse = (m + jnp.log(l)).transpose(0, 2, 1)
    lse_u = lse if lse_u is None else lse_u.transpose(0, 2, 1)
    return out, lse, lse_u


def onepass_attention(
    q: jnp.ndarray,          # [B,T,H,D]
    k: jnp.ndarray,          # [B,S,Hkv,D]
    v: jnp.ndarray,          # [B,S,Hkv,D]
    key_mask: Optional[jnp.ndarray],   # [B,S] (1 = attend) or None
    causal: bool = True,
    scale: Optional[float] = None,
    need_unmasked: bool = True,
    interpret: bool = False,
    mask_in_scores: Optional[bool] = None,
    block_q: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-shot fused attention for short sequences (S ≤ ~3k).

    Same contract as ``flash_attention`` (out, lse, lse_unmasked) but each grid
    program holds the FULL key axis: one matmul, one full-row softmax, one PV
    matmul — none of the flash running-pair bookkeeping that dominates when
    S/block_k is small (measured at B16 H16 N768 D72 on v5e: flash 37 Gelem/s,
    XLA fused 67, this kernel — see tests/bench — is the fastest path).
    Requires S % 128 == 0 and T % 8 == 0 (the input pipeline buckets to 128).

    ``block_q`` overrides the q-block size.  Every program re-fetches the FULL
    [S, D] k/v pair, so long rows are K/V-HBM-refetch bound — bq sets the
    refetch factor T/bq and wants to be as large as the VMEM score tile allows.
    """
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    groups = H // Hkv
    scale = scale if scale is not None else 1.0 / (D**0.5)

    # bq: whole T when the score tile fits, else the largest (8-multiple)
    # divisor that does — NOT _pick_block's power-of-two list, because ragged
    # patch counts (4992 = 832·6) deserve their large divisors: bigger bq
    # directly divides the K/V refetch factor
    bq_cap = min(T, block_q or max(_ONEPASS_SCORE_BYTES // (4 * S), 8))
    bq = max(
        (d for d in range(8, bq_cap + 1, 8) if T % d == 0), default=T
    )

    # Default OFF: the pad-lane tricks (mask-in-scores + sum-in-pv) inflate the
    # K/V traffic D 72→128 (1.78×), and every one-shot program re-fetches full
    # K/V — so on long rows, where the kernel is refetch-bound, they LOSE
    # despite the VPU work they remove (measured v5e B16 H16 D72 N4992:
    # select 27.9 ms/layer vs mask-col+sum-pv 34.5 at bq=416; at short rows the
    # host-side pad+set passes dominate instead: N=768 select 13.7 ms/12L vs
    # mask-col 35.8).  Kept as an explicit opt-in for lane-aligned-D shapes
    # where the padding would be free.
    if mask_in_scores is None:
        mask_in_scores = False
    mask_in_scores = mask_in_scores and not need_unmasked and key_mask is not None
    Dp = D
    sum_col = None
    if mask_in_scores:
        Dp = (D // 128 + 1) * 128
        mask_col = jnp.where(key_mask > 0, 0.0, NEG).astype(k.dtype)  # [B,S]
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        q = q.at[..., D].set(1.0)
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        k = k.at[..., D].set(mask_col[:, :, None])
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        # the denominator rides the same free pad lanes: Σp comes out of the
        # PV matmul's ones column instead of a [bq, S] VPU reduce
        v = v.at[..., D].set(1.0)
        sum_col = D

    q = q * jnp.asarray(scale * LOG2E, q.dtype)

    qt = q.transpose(0, 2, 1, 3)  # [B,H,T,D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    use_kmask = key_mask is not None and not mask_in_scores
    grid = (B, H, T // bq)
    kernel = functools.partial(
        _onepass_kernel,
        causal=causal,
        need_unmasked=need_unmasked,
        mask_in_scores=mask_in_scores,
        bq=bq,
        sum_col=sum_col,
    )
    in_specs = [
        pl.BlockSpec((1, 1, S), lambda b, h, jq: (b, 0, 0)) if use_kmask else None,
        pl.BlockSpec((1, 1, bq, Dp), lambda b, h, jq: (b, h, jq, 0)),
        pl.BlockSpec((1, 1, S, Dp), lambda b, h, jq: (b, h // groups, 0, 0)),
        pl.BlockSpec((1, 1, S, Dp), lambda b, h, jq: (b, h // groups, 0, 0)),
    ]
    args = [qt, kt, vt]
    if use_kmask:
        args.insert(0, key_mask.astype(jnp.int32)[:, None, :])
    else:
        in_specs = in_specs[1:]
        kernel = functools.partial(_drop_kmask, kernel)
    out, lse, lse_u = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, Dp), lambda b, h, jq: (b, h, jq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, jq: (b, h, jq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, jq: (b, h, jq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dp), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    if mask_in_scores:
        out = out[..., :D]
    return (
        out.transpose(0, 2, 1, 3),
        lse[..., 0].transpose(0, 2, 1),
        lse_u[..., 0].transpose(0, 2, 1),
    )


def _drop_kmask(kernel, *refs):
    """Adapter when no key mask input exists: pass None in its slot."""
    return kernel(None, *refs)


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def flash_attention_diff(
    q, k, v, key_mask,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    need_unmasked: bool = True,
    interpret: bool = False,
):
    """``flash_attention`` with gradients.

    Forward runs the Pallas kernel; backward is an exact jnp pullback that
    rematerializes the score matrix blockwise-free (one [T,S] per head — fine for
    the short shift-pass sequences where gradients are actually needed; the long
    record pass is gradient-free and never hits this path).  Gradients cover
    ``out``, ``lse`` and ``lse_unmasked`` cotangents (the μ-gate consumes lse).
    """
    return flash_attention(
        q, k, v, key_mask, causal=causal, scale=scale,
        block_q=block_q, block_k=block_k, need_unmasked=need_unmasked,
        interpret=interpret,
    )


def _diff_fwd(q, k, v, key_mask, causal, scale, block_q, block_k, need_unmasked, interpret):
    out, lse, lse_u = flash_attention(
        q, k, v, key_mask, causal=causal, scale=scale,
        block_q=block_q, block_k=block_k, need_unmasked=need_unmasked,
        interpret=interpret,
    )
    return (out, lse, lse_u), (q, k, v, key_mask, out, lse, lse_u)


def _diff_bwd(causal, scale, block_q, block_k, need_unmasked, interpret, res, cts):
    q, k, v, key_mask, out, lse, lse_u = res
    g_out, g_lse, g_lse_u = cts
    B, T, H, D = q.shape
    S = k.shape[1]
    bq, bk = min(256, T), min(256, S)
    # the kernels avoid the O(T·S) score materialization; they beat the fused XLA
    # backward from ~2k·2k context upward (measured on v5e), below that XLA wins
    big_enough = T * S >= 2_097_152
    if big_enough and T % bq == 0 and S % bk == 0 and not interpret:
        # Pallas backward kernels (flash_backward.py): no O(T·S) materialization
        from .flash_backward import flash_attention_backward

        dq, dk, dv = flash_attention_backward(
            q, k, v, key_mask, out, lse, lse_u, g_out, g_lse, g_lse_u,
            causal=causal, scale=scale, block_q=bq, block_k=bk,
            need_unmasked=need_unmasked,
        )
        return dq, dk, dv, jnp.zeros_like(key_mask)
    return _diff_bwd_jnp(
        causal, scale, block_q, block_k, need_unmasked, interpret, res, cts
    )


def _diff_bwd_jnp(causal, scale, block_q, block_k, need_unmasked, interpret, res, cts):
    from ..models.layers import repeat_kv

    q, k, v, key_mask, out, lse, lse_u = res
    g_out, g_lse, g_lse_u = cts
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    groups = H // Hkv
    sc = scale if scale is not None else 1.0 / (D**0.5)

    qf = q.astype(jnp.float32)
    kf = repeat_kv(k, groups).astype(jnp.float32)
    vf = repeat_kv(v, groups).astype(jnp.float32)
    s = jnp.einsum("bthd,bshd->bhts", qf, kf) * sc  # [B,H,T,S]

    mask = key_mask[:, None, None, :].astype(bool)
    if causal:
        causal_m = jnp.tril(jnp.ones((T, S), bool))[None, None]
        mask = mask & causal_m
    # masked softmax from saved lse (avoids a second reduction)
    p = jnp.where(mask, jnp.exp(s - lse.transpose(0, 2, 1)[..., None]), 0.0)

    g_out_f = g_out.astype(jnp.float32)
    dv_rep = jnp.einsum("bhts,bthd->bshd", p, g_out_f)
    dp = jnp.einsum("bthd,bshd->bhts", g_out_f, vf)
    delta = jnp.sum(g_out_f * out.astype(jnp.float32), axis=-1)  # [B,T,H]
    ds = p * (dp - delta.transpose(0, 2, 1)[..., None])
    if g_lse is not None:
        ds = ds + g_lse.transpose(0, 2, 1)[..., None] * p
    if need_unmasked and g_lse_u is not None:
        p_u = jnp.exp(s - lse_u.transpose(0, 2, 1)[..., None])
        ds = ds + g_lse_u.transpose(0, 2, 1)[..., None] * p_u

    dq = jnp.einsum("bhts,bshd->bthd", ds, kf) * sc
    dk_rep = jnp.einsum("bhts,bthd->bshd", ds, qf) * sc
    # fold GQA-expanded head grads back to kv heads
    dk = dk_rep.reshape(B, S, Hkv, groups, D).sum(axis=3)
    dv = dv_rep.reshape(B, S, Hkv, groups, D).sum(axis=3)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(key_mask),
    )


flash_attention_diff.defvjp(_diff_fwd, _diff_bwd)
