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

DEFAULT_BQ = 512
DEFAULT_BK = 1024


def _kernel(
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
    # blocks strictly above the causal diagonal contribute nothing masked
    block_needed = jnp.logical_or(
        jnp.logical_not(causal), ks <= q_start + bq - 1
    )

    # with the unmasked lse required, every block must be visited; otherwise
    # whole blocks above the causal diagonal are skipped
    compute_pred = (
        jnp.asarray(True) if need_unmasked else block_needed
    )

    @pl.when(compute_pred)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        k_blk = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]

        if need_unmasked:
            # unmasked running pair (log Z₂ parity: no masks)
            m_u = mu_scr[:, 0]
            m_u_new = jnp.maximum(m_u, jnp.max(s, axis=-1))
            lu_scr[:, 0] = lu_scr[:, 0] * jnp.exp(m_u - m_u_new) + jnp.sum(
                jnp.exp(s - m_u_new[:, None]), axis=-1
            )
            mu_scr[:, 0] = m_u_new

        @pl.when(block_needed)
        def _masked():
            kmask = kmask_ref[0, 0, :] > 0
            masked = jnp.where(kmask[None, :], s, NEG)
            if causal:
                rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
                cols = ks + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
                masked = jnp.where(rows >= cols, masked, NEG)
            m = m_scr[:, 0]
            m_new = jnp.maximum(m, jnp.max(masked, axis=-1))
            p = jnp.exp(masked - m_new[:, None])
            alpha = jnp.exp(m - m_new)
            l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
            v_blk = v_ref[0, 0].astype(jnp.float32)
            acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
                p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_scr[:, 0] = m_new

    @pl.when(jk == n_kv - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[:, 0], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[:, 0] + jnp.log(l_safe))[:, None]
        if need_unmasked:
            lse_u_ref[0, 0] = (
                mu_scr[:, 0] + jnp.log(jnp.maximum(lu_scr[:, 0], 1e-30))
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
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (out [B,T,H,D], lse [B,T,H], lse_unmasked [B,T,H]).

    T and S must be divisible by the block sizes (the input pipeline buckets to
    multiples of 128); D should be 128-aligned for MXU efficiency.
    """
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    groups = H // Hkv
    scale = scale if scale is not None else 1.0 / (D**0.5)
    bq = min(block_q, T)
    bk = min(block_k, S)
    if T % bq or S % bk:
        raise ValueError(f"T={T}, S={S} must be divisible by blocks ({bq},{bk})")

    qt = q.transpose(0, 2, 1, 3)  # [B,H,T,D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (B, H, T // bq, S // bk)
    kernel = functools.partial(_kernel, scale=scale, causal=causal, need_unmasked=need_unmasked)
    out, lse, lse_u = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda b, h, jq, jk: (b, 0, jk)),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, jq, jk: (b, h, jq, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, jq, jk: (b, h // groups, jk, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, jq, jk: (b, h // groups, jk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, jq, jk: (b, h, jq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, jq, jk: (b, h, jq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, jq, jk: (b, h, jq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(key_mask.astype(jnp.int32)[:, None, :], qt, kt, vt)

    return (
        out.transpose(0, 2, 1, 3),
        lse[..., 0].transpose(0, 2, 1),
        lse_u[..., 0].transpose(0, 2, 1),
    )
