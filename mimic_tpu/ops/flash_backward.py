"""Pallas backward kernels for flash attention.

Two kernels (standard flash-backward split):

- **dq**: grid (B, H, Tq/bq, S/bk) with KV innermost; accumulates
  dq[t] = σ Σ_s ds[t,s] k[s] in VMEM scratch.
- **dkv**: grid (B, H, S/bk, Tq/bq) with Q innermost; accumulates
  dk[s] = σ Σ_t ds[t,s] q[t] and dv[s] = Σ_t p[t,s] g_out[t].

where, recomputing probabilities from the saved log-normalizers (no second
softmax reduction):

  p    = exp(σ q·k − lse)        (masked set)
  p_u  = exp(σ q·k − lse_u)      (unmasked set, reference do_shift's log Z₂)
  ds   = p ∘ (g_out·vᵀ − Δ) + g_lse ∘ p + g_lse_u ∘ p_u
  Δ[t] = Σ_d g_out[t,d] out[t,d]   (precomputed outside)

GQA is handled like the forward: q heads map onto kv heads by index; dk/dv are
emitted per *expanded* head and folded (summed over the group) outside.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30


def _pick_block(n: int, cap: int) -> int:
    """Largest hardware-friendly block ≤ cap that divides n (full length fallback)."""
    for b in (cap, 1024, 512, 384, 256, 128, 64, 32, 16, 8):
        if b <= cap and n % b == 0:
            return b
    return n


def _recompute_ds(
    q_blk, k_blk, v_blk, g_out_blk, lse_blk, lse_u_blk, delta_blk, g_lse_blk,
    g_lse_u_blk, kmask_blk, q_start, ks, scale, causal, need_unmasked,
):
    """Shared ds computation for one (q block, kv block) tile.  Shapes:
    q/g_out [bq,D], k/v [bk,D], lse/lse_u/delta/g_lse/g_lse_u [bq], kmask [bk].
    Returns (ds [bq,bk], p [bq,bk])."""
    bq, bk = q_blk.shape[0], k_blk.shape[0]
    s = jax.lax.dot_general(
        q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    mask = jnp.broadcast_to(kmask_blk[None, :], (bq, bk))
    if causal:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = ks + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = mask & (rows >= cols)
    p = jnp.where(mask, jnp.exp(s - lse_blk[:, None]), 0.0)
    dp = jax.lax.dot_general(
        g_out_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_blk[:, None] + g_lse_blk[:, None])
    if need_unmasked:
        p_u = jnp.exp(s - lse_u_blk[:, None])
        ds = ds + g_lse_u_blk[:, None] * p_u
    return ds, p


def _dq_kernel(
    kmask_ref, q_ref, k_ref, v_ref, g_out_ref, lse_ref, lse_u_ref, delta_ref,
    g_lse_ref, g_lse_u_ref, dq_ref, acc_scr,
    *, scale: float, causal: bool, need_unmasked: bool,
):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    jq, jk = pl.program_id(2), pl.program_id(3)
    n_kv = pl.num_programs(3)
    bk = k_ref.shape[2]

    @pl.when(jk == 0)
    def _init():
        acc_scr[:] = jnp.zeros((bq, d), jnp.float32)

    q_start, ks = jq * bq, jk * bk
    needed = jnp.logical_or(
        jnp.logical_or(jnp.logical_not(causal), ks <= q_start + bq - 1),
        need_unmasked,
    )

    @pl.when(needed)
    def _compute():
        ds, _ = _recompute_ds(
            q_ref[0, 0], k_ref[0, 0],
            v_ref[0, 0], g_out_ref[0, 0],
            lse_ref[0, 0][:, 0], lse_u_ref[0, 0][:, 0], delta_ref[0, 0][:, 0],
            g_lse_ref[0, 0][:, 0], g_lse_u_ref[0, 0][:, 0],
            kmask_ref[0, 0, :] > 0, q_start, ks, scale, causal, need_unmasked,
        )
        acc_scr[:] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jk == n_kv - 1)
    def _finalize():
        dq_ref[0, 0] = (acc_scr[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    kmask_ref, q_ref, k_ref, v_ref, g_out_ref, lse_ref, lse_u_ref, delta_ref,
    g_lse_ref, g_lse_u_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale: float, causal: bool, need_unmasked: bool,
):
    bk, d = k_ref.shape[2], k_ref.shape[3]
    jk, jq = pl.program_id(2), pl.program_id(3)
    n_q = pl.num_programs(3)
    bq = q_ref.shape[2]

    @pl.when(jq == 0)
    def _init():
        dk_scr[:] = jnp.zeros((bk, d), jnp.float32)
        dv_scr[:] = jnp.zeros((bk, d), jnp.float32)

    q_start, ks = jq * bq, jk * bk
    needed = jnp.logical_or(
        jnp.logical_or(jnp.logical_not(causal), ks <= q_start + bq - 1),
        need_unmasked,
    )

    @pl.when(needed)
    def _compute():
        g_out = g_out_ref[0, 0]
        ds, p = _recompute_ds(
            q_ref[0, 0], k_ref[0, 0],
            v_ref[0, 0], g_out,
            lse_ref[0, 0][:, 0], lse_u_ref[0, 0][:, 0], delta_ref[0, 0][:, 0],
            g_lse_ref[0, 0][:, 0], g_lse_u_ref[0, 0][:, 0],
            kmask_ref[0, 0, :] > 0, q_start, ks, scale, causal, need_unmasked,
        )
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_scr[:] += jax.lax.dot_general(
            p.astype(g_out.dtype), g_out, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jq == n_q - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def flash_attention_backward(
    q: jnp.ndarray,          # [B,T,H,D]
    k: jnp.ndarray,          # [B,S,Hkv,D]
    v: jnp.ndarray,          # [B,S,Hkv,D]
    key_mask: jnp.ndarray,   # [B,S]
    out: jnp.ndarray,        # [B,T,H,D] saved forward output
    lse: jnp.ndarray,        # [B,T,H]
    lse_u: jnp.ndarray,      # [B,T,H]
    g_out: jnp.ndarray,      # [B,T,H,D]
    g_lse: Optional[jnp.ndarray],    # [B,T,H] or None
    g_lse_u: Optional[jnp.ndarray],  # [B,T,H] or None
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    need_unmasked: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dq [B,T,H,D], dk [B,S,Hkv,D], dv [B,S,Hkv,D])."""
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    scale = scale if scale is not None else 1.0 / (D**0.5)
    bq = _pick_block(T, block_q)
    bk = _pick_block(S, block_k)

    f32 = jnp.float32
    delta = jnp.sum(g_out.astype(f32) * out.astype(f32), axis=-1)  # [B,T,H]
    zeros_th = jnp.zeros((B, T, H), f32)
    g_lse = zeros_th if g_lse is None else g_lse.astype(f32)
    g_lse_u = zeros_th if g_lse_u is None else g_lse_u.astype(f32)

    # [B,H,T,*] layouts; per-row scalars carried as [B,H,T,1] for tiling
    tr = lambda x: x.transpose(0, 2, 1, 3)
    col = lambda x: x.transpose(0, 2, 1)[..., None]
    qt, got = tr(q), tr(g_out)
    kt, vt = tr(k), tr(v)
    lse_c, lse_u_c, delta_c = col(lse.astype(f32)), col(lse_u.astype(f32)), col(delta)
    g_lse_c, g_lse_u_c = col(g_lse), col(g_lse_u)
    km = key_mask.astype(jnp.int32)[:, None, :]

    common = dict(scale=scale, causal=causal, need_unmasked=need_unmasked)

    # ---- dq ----
    grid = (B, H, T // bq, S // bk)
    qmap = lambda b, h, jq, jk: (b, h, jq, 0)
    kmap = lambda b, h, jq, jk: (b, h // G, jk, 0)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda b, h, jq, jk: (b, 0, jk)),
            pl.BlockSpec((1, 1, bq, D), qmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, bq, D), qmap),
            pl.BlockSpec((1, 1, bq, 1), qmap),
            pl.BlockSpec((1, 1, bq, 1), qmap),
            pl.BlockSpec((1, 1, bq, 1), qmap),
            pl.BlockSpec((1, 1, bq, 1), qmap),
            pl.BlockSpec((1, 1, bq, 1), qmap),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), qmap),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), f32)],
        interpret=interpret,
    )(km, qt, kt, vt, got, lse_c, lse_u_c, delta_c, g_lse_c, g_lse_u_c)

    # ---- dk, dv (per expanded head, folded below) ----
    grid2 = (B, H, S // bk, T // bq)
    qmap2 = lambda b, h, jk, jq: (b, h, jq, 0)
    kmap2 = lambda b, h, jk, jq: (b, h // G, jk, 0)
    dk_rep, dv_rep = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid=grid2,
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda b, h, jk, jq: (b, 0, jk)),
            pl.BlockSpec((1, 1, bq, D), qmap2),
            pl.BlockSpec((1, 1, bk, D), kmap2),
            pl.BlockSpec((1, 1, bk, D), kmap2),
            pl.BlockSpec((1, 1, bq, D), qmap2),
            pl.BlockSpec((1, 1, bq, 1), qmap2),
            pl.BlockSpec((1, 1, bq, 1), qmap2),
            pl.BlockSpec((1, 1, bq, 1), qmap2),
            pl.BlockSpec((1, 1, bq, 1), qmap2),
            pl.BlockSpec((1, 1, bq, 1), qmap2),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, h, jk, jq: (b, h, jk, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, jk, jq: (b, h, jk, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, S, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bk, D), f32), pltpu.VMEM((bk, D), f32)],
        interpret=interpret,
    )(km, qt, kt, vt, got, lse_c, lse_u_c, delta_c, g_lse_c, g_lse_u_c)

    dq = dq.transpose(0, 2, 1, 3)
    # fold GQA groups: expanded head h = kv_head*G + g
    dk = dk_rep.reshape(B, Hkv, G, S, D).sum(axis=2).transpose(0, 2, 1, 3)
    dv = dv_rep.reshape(B, Hkv, G, S, D).sum(axis=2).transpose(0, 2, 1, 3)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)
