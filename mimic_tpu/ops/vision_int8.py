"""int8-MXU one-pass attention for the vision tower (opt-in serving path).

The SigLIP/CLIP head size (72) pads to 128 MXU lanes, capping the bf16 QK^T
at 72/128 of peak; the v5e int8 MXU runs 2x the bf16 rate at the same lane
padding, so quantizing q/k per row buys back most of the padding waste on the
score matmul — the larger half of vision-attention FLOPs at 980px shapes
(B16 H16 N4992: scores are [bq, 4992] per program).  int8 k/v also HALVES the
per-program K/V HBM refetch that bounds long non-causal rows
(``onepass_attention`` docstring).

Attention probabilities stay bf16: int8 cannot hold a softmax row's dynamic
range (a diffuse row's weights all quantize to zero against the max-1.0
scale) — same decision as the int8 decode-cache kernel
(``decode_attention.py``).  V's int8 per-row scales fold into p before the PV
matmul, exactly as there.

Like the int8 serving mode this backs, the path is opt-in and NOT bit-parity:
per-row symmetric int8 on q/k perturbs scores by ~1e-2 relative.  The vision
encoder output feeds a connector + frozen LM whose serving copy is already
int8; measured end-to-end logit drift is the gate for enabling it
(``scripts/bench_vision_int8.py``).

Reference parity note: the reference runs the whole tower in fp16 on 40 GB
GPUs (``/root/reference/scripts/run_mimic.sh:14``); this kernel exists to fit
and speed the same model on one 16 GB TPU chip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LOG2E = 1.4426950408889634
NEG = -1e30


def _rowquant(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric int8: x [..., D] -> (q8, scale [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q8, scale


def _kernel(
    km_ref,     # [1, 1, S] int32 or None
    q_ref,      # [1, 1, bq, D] int8
    qs_ref,     # [1, 1, bq, 1] f32  (includes softmax scale * log2e)
    k_ref,      # [1, 1, S, D] int8
    ks_ref,     # [1, 1, S, 1] f32
    v_ref,      # [1, 1, S, D] int8
    vs_ref,     # [1, 1, S, 1] f32
    o_ref,      # [1, 1, bq, D] out dtype
    *,
    out_dtype,
):
    s32 = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bq, S] int8*int8 on the int8 MXU
    # dequant: row scale of q (with softmax scale folded) x column scale of k
    s = s32.astype(jnp.float32) * qs_ref[0, 0] * ks_ref[0, 0, :, 0][None, :]
    if km_ref is not None:
        s = jnp.where(km_ref[0, 0, :][None, :] > 0, s, NEG)
    m = jnp.max(s, axis=-1)
    p = jnp.exp2(s - m[:, None])
    l = jnp.maximum(jnp.sum(p, axis=-1), 1e-30)
    # v's per-row scales ride on p; p itself stays bf16 (int8 p would zero
    # out every weight below 1/127 of the row max)
    pv = (p * vs_ref[0, 0, :, 0][None, :]).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        pv, v_ref[0, 0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, D]
    o_ref[0, 0] = (acc / l[:, None]).astype(out_dtype)


def _drop_km(kernel, *refs):
    return kernel(None, *refs)


# same VMEM budget reasoning as onepass_attention: the [bq, S] f32 score tile
# dominates; int8 q/k/v blocks are half the bf16 kernel's, so the same cap
# admits the same bq
_SCORE_BYTES = 8 * 1024 * 1024


def onepass_attention_int8(
    q: jnp.ndarray,          # [B, T, H, D]
    k: jnp.ndarray,          # [B, S, H, D]   (MHA: vision towers have H == Hkv)
    v: jnp.ndarray,          # [B, S, H, D]
    key_mask: Optional[jnp.ndarray] = None,   # [B, S] (1 = attend)
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Non-causal one-pass attention with int8 q/k scores and int8 v.

    Returns out [B, T, H, D] only (vision needs no logsumexp).  Requires
    S % 128 == 0 and T % 8 == 0 like the bf16 one-pass kernel.
    """
    B, T, H, D = q.shape
    S = k.shape[1]
    assert k.shape[2] == H, "int8 vision kernel is MHA-only"
    sc = scale if scale is not None else 1.0 / (D**0.5)

    qt = q.transpose(0, 2, 1, 3)  # [B,H,T,D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    q8, qs = _rowquant(qt)
    k8, ks = _rowquant(kt)
    v8, vs = _rowquant(vt)
    qs = qs * (sc * LOG2E)  # fold softmax scale into q's dequant factor

    bq_cap = min(T, block_q or max(_SCORE_BYTES // (4 * S), 8))
    bq = max((d for d in range(8, bq_cap + 1, 8) if T % d == 0), default=T)

    use_km = key_mask is not None
    kernel = functools.partial(_kernel, out_dtype=q.dtype)
    in_specs = [
        pl.BlockSpec((1, 1, S), lambda b, h, jq: (b, 0, 0)) if use_km else None,
        pl.BlockSpec((1, 1, bq, D), lambda b, h, jq: (b, h, jq, 0)),
        pl.BlockSpec((1, 1, bq, 1), lambda b, h, jq: (b, h, jq, 0)),
        pl.BlockSpec((1, 1, S, D), lambda b, h, jq: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, S, 1), lambda b, h, jq: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, S, D), lambda b, h, jq: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, S, 1), lambda b, h, jq: (b, h, 0, 0)),
    ]
    args = [q8, qs, k8, ks, v8, vs]
    if use_km:
        args.insert(0, key_mask.astype(jnp.int32)[:, None, :])
    else:
        in_specs = in_specs[1:]
        kernel = functools.partial(_drop_km, kernel)

    out = pl.pallas_call(
        kernel,
        grid=(B, H, T // bq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, jq: (b, h, jq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3)
