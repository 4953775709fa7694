"""Int8 prompt-KV attention for beam-search decode steps.

Decode-step attention is bound by streaming the beam-shared prompt KV region
from HBM (eval protocol shapes: 24L x B16 x T512 x Hkv8 x Dh128 x {k,v} in
bf16 = 805 MB per step, ~1.7 ms measured of a ~4.4 ms int8-serving decode
step).  Per-(position, kv-head) symmetric int8 storage halves those bytes; the
Pallas kernel dequantizes blocks in VMEM right before the MXU consumes them —
mirroring the weight-only ``ops/quant.py`` design, but for the KV cache the
scales fold into the *scores* (k) and the *probabilities* (v), so no
dequantized copy ever exists even in VMEM:

    score[m, s] = (q_pre · k8[s]) · kscale[s]        (commutes: k8 is linear)
    out[m, d]   = Σ_s (p[m, s] · vscale[s]) · v8[s, d]

The kernel runs the whole prompt-region softmax internally (log2 domain, like
``ops/flash_attention.py``) and emits the *partial* (acc, m, l) triple; the
thin generated-region + current-token parts stay XLA einsums and the two are
merged with one logsumexp-combine — so the per-layer kernel-call count stays
at one.

This is a serving-mode path (quantized decode weights imply it) — weight-only
int8 is exact per matmul, KV int8 is a ~1e-2-relative attention approximation,
both live behind the opt-in ``quant=`` serving modes (the default path keeps
HF bit parity).  The reference has no serving mode at all (eval is fp16 HF
``generate``, ``src/eval.py:49-61``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import _pick_block, _round_up

NEG = -1.0e30
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def is_quantized_kv(x: Any) -> bool:
    return isinstance(x, dict) and "q8" in x


def prompt_kv_len(pk: Any) -> int:
    """Prompt-region length of a prompt cache leaf (array or quantized dict).

    Array layouts: stacked [L,B0,Sp,Hkv,D] (5D) or per-layer [B0,Sp,Hkv,D]
    (4D) — Sp sits at axis -3 in both.  Quantized: q8 [L,B0,Hkv,Sp,D]."""
    if is_quantized_kv(pk):
        return pk["q8"].shape[3]
    return pk.shape[-3]


def quantize_prompt_kv(
    prompt_k: jnp.ndarray, prompt_v: jnp.ndarray
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """[L,B0,Sp,Hkv,D] bf16 -> {"q8": int8 [L,B0,Hkv,Sp,D], "scale": f32
    [L,B0,Hkv,Sp]} per (layer, batch, head, position) symmetric.

    One streaming pass over the prefilled prompt cache (run once per batch,
    amortized over max_new_tokens decode steps).  The [Hkv, Sp] transpose puts
    each head's keys contiguous for the kernel's [bk, D] blocks.  Quantization
    runs layer-by-layer (``lax.map``) so the f32 working set is one layer
    (~tens of MB), not the full [L,B,T,Hkv,D] stack (~1.6 GB at 8B protocol
    shapes — a transient that would not fit next to the int8 weight tree).
    """
    def one(x):
        def per_layer(xl):  # [B0,Sp,Hkv,D]
            xt = jnp.transpose(xl, (0, 2, 1, 3))  # [B0,Hkv,Sp,D]
            xf = xt.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            scale = jnp.where(amax > 0, amax / 127.0, 1.0)
            q8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
            return q8, scale[..., 0]

        q8, scale = jax.lax.map(per_layer, x)
        return {"q8": q8, "scale": scale}

    return one(prompt_k), one(prompt_v)


def _kernel(
    l_ref,      # [1] int32 scalar-prefetch: layer index
    pm_ref,     # [1, 1, bk] int32 prompt mask block
    q_ref,      # [1, 1, Mp, D]
    k_ref,      # [1, 1, 1, bk, D] int8
    ks_ref,     # [1, 1, 1, 1, bk] f32
    v_ref,      # [1, 1, 1, bk, D] int8
    vs_ref,     # [1, 1, 1, 1, bk] f32
    o_ref,      # [1, 1, Mp, D] f32
    m_ref,      # [1, 1, Mp, 1] f32 (ln domain)
    lsum_ref,   # [1, 1, Mp, 1] f32
    m_scr, l_scr, acc_scr,
):
    mp, d = q_ref.shape[2], q_ref.shape[3]
    jk = pl.program_id(2)

    @pl.when(jk == 0)
    def _init():
        m_scr[:] = jnp.full((mp, 1), NEG, jnp.float32)
        l_scr[:] = jnp.zeros((mp, 1), jnp.float32)
        acc_scr[:] = jnp.zeros((mp, d), jnp.float32)

    q = q_ref[0, 0]                       # [Mp, D] (prescaled by scale*log2e)
    k8 = k_ref[0, 0, 0]                   # [bk, D] int8
    s = jax.lax.dot_general(
        q, k8.astype(q.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                     # [Mp, bk], log2 domain
    s = s * ks_ref[0, 0, 0, 0][None, :]
    mask = pm_ref[0, 0] > 0
    s = jnp.where(mask[None, :], s, NEG)

    m_old = m_scr[:, 0]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
    p = jnp.exp2(s - m_new[:, None])      # fully-masked blocks self-correct:
    alpha = jnp.exp2(m_old - m_new)       # a later real block zeroes them via alpha
    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
    pv = (p * vs_ref[0, 0, 0, 0][None, :]).astype(q.dtype)
    v8 = v_ref[0, 0, 0]
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
        pv, v8.astype(q.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, 0] = m_new

    @pl.when(jk == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0, 0] = acc_scr[:]
        m_ref[0, 0] = m_scr[:] * LN2      # back to the ln domain for the merge
        lsum_ref[0, 0] = l_scr[:]


def prompt_attention_int8(
    qg: jnp.ndarray,   # [B, T=1, Hkv, G, D] queries, prescaled by 1/sqrt(D)
    pk: Dict[str, jnp.ndarray],   # quantized prompt keys (+ "layer" index)
    pv: Dict[str, jnp.ndarray],   # quantized prompt values
    prompt_mask: jnp.ndarray,     # [B0, Sp] (1 = attend)
    block_k: int = 1024,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Partial softmax state of the prompt region, int8 KV streamed once.

    Beams fold into the query-group axis (prompt KV is beam-shared, read at
    batch B0 = B/beams).  Returns unnormalized ``(o_p [B,Hkv,G,1,D] f32,
    m [B,Hkv,G,1] f32 ln-domain, l [B,Hkv,G,1] f32)`` for a logsumexp-combine
    with the generated-region/current-token parts.
    """
    B, T, Hkv, G, D = qg.shape
    assert T == 1, "int8 prompt attention is a single-token decode path"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q8k = pk["q8"]
    L, B0, _, Sp, _ = q8k.shape
    Kb = B // B0
    M = Kb * G
    layer = pk["layer"]

    qf = qg.reshape(B0, Kb, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(
        B0, Hkv, M, D
    )
    Mp = _round_up(max(M, 8), 8)
    if Mp != M:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, Mp - M), (0, 0)))
    qf = (qf.astype(jnp.float32) * LOG2E).astype(qg.dtype)

    bk = _pick_block(Sp, block_k)
    grid = (B0, Hkv, Sp // bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # mask/scales carry a unit sublane axis so the (sublane, lane)
            # block dims are (1==full, bk%128==0) — Mosaic-legal (a bare
            # (1, bk) over [B0, Sp] has sublane block 1 vs full B0: rejected)
            pl.BlockSpec((1, 1, bk), lambda b, h, jk, l: (b, 0, jk)),
            pl.BlockSpec((1, 1, Mp, D), lambda b, h, jk, l: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, bk, D), lambda b, h, jk, l: (l[0], b, h, jk, 0)),
            pl.BlockSpec((1, 1, 1, 1, bk), lambda b, h, jk, l: (l[0], b, h, 0, jk)),
            pl.BlockSpec((1, 1, 1, bk, D), lambda b, h, jk, l: (l[0], b, h, jk, 0)),
            pl.BlockSpec((1, 1, 1, 1, bk), lambda b, h, jk, l: (l[0], b, h, 0, jk)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Mp, D), lambda b, h, jk, l: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Mp, 1), lambda b, h, jk, l: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Mp, 1), lambda b, h, jk, l: (b, h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp, 1), jnp.float32),
            pltpu.VMEM((Mp, 1), jnp.float32),
            pltpu.VMEM((Mp, D), jnp.float32),
        ],
    )
    o, m, l = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B0, Hkv, Mp, D), jnp.float32),
            jax.ShapeDtypeStruct((B0, Hkv, Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B0, Hkv, Mp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(
        jnp.atleast_1d(layer).astype(jnp.int32),
        prompt_mask.astype(jnp.int32)[:, None, :],
        qf,
        q8k,
        pk["scale"].astype(jnp.float32)[:, :, :, None, :],
        pv["q8"],
        pv["scale"].astype(jnp.float32)[:, :, :, None, :],
    )

    def unfold(x):  # [B0,Hkv,Mp,...] -> [B,Hkv,G,1,...]
        x = x[:, :, :M]
        x = x.reshape((B0, Hkv, Kb, G) + x.shape[3:])
        x = jnp.moveaxis(x, 2, 1).reshape((B, Hkv, G) + x.shape[4:])
        return x[:, :, :, None] if x.ndim == 3 else x[:, :, :, None, :]

    return unfold(o), unfold(m[..., 0]), unfold(l[..., 0])
