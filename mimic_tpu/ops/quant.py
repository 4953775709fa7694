"""Int8 quantization: weight-only (exact) and W8A8 (int8 MXU) Pallas matmuls.

**W8A8 (compute-bound text prefill).** The v5e MXU runs int8×int8→int32 at
~2× its bf16 rate, but ONLY through Mosaic — XLA's int8 dot shows no speedup
(measured: Pallas int8 445 TF/s at bm1024/bk512/bn512 vs XLA bf16 dot 221
TF/s; the full W8A8 pipeline incl. per-token activation quantization and the
two-scale epilogue sustains 317 TF/s at 4k³ — scripts/bench_int8_mxu.py).
Handles marked ``a8`` dispatch compute-bound shapes (M ≥ 256) to this kernel:
``out[m,n] = Σ_k x8[m,k]·w8[k,n] · s_x[m] · s_w[n]`` with per-token (row)
symmetric activation scales.  W8A8 is NOT bit-parity with the bf16 path
(activation rounding); it is only ever enabled inside the opt-in int8 serving
modes.

The win needs a DEEP contraction to amortize the per-matmul activation
quantization pass (scripts/bench_w8a8_shapes.py, end-to-end vs XLA bf16 dot on
this chip): idefics2-8b prefill qkv (K4096) 1.20×, gate/up-fused (K4096,
N28672) 1.42×, down (K14336) 1.16× — but every SigLIP vision shape LOSES
(K1152: qkv 1.09×, o 1.03×, fc1 0.85×, fc2 0.68×), so W8A8 is wired into the
text tower only (``quantize_lm_params(act_quant=True)``); the vision tower
stays bf16.

Autoregressive decode on TPU is bound by streaming the (frozen) weight matrices
from HBM every step — activations are tiny ([B·beams, D] rows).  Per-channel
symmetric int8 storage halves those bytes; the Pallas kernel converts each weight
block to the activation dtype *in VMEM* right before the MXU consumes it, so the
dequantized copy never exists in HBM.  (XLA's ``convert(int8)→dot`` only fuses
partially — measured 1.2× in round 1; this kernel is the roadmap's
"dequant-fused matmul" follow-up.)

Math is exact per block: int8 values (−127..127) are exactly representable in
bfloat16, accumulation is fp32, and the per-output-channel scale multiplies the
fp32 accumulator once at the end — identical to ``(x @ dequant(W))`` up to fp32
summation order.

The reference has no quantization support (pure fp16 torch,
``src/config/train.yaml:16``); this is a TPU-native serving addition, opt-in via
``LVLMRunner(quant="int8")`` / ``quantize_lm_params`` so the default path keeps
bit parity with HF.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

# weight names quantized inside the decoder layer stack (all [L, K, N] stacked)
DECODER_MATMUL_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# quantization transform
# ---------------------------------------------------------------------------


def quantize_weight(
    w: jnp.ndarray, act_quant: bool = False, pad_k: bool = False
) -> Params:
    """[..., K, N] float → {"q8": int8 [..., K, N'], "scale": f32 [..., N]}.

    Per-output-channel symmetric: scale_n = max_k |w[k,n]| / 127.  The stored
    ``q8`` is zero-padded on N to a lane multiple (128) for the kernel; ``scale``
    keeps the ORIGINAL N so ``qdot`` knows how much to slice back off.

    ``act_quant=True`` marks the handle for W8A8 dispatch (``qdot`` then runs
    compute-bound shapes through the int8×int8 MXU kernel with per-token
    activation quantization — ~2× the bf16 dot rate, not bit-parity).  The
    marker is a zero-size array key so the handle stays a plain array pytree
    (tree.map / nbytes / leaf counting all keep working).

    ``pad_k=True`` zero-pads the contraction axis to a lane multiple too (for
    ragged-K weights like the SigLIP fc2's K=4304=16·269 that no hardware
    block divides); ``qdot`` zero-pads the activation columns to match — exact,
    zero rows contribute nothing.

    Stacked weights ([L, K, N]) quantize layer-by-layer via ``lax.map`` so the
    fp32 intermediate is one layer, not the whole stack — an 8B model's gate/up
    stack would otherwise need a 7.5 GB fp32 transient, which matters when
    quantizing on-device (16 GB HBM).
    """
    def one(w2):
        wf = w2.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, N]
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        n = w2.shape[-1]
        n_pad = _round_up(n, 128) - n
        k_pad = _round_up(w2.shape[-2], 128) - w2.shape[-2] if pad_k else 0
        if n_pad or k_pad:
            pad = [(0, 0)] * (w2.ndim - 2) + [(0, k_pad), (0, n_pad)]
            q = jnp.pad(q, pad)
        return q, scale[..., 0, :]

    if w.ndim >= 3:
        lead = w.shape[:-2]
        flat = w.reshape((-1,) + w.shape[-2:])
        q, scale = jax.lax.map(one, flat)
        q = q.reshape(lead + q.shape[1:])
        scale = scale.reshape(lead + scale.shape[1:])
    else:
        q, scale = one(w)
    out = {"q8": q, "scale": scale}
    if act_quant:
        out["a8"] = jnp.zeros((0,), jnp.int8)
    return out


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q8" in w


def mark_act_quant(params: Params) -> Params:
    """Mark a quantized tree's decoder self-attn layer stacks for W8A8 dispatch.

    Pure re-tagging — adds the zero-size ``a8`` key to already-quantized
    handles in the ``lm.decoder.layers`` group (the same selection
    ``quantize_lm_params(act_quant=True)`` makes), without touching the weight
    bytes.  Lets serving code toggle W8A8 prefill on an existing int8-memory
    tree."""
    import copy

    out = copy.copy(params)
    lm = dict(out["lm"]) if "lm" in out else out
    dec = dict(lm["decoder"])
    layers = {
        k: dict(v, a8=jnp.zeros((0,), jnp.int8)) if is_quantized(v) else v
        for k, v in dec["layers"].items()
    }
    dec["layers"] = layers
    lm["decoder"] = dec
    if "lm" in out:
        out["lm"] = lm
        return out
    return lm


def concat_quantized(parts) -> Params:
    """Fuse already-quantized weights along N (``quantize(concat) ==
    concat(quantize)`` because scales are per output column).  Only valid when
    no part carried lane padding (every N already a 128-multiple) — otherwise
    the fused column layout would include interior pad columns."""
    for p in parts:
        if p["q8"].shape[-1] != p["scale"].shape[-1]:
            raise ValueError(
                "concat_quantized needs unpadded parts (N a 128-multiple); "
                f"got stored N {p['q8'].shape[-1]} vs scale N {p['scale'].shape[-1]}"
            )
    out = {
        "q8": jnp.concatenate([p["q8"] for p in parts], axis=-1),
        "scale": jnp.concatenate([p["scale"] for p in parts], axis=-1),
    }
    if all("a8" in p for p in parts):
        out["a8"] = jnp.zeros((0,), jnp.int8)
    return out


def quantize_lm_params(
    params: Params, fuse: bool = True, act_quant: bool = False
) -> Params:
    """Quantize the text tower's decode-hot matmuls of an LVLM/LM param tree.

    Covers the stacked decoder layer projections, IDEFICS-1 cross-attention
    layers, and the (untied) lm head.  Embedding table, norms, biases, and the
    vision tower / connector (prefill-only, run once per query) stay in the
    original dtype.  Returns a new tree; the input is not mutated.

    ``fuse=True`` (default) additionally concatenates the self-attn q/k/v
    projections into one ``qkv_proj`` [L, D, D+2·Dkv] and gate/up into one
    ``gateup_proj`` [L, D, 2F] before quantizing: decode matmuls are bound by
    per-kernel-call overhead at small transfer sizes (measured on v5e: 150-180
    GB/s for separate 2-4 MB calls vs 280-360 GB/s fused), and per-output-channel
    scales make fusion exact.  Cross-attention layers stay unfused (q reads the
    text stream, k/v the image stream — different inputs).

    ``act_quant=True`` additionally marks the self-attn layer stacks for W8A8
    prefill dispatch (int8 MXU; see module docstring — not bit-parity, serving
    modes only).  Cross-attention layers and the lm head stay weight-only:
    cross handles are sliced by ``jax.tree.map`` per group, and head logits
    feed beam selection where activation rounding is least welcome.
    """
    import copy

    out = copy.copy(params)
    lm = dict(params["lm"]) if "lm" in params else dict(params)
    dec = dict(lm["decoder"])
    for group in ("layers", "cross"):
        if group not in dec:
            continue
        g = dict(dec[group])
        aq = act_quant and group == "layers"
        if fuse and group == "layers":
            if "q_proj" in g and not is_quantized(g["q_proj"]):
                g["qkv_proj"] = quantize_weight(
                    jnp.concatenate([g.pop("q_proj"), g.pop("k_proj"), g.pop("v_proj")], axis=-1),
                    act_quant=aq,
                )
            if "gate_proj" in g and not is_quantized(g["gate_proj"]):
                g["gateup_proj"] = quantize_weight(
                    jnp.concatenate([g.pop("gate_proj"), g.pop("up_proj")], axis=-1),
                    act_quant=aq,
                )
        for name in DECODER_MATMUL_KEYS:
            if name in g and not is_quantized(g[name]):
                g[name] = quantize_weight(g[name], act_quant=aq)
        dec[group] = g
    lm["decoder"] = dec
    if "lm_head" in lm and not is_quantized(lm["lm_head"]):
        lm["lm_head"] = quantize_weight(lm["lm_head"])
    if "lm" in params:
        out["lm"] = lm
        return out
    return lm


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    """One (m, n) output block; K swept innermost with an fp32 VMEM accumulator.

    The int8 weight block is converted to the activation dtype in VMEM —
    conversion cost is bk·bn VPU elements per bm·bk·bn MXU MACs (ratio 1/bm).
    """
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_block(n: int, cap: int, floor: int = 8) -> int:
    for b in (cap, 2048, 1024, 512, 384, 256, 128, 64, 48, 32, 16, 8):
        if b <= cap and n % b == 0:
            return b
    return n


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret")
)
def int8_matmul(
    x: jnp.ndarray,        # [M, K] activations
    wq: jnp.ndarray,       # [K, N] int8
    scale: jnp.ndarray,    # [N] fp32 per-output-channel
    out_dtype=None,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``(x @ dequant(wq)) * scale`` → [M, N] without an HBM weight copy."""
    M, K = x.shape
    N = wq.shape[1]
    out_dtype = out_dtype or x.dtype
    bm = _pick_block(M, block_m)
    bn = _pick_block(N, block_n)
    bk = _pick_block(K, block_k)
    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x, wq, scale[None, :])


def _kernel_stacked(l_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
    """Like ``_kernel`` but the weight/scale blocks come from a stacked [L,...]
    array at the prefetched layer index — no slice materialization in HBM."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[0].astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret")
)
def int8_matmul_stacked(
    x: jnp.ndarray,        # [M, K]
    wq: jnp.ndarray,       # [L, K, N] int8 (stacked layers)
    scale: jnp.ndarray,    # [L, N] fp32
    layer: jnp.ndarray,    # scalar int32 layer index
    out_dtype=None,
    block_m: int = 512,
    block_n: int = 1024,   # best measured on v5e for decode-row shapes
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """``(x @ dequant(wq[layer])) * scale[layer]`` reading blocks straight out of
    the stacked array (scalar-prefetch index) — inside a layer ``scan`` this
    avoids the HBM round trip XLA inserts when a dynamic slice feeds an opaque
    kernel call."""
    M, K = x.shape
    L, _, N = wq.shape
    out_dtype = out_dtype or x.dtype
    bm = _pick_block(M, block_m)
    bn = _pick_block(N, block_n)
    bk = _pick_block(K, block_k)
    grid = (M // bm, N // bn, K // bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # index maps receive (*grid_indices, *scalar_prefetch_refs)
            pl.BlockSpec((bm, bk), lambda m, n, k, l: (m, k)),
            pl.BlockSpec((1, bk, bn), lambda m, n, k, l: (l[0], k, n)),
            pl.BlockSpec((1, 1, bn), lambda m, n, k, l: (l[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, l: (m, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), x, wq, scale[:, None, :])


# ---------------------------------------------------------------------------
# W8A8: int8×int8→int32 MXU matmuls (compute-bound prefill/vision shapes)
# ---------------------------------------------------------------------------


def quantize_rows(x: jnp.ndarray):
    """Per-row symmetric int8: [..., K] float → (int8 [..., K], f32 [...] scales).

    One fused XLA elementwise pass (abs-max reduce + round) — negligible next
    to the matmul it feeds (K·1 vs K·N work per row)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return x8, s[..., 0]


def _w8a8_kernel(xs_ref, x_ref, w_ref, sw_ref, o_ref, acc_ref):
    """One (m, n) block of ``(x8 @ w8) · s_x[m] · s_w[n]`` with int32 VMEM acc.

    The int8×int8 dot hits the MXU's double-rate int8 mode (Mosaic-only);
    both scales apply once to the int32 accumulator at the last K step."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _finalize():
        sx = xs_ref[:].astype(jnp.float32)  # [bm, 1]
        sw = sw_ref[:].astype(jnp.float32)  # [1, bn]
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * sx * sw).astype(o_ref.dtype)


def _w8a8_kernel_stacked(l_ref, xs_ref, x_ref, w_ref, sw_ref, o_ref, acc_ref):
    """``_w8a8_kernel`` reading weight/scale blocks from a stacked [L, ...]
    array at the scalar-prefetched layer index."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _finalize():
        sx = xs_ref[:].astype(jnp.float32)      # [bm, 1]
        sw = sw_ref[0].astype(jnp.float32)      # [1, bn]
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * sx * sw).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret")
)
def w8a8_matmul(
    x8: jnp.ndarray,       # [M, K] int8 activations
    xs: jnp.ndarray,       # [M] f32 per-row activation scales
    wq: jnp.ndarray,       # [K, N] int8
    scale: jnp.ndarray,    # [N] f32 per-output-channel weight scales
    out_dtype=jnp.bfloat16,
    block_m: int = 1024,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x8.shape
    N = wq.shape[1]
    bm = _pick_block(M, block_m)
    bn = _pick_block(N, block_n)
    bk = _pick_block(K, block_k)
    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        functools.partial(_w8a8_kernel),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(xs[:, None].astype(jnp.float32), x8, wq, scale[None, :])


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret")
)
def w8a8_matmul_stacked(
    x8: jnp.ndarray,       # [M, K] int8
    xs: jnp.ndarray,       # [M] f32
    wq: jnp.ndarray,       # [L, K, N] int8 (stacked layers)
    scale: jnp.ndarray,    # [L, N] f32
    layer: jnp.ndarray,    # scalar int32
    out_dtype=jnp.bfloat16,
    block_m: int = 1024,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x8.shape
    L, _, N = wq.shape
    bm = _pick_block(M, block_m)
    bn = _pick_block(N, block_n)
    bk = _pick_block(K, block_k)
    grid = (M // bm, N // bn, K // bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 1), lambda m, n, k, l: (m, 0)),
            pl.BlockSpec((bm, bk), lambda m, n, k, l: (m, k)),
            pl.BlockSpec((1, bk, bn), lambda m, n, k, l: (l[0], k, n)),
            pl.BlockSpec((1, 1, bn), lambda m, n, k, l: (l[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, l: (m, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    return pl.pallas_call(
        _w8a8_kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(
        jnp.atleast_1d(layer).astype(jnp.int32),
        xs[:, None].astype(jnp.float32),
        x8,
        wq,
        scale[:, None, :],
    )


def _mlp_kernel(l_ref, xn_ref, g_ref, u_ref, sg_ref, su_ref, d_ref, sd_ref,
                o_ref, acc_ref):
    """One F-block of the fused SwiGLU MLP: silu(x·Wg)·(x·Wu) @ Wd, accumulated.

    Per grid step the three int8 weight blocks (gate, up, down-rows) stream
    HBM→VMEM once and convert to the activation dtype in VMEM; the [M,2F]
    gate/up intermediate never exists in HBM.  gate/up scales apply before the
    nonlinearity (per-column, exact); the down scale is per OUTPUT column so it
    factors out of the F-sum and applies once at the end.
    """
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]
    g = jax.lax.dot_general(
        xn, g_ref[0].astype(xn.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sg_ref[0].astype(jnp.float32)
    u = jax.lax.dot_general(
        xn, u_ref[0].astype(xn.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * su_ref[0].astype(jnp.float32)
    a = (jax.nn.silu(g) * u).astype(xn.dtype)
    acc_ref[:] += jax.lax.dot_general(
        a, d_ref[0].astype(xn.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(0) - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] * sd_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_f", "interpret"))
def fused_mlp_stacked(
    xn: jnp.ndarray,        # [M, D] normed activations
    gu_q8: jnp.ndarray,     # [L, D, 2F] int8 (fused gate|up)
    gu_scale: jnp.ndarray,  # [L, 2F] f32
    down_q8: jnp.ndarray,   # [L, F, D] int8
    down_scale: jnp.ndarray,  # [L, D] f32
    layer: jnp.ndarray,     # scalar int32
    out_dtype=None,
    block_f: int = 0,       # 0 = auto by VMEM budget
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole SwiGLU MLP of one stacked layer in ONE kernel call.

    ``silu(xn @ Wg) * (xn @ Wu) @ Wd`` with all three weights int8-streamed.
    vs the two-call path (gateup matmul → XLA silu·mul → down matmul) this
    saves one kernel-call overhead, the [M,2F] HBM round trip, and overlaps the
    down-projection of block j with the gate/up DMA of block j+1.
    """
    M, D = xn.shape
    L, _, F2 = gu_q8.shape
    F = F2 // 2
    out_dtype = out_dtype or xn.dtype
    if not block_f:
        # 3 int8 blocks of D·bf bytes each, double-buffered, + [M,D] f32 acc
        block_f = 512 if 6 * D * 512 + M * D * 6 <= 12 * 1024 * 1024 else 256
    bf = _pick_block(F, block_f)
    grid = (F // bf,)
    nb = F // bf  # up-half block offset (F = nb·bf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, D), lambda j, l: (0, 0)),
            pl.BlockSpec((1, D, bf), lambda j, l: (l[0], 0, j)),          # gate
            pl.BlockSpec((1, D, bf), lambda j, l: (l[0], 0, nb + j)),     # up
            pl.BlockSpec((1, 1, bf), lambda j, l: (l[0], 0, j)),
            pl.BlockSpec((1, 1, bf), lambda j, l: (l[0], 0, nb + j)),
            pl.BlockSpec((1, bf, D), lambda j, l: (l[0], j, 0)),          # down
            pl.BlockSpec((1, 1, D), lambda j, l: (l[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, D), lambda j, l: (0, 0)),
        scratch_shapes=[pltpu.VMEM((M, D), jnp.float32)],
    )
    return pl.pallas_call(
        _mlp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(
        jnp.atleast_1d(layer).astype(jnp.int32),
        xn,
        gu_q8, gu_q8,
        gu_scale[:, None, :], gu_scale[:, None, :],
        down_q8,
        down_scale[:, None, :],
    )


def fused_mlp(xn: jnp.ndarray, gateup: Any, down: Any) -> Optional[jnp.ndarray]:
    """SwiGLU MLP through one fused kernel when eligible, else ``None``.

    Eligible: both weights are stacked quantized handles (carry a ``layer``
    index), running on TPU, decode-sized M (< 256 rows — prefill-sized M is
    compute-bound and takes the dequant+XLA-dot path in ``qdot``), no lane
    padding on either weight, and F block-alignable.
    """
    if not (is_quantized(gateup) and is_quantized(down)):
        return None
    if gateup.get("layer") is None or down.get("layer") is None:
        return None
    lead = xn.shape[:-1]
    D = xn.shape[-1]
    xm = xn.reshape(-1, D)
    M = xm.shape[0]
    if jax.default_backend() != "tpu" or M >= 256:
        return None
    gu_q8, gu_scale = gateup["q8"], gateup["scale"]
    d_q8, d_scale = down["q8"], down["scale"]
    if gu_q8.shape[-1] != gu_scale.shape[-1] or d_q8.shape[-1] != d_scale.shape[-1]:
        return None  # lane-padded storage: interior pad columns break the split
    F = gu_q8.shape[-1] // 2
    if d_q8.shape[-2] != F or F % 256 != 0:
        return None
    m_pad = _round_up(max(M, 16), 16) - M
    if m_pad:
        xm = jnp.pad(xm, ((0, m_pad), (0, 0)))
    out = fused_mlp_stacked(
        xm, gu_q8, gu_scale.astype(jnp.float32), d_q8,
        d_scale.astype(jnp.float32), gateup["layer"], out_dtype=xn.dtype,
    )
    if m_pad:
        out = out[:M]
    return out.reshape(*lead, D)


def _input_vjp(run_kernel, wq, scale, layer):
    """Wrap a Pallas matmul call so it differentiates w.r.t. the ACTIVATIONS.

    Frozen-weight training (the MimIC regime: the base model never gets
    gradients, reference ``src/shift_model.py`` trains only shift params)
    needs dX through every int8 matmul of the shift pass.  The kernels have no
    transpose rule, but the exact pullback of ``x @ deq(W)`` is just
    ``dY @ deq(W)ᵀ`` — computed here as an XLA dot with the dequantization
    fused into it (no persistent dequantized copy).  For W8A8 forwards this is
    a straight-through estimate (the per-token activation rounding is treated
    as identity — standard QAT practice).
    """

    @jax.custom_vjp
    def f(xm):
        return run_kernel(xm)

    def fwd(xm):
        return run_kernel(xm), None

    def bwd(_, dy):
        wl = wq if layer is None else jnp.take(wq, layer, axis=0)
        sl = scale if layer is None else jnp.take(scale, layer, axis=0)
        deq = wl.astype(jnp.float32) * sl.astype(jnp.float32)[None, :]
        dx = jnp.dot(dy.astype(jnp.float32), deq.T).astype(dy.dtype)
        return (dx,)

    f.defvjp(fwd, bwd)
    return f


def qdot(
    x: jnp.ndarray,
    w: Any,
    preferred_element_type=None,
) -> jnp.ndarray:
    """``jnp.dot`` that also accepts a quantized weight dict.

    For plain arrays this is exactly ``jnp.dot(x, w)``.  For quantized weights it
    runs the dequant-fused kernel on TPU (jnp fallback elsewhere) and slices the
    lane padding back off.  ``x`` may have any leading shape ([..., K]).
    Every path is differentiable w.r.t. ``x`` (``_input_vjp``), so a frozen
    int8 tower can sit inside the dual-pass train step.
    """
    if not is_quantized(w):
        if preferred_element_type is not None:
            return jnp.dot(x, w, preferred_element_type=preferred_element_type)
        return jnp.dot(x, w)

    wq, scale = w["q8"], w["scale"]
    layer = w.get("layer")  # stacked handle: wq [L,K,N], scale [L,N], layer scalar
    n = scale.shape[-1]
    n_stored = wq.shape[-1]
    lead = x.shape[:-1]
    K = x.shape[-1]
    out_dtype = preferred_element_type or x.dtype

    xm = x.reshape(-1, K)
    M = xm.shape[0]
    k_stored = wq.shape[-2]
    if k_stored != K:
        # pad_k storage: zero activation columns contribute nothing (exact)
        xm = jnp.pad(xm, ((0, 0), (0, k_stored - K)))
    if jax.default_backend() == "tpu" and M >= 256:
        if "a8" in w:
            # W8A8: per-token activation quantization + int8×int8 MXU matmul
            # (~2× the bf16 dot rate; Mosaic-only — see module docstring).
            # Opt-in via quantize-with-act_quant; not bit-parity.
            sc = scale
            if n != n_stored:
                pad = [(0, 0)] * (sc.ndim - 1) + [(0, n_stored - n)]
                sc = jnp.pad(sc, pad)

            def run_w8a8(xm_):
                m_pad = _round_up(xm_.shape[0], 128) - xm_.shape[0]
                x8, xs = quantize_rows(xm_)
                if m_pad:
                    x8 = jnp.pad(x8, ((0, m_pad), (0, 0)))
                    xs = jnp.pad(xs, ((0, m_pad),))
                if layer is not None:
                    o = w8a8_matmul_stacked(
                        x8, xs, wq, sc.astype(jnp.float32), layer,
                        out_dtype=out_dtype,
                    )
                else:
                    o = w8a8_matmul(
                        x8, xs, wq, sc.astype(jnp.float32), out_dtype=out_dtype
                    )
                return o[: xm_.shape[0]] if m_pad else o

            out = _input_vjp(run_w8a8, wq, sc, layer)(xm)
            if n != n_stored:
                out = out[:, :n]
            return out.reshape(*lead, n)
        # compute-bound shapes (prefill in single-copy int8 mode): one XLA
        # dequant materialization + full-speed dot beats the streaming kernel,
        # whose weight blocks are re-fetched M/bm times
        wl = wq if layer is None else jnp.take(wq, layer, axis=0)
        sl = scale if layer is None else jnp.take(scale, layer, axis=0)
        deq = (wl[:, :n].astype(jnp.float32) * sl.astype(jnp.float32)[None, :]).astype(
            x.dtype
        )
        return jnp.dot(xm, deq, preferred_element_type=out_dtype).astype(
            out_dtype
        ).reshape(*lead, n)
    if jax.default_backend() == "tpu":
        # sublane alignment: pad tiny/ragged M (decode rows) up to a 16-multiple.
        # CRITICAL: the padded M must then be ONE m-block — otherwise the grid's
        # m axis re-streams the whole weight stack once per m-block (measured:
        # M=48 → bm=16 → every int8 byte fetched 3× per call; fixing this took
        # the eval-protocol int8 serving mode from 70.2 to 74.6 q/s)
        m_pad = _round_up(max(M, 16), 16) - M
        if m_pad:
            xm = jnp.pad(xm, ((0, m_pad), (0, 0)))
        if n != n_stored:
            pad = [(0, 0)] * (scale.ndim - 1) + [(0, n_stored - n)]
            scale = jnp.pad(scale, pad)
        # measured on v5e (scripts/bench_quant_matmul.py sweep; r4 stacked-decode
        # sweep /tmp recorded in docs/KERNELS.md): wide blocks win; big-N fused
        # matmuls (gateup) want the whole K per block; K=2048 mats (qkv/o) gain
        # ~4% from bk 512→1024 (larger DMA per grid step)
        bm = xm.shape[0] if xm.shape[0] <= 512 else 512
        bn = 2048
        bk = 2048 if n_stored >= 8192 else 1024
        if layer is not None:
            run = lambda xm_: int8_matmul_stacked(
                xm_, wq, scale.astype(jnp.float32), layer, out_dtype=out_dtype,
                block_m=bm, block_n=bn, block_k=bk,
            )
        else:
            run = lambda xm_: int8_matmul(
                xm_, wq, scale.astype(jnp.float32), out_dtype=out_dtype,
                block_m=bm, block_n=bn, block_k=bk,
            )
        out = _input_vjp(run, wq, scale, layer)(xm)
        if m_pad:
            out = out[:M]
        if n != n_stored:
            out = out[:, :n]
    else:
        if layer is not None:
            wq = jnp.take(wq, layer, axis=0)
            scale = jnp.take(scale, layer, axis=0)
        deq = wq[:, :n].astype(jnp.float32) * scale.astype(jnp.float32)[None, :]
        out = jnp.dot(xm.astype(jnp.float32), deq).astype(out_dtype)
    return out.reshape(*lead, n)
