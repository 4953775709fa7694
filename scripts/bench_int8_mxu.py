"""v5e MXU int8 rate through Pallas/Mosaic — block tuning + dequant epilogue.

First probe showed Pallas int8xint8->int32 at 250 TF/s vs 155 TF/s bf16
(XLA's int8 dot shows no speedup — the 2x int8 MXU mode is Mosaic-only on
this backend).  This tunes block shapes and measures the full W8A8 pipeline:
per-token activation quantization (VPU) + int8 matmul + per-row/col scale
epilogue, which is what a serving-mode vision/prefill matmul would pay.

Usage: python scripts/bench_int8_mxu.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 4096, 4096, 4096
ITERS = 8


def _mm_kernel(a_ref, b_ref, o_ref, acc_scr, *, n_k):
    jk = pl.program_id(2)

    @pl.when(jk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_scr.dtype,
    )

    @pl.when(jk == n_k - 1)
    def _fin():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


def _mm_dequant_kernel(sa_ref, a_ref, b_ref, sb_ref, o_ref, acc_scr, *, n_k):
    """int8 matmul + fp epilogue: out = acc * sa[m] * sb[n]."""
    jk = pl.program_id(2)

    @pl.when(jk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(jk == n_k - 1)
    def _fin():
        sa = sa_ref[0]  # [BM]
        sb = sb_ref[0]  # [BN]
        o_ref[:] = (
            acc_scr[:].astype(jnp.float32) * sa[:, None] * sb[None, :]
        ).astype(o_ref.dtype)


def make_matmul(acc_dtype, out_dtype, bm, bk, bn):
    n_k = K // bk

    def matmul(a, b):
        return pl.pallas_call(
            functools.partial(_mm_kernel, n_k=n_k),
            grid=(M // bm, N // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        )(a, b)

    return matmul


def make_w8a8(bm, bk, bn):
    """bf16 activations in -> per-token quant -> int8 mm -> dequant -> bf16."""
    n_k = K // bk

    def matmul(a_bf, b8, sb):
        # per-token (row) dynamic quantization on the VPU via XLA
        amax = jnp.max(jnp.abs(a_bf.astype(jnp.float32)), axis=1, keepdims=True)
        sa = jnp.maximum(amax, 1e-6) / 127.0
        a8 = jnp.clip(
            jnp.round(a_bf.astype(jnp.float32) / sa), -127, 127
        ).astype(jnp.int8)
        out = pl.pallas_call(
            functools.partial(_mm_dequant_kernel, n_k=n_k),
            grid=(M // bm, N // bn, n_k),
            in_specs=[
                pl.BlockSpec((1, bm), lambda i, j, k: (0, i)),
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        )(sa[:, 0][None, :].astype(jnp.float32), a8, b8, sb[None, :])
        return out

    return matmul


def timed(name, fn, a, *rest):
    def sync(x):
        return float(np.asarray(jnp.sum(x[:8, :8].astype(jnp.float32))))

    @jax.jit
    def loop(a, *rest):
        def step(carry, _):
            out = fn(carry, *rest)
            nxt = out[:, :K].astype(a.dtype)
            if a.dtype == jnp.int8:
                nxt = (out[:, :K] & 127).astype(jnp.int8)
            return nxt, None

        final, _ = jax.lax.scan(step, a, None, length=ITERS)
        return final

    try:
        sync(loop(a, *rest))
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}", flush=True)
        return
    out = loop(a, *rest)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        sync(out)
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    r = None
    for _ in range(4):
        r = loop(a, *rest)
    sync(r)
    dt = (time.perf_counter() - t0 - rtt) / 4 / ITERS
    tf = 2 * M * K * N / dt / 1e12
    print(f"{name:52s} {dt * 1e3:7.3f} ms  {tf:7.1f} TF/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    abf = jnp.asarray(rng.normal(size=(M, K)) * 0.05, jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.bfloat16)
    sb = jnp.full((N,), 0.01, jnp.float32)

    for bm, bk, bn in [(512, 1024, 512), (256, 512, 1024), (512, 512, 512),
                       (1024, 512, 512), (256, 1024, 1024), (512, 2048, 512),
                       (1024, 1024, 256), (128, 1024, 1024)]:
        timed(f"pallas i8 i32acc bm{bm} bk{bk} bn{bn}",
              make_matmul(jnp.int32, jnp.int32, bm, bk, bn), a8, b8)

    for bm, bk, bn in [(512, 1024, 512), (512, 512, 512), (512, 2048, 512)]:
        timed(f"pallas bf16 f32acc bm{bm} bk{bk} bn{bn}",
              make_matmul(jnp.float32, jnp.bfloat16, bm, bk, bn), abf, bbf)

    timed("W8A8 end-to-end (quant+mm+dequant) 512/1024/512",
          make_w8a8(512, 1024, 512), abf, b8, sb)
    timed("W8A8 end-to-end (quant+mm+dequant) 512/2048/512",
          make_w8a8(512, 2048, 512), abf, b8, sb)

    timed("xla bf16 dot",
          lambda a, b: jax.lax.dot_general(
              a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
          ).astype(jnp.bfloat16), abf, bbf)


if __name__ == "__main__":
    main()
