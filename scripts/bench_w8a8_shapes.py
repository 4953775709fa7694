"""Decompose W8A8 cost at real serving matmul shapes.

For each (M, K, N): XLA bf16 dot, w8a8 kernel alone (pre-quantized x),
quantize_rows alone, and the end-to-end qdot-style chain — to find where the
int8 MXU win survives after quantization overhead at small-K vision shapes vs
large-K text-prefill shapes.

Usage: python scripts/bench_w8a8_shapes.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mimic_tpu.ops.quant import quantize_rows, quantize_weight, w8a8_matmul

SHAPES = [
    ("vit qkv-fused", 79872, 1152, 3456),
    ("vit o", 79872, 1152, 1152),
    ("vit fc1", 79872, 1152, 4352),
    ("vit fc2", 79872, 4352, 1152),
    ("8b qkv", 9216, 4096, 6144),
    ("8b gateup", 9216, 4096, 28672),
    ("8b down", 9216, 14336, 4096),
    ("1b prefill qkv", 8192, 2048, 4096),
]


def timed(fn, sync, iters=8):
    sync(fn())
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        sync(out)
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn()
    sync(last)
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    rng = np.random.default_rng(0)

    for name, M, K, N in SHAPES:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02, jnp.bfloat16)
        q = quantize_weight(w, act_quant=True)
        wq, sc = q["q8"], q["scale"].astype(jnp.float32)
        x8, xs = jax.jit(quantize_rows)(x)

        def sync(r):
            rr = r[0] if isinstance(r, tuple) else r
            return float(np.asarray(jnp.sum(rr[:4, :4].astype(jnp.float32))))

        xla = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        t_bf = timed(lambda: xla(x, w), sync)

        kern = jax.jit(lambda a8, as_, qq, ss: w8a8_matmul(a8, as_, qq, ss))
        t_k = timed(lambda: kern(x8, xs, wq, sc), sync)

        qr = jax.jit(lambda a: quantize_rows(a))
        t_q = timed(lambda: qr(x), sync)

        e2e = jax.jit(lambda a, qq, ss: w8a8_matmul(*quantize_rows(a), qq, ss))
        t_e = timed(lambda: e2e(x, wq, sc), sync)

        fl = 2 * M * K * N / 1e12
        print(
            f"{name:16s} M{M} K{K} N{N}: bf16 {t_bf*1e3:7.2f} ms ({fl/t_bf:5.0f} TF/s)"
            f" | w8a8-kern {t_k*1e3:7.2f} ({fl/t_k:5.0f})"
            f" | quant {t_q*1e3:6.2f} | e2e {t_e*1e3:7.2f} ({fl/t_e:5.0f})"
            f" | e2e speedup {t_bf/t_e:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
