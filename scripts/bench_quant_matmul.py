"""Microbench: int8 dequant-fused Pallas matmul vs bf16 XLA dot at decode shapes.

All variants run the layer loop ON DEVICE (fori_loop / scan inside one jit
program) — per-call dispatch over the tunnel dwarfs sub-ms ops otherwise.

Variants:
  A. XLA bf16: scan over stacked [L,K,N] weights (XLA fuses the slice into the dot)
  B. Pallas int8, sliced: dynamic_index then pallas_call (the slice materializes —
     extra HBM round trip before the kernel)
  C. Pallas int8, stacked: layer index via scalar prefetch; the kernel DMAs blocks
     straight out of the stacked array (no copy)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mimic_tpu.ops.quant import int8_matmul, quantize_weight
from mimic_tpu.ops.quant import int8_matmul_stacked


def timeit(fn, iters=10):
    r = fn()
    _ = float(np.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn()
    _ = float(np.asarray(last).ravel()[0])
    return max((time.perf_counter() - t0) / iters, 1e-9)


def bench(M, K, N, L, reps):
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (L, K, N), jnp.bfloat16)
    q = quantize_weight(w)
    wq, scale = q["q8"], q["scale"]

    @jax.jit
    def loop_bf16(x, w):
        def step(c, wl):
            o = jnp.dot(c, wl)
            return c + o[:, :K] * 1e-9, None

        def outer(i, c):
            c, _ = jax.lax.scan(step, c, w)
            return c
        return jax.lax.fori_loop(0, reps, outer, x)

    @jax.jit
    def loop_q_sliced(x, wq, scale):
        def step(c, xs):
            wl, sl = xs
            o = int8_matmul(c, wl, sl)
            return c + o[:, :K] * 1e-9, None

        def outer(i, c):
            c, _ = jax.lax.scan(step, c, (wq, scale))
            return c
        return jax.lax.fori_loop(0, reps, outer, x)

    @jax.jit
    def loop_q_stacked(x, wq, scale):
        def step(c, l):
            o = int8_matmul_stacked(c, wq, scale, l)
            return c + o[:, :K] * 1e-9, None

        def outer(i, c):
            c, _ = jax.lax.scan(step, c, jnp.arange(L, dtype=jnp.int32))
            return c
        return jax.lax.fori_loop(0, reps, outer, x)

    per = L * reps
    t_a = timeit(lambda: loop_bf16(x, w)) / per
    t_b = timeit(lambda: loop_q_sliced(x, wq, scale)) / per
    t_c = timeit(lambda: loop_q_stacked(x, wq, scale)) / per
    bw = K * N
    print(
        f"M{M} K{K} N{N} (x{per}): bf16 {t_a*1e6:7.1f}us ({2*bw/t_a/1e9:5.0f} GB/s) | "
        f"int8-sliced {t_b*1e6:7.1f}us ({bw/t_b/1e9:5.0f} GB/s) {t_a/t_b:4.2f}x | "
        f"int8-stacked {t_c*1e6:7.1f}us ({bw/t_c/1e9:5.0f} GB/s) {t_a/t_c:4.2f}x"
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench(48, 2048, 2048, 24, 10)   # decode q/o
    bench(48, 2048, 5632, 24, 10)   # decode gate/up (N!=K: pad chain via slice)
    bench(16, 2048, 2048, 24, 10)   # greedy decode rows
    bench(512, 2048, 2048, 24, 4)   # small prefill block
