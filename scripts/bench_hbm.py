"""What HBM bandwidth can this chip actually sustain, and does lax.scan
pipelining of stacked-weight matmuls reach it?"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=10):
    r = fn()
    _ = float(np.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn()
    _ = float(np.asarray(last).ravel()[0])
    return max((time.perf_counter() - t0) / iters, 1e-9)


def main():
    print("backend:", jax.default_backend())

    # 1. pure streaming reduce over 1 GB
    big = jnp.ones((64, 2048, 4096), jnp.bfloat16)  # 1 GiB

    @jax.jit
    def reduce_sum(a):
        return jnp.sum(a, dtype=jnp.float32)[None]

    t = timeit(lambda: reduce_sum(big), 5)
    print(f"reduce 1GiB: {t*1e3:.2f} ms → {big.nbytes/t/1e9:.0f} GB/s")

    # 2. scanned matmul chain (decode pattern), M=48
    L, M, K, N = 24, 48, 2048, 2048
    w = jax.random.normal(jax.random.PRNGKey(0), (L, K, N), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

    @jax.jit
    def scanned(x, w):
        def outer(i, c):
            def step(h, wl):
                return jnp.dot(h, wl), None
            c, _ = jax.lax.scan(step, c, w)
            return c * 1e-6
        return jax.lax.fori_loop(0, 10, outer, x)

    t = timeit(lambda: scanned(x, w)) / (10 * L)
    print(f"scan matmul M{M}: {t*1e6:.1f} us/layer → {w[0].nbytes/t/1e9:.0f} GB/s")

    # 3. unrolled matmul chain (no scan) — can XLA prefetch better?
    ws = [jax.random.normal(jax.random.PRNGKey(i), (K, N), jnp.bfloat16) for i in range(L)]

    @jax.jit
    def unrolled(x, *ws):
        def outer(i, c):
            for wl in ws:
                c = jnp.dot(c, wl)
            return c * 1e-6
        return jax.lax.fori_loop(0, 10, outer, x)

    t = timeit(lambda: unrolled(x, *ws)) / (10 * L)
    print(f"unrolled matmul M{M}: {t*1e6:.1f} us/layer → {ws[0].nbytes/t/1e9:.0f} GB/s")

    # 4. one big matmul: M=48 against [K, L*N] (all layers side by side)
    wbig = jax.random.normal(jax.random.PRNGKey(2), (K, L * N), jnp.bfloat16)

    @jax.jit
    def bigmm(x, wbig):
        def outer(i, c):
            o = jnp.dot(c, wbig)  # [M, L*N]
            return c + o[:, :K] * 1e-9
        return jax.lax.fori_loop(0, 10, outer, x)

    t = timeit(lambda: bigmm(x, wbig)) / 10
    print(f"one [2048,{L*N}] matmul M{M}: {t*1e6:.1f} us → {wbig.nbytes/t/1e9:.0f} GB/s")

    # 5. batched dot_general over layer dim: [L,M,K] x [L,K,N]
    xb = jnp.broadcast_to(x, (L, M, K))

    @jax.jit
    def batched(xb, w):
        def outer(i, c):
            o = jax.lax.dot_general(
                c, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            return c + o.astype(c.dtype) * 1e-9
        return jax.lax.fori_loop(0, 10, outer, xb)

    t = timeit(lambda: batched(xb, w)) / 10
    print(f"batched dot [L,M,K]x[L,K,N]: {t*1e6:.1f} us → {w.nbytes/t/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
