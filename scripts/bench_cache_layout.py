"""Decode prompt-cache attention: head-interleaved vs head-major KV layout.

The per-step decode bottleneck after matmuls is reading the beam-shared prompt
KV (805 MB at bench shapes).  The cache is stored [B, S, Hkv, D] — one head's
[S, D] slab is a 256-byte-strided walk.  This measures the score+PV einsum
pair in both layouts (and a Pallas streaming variant if present) over a
24-layer carry-dependent scan.

Usage: python scripts/bench_cache_layout.py
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

B0, S, Hkv, D = 16, 512, 8, 128
Gq = 6  # beams (3) × GQA groups (2) folded query rows per kv head
L = 24


def timed(name, fn, sync, iters=10):
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
    dt = (time.perf_counter() - t0 - rtt) / iters
    nbytes = L * 2 * B0 * S * Hkv * D * 2
    print(f"{name:52s} {dt * 1e3:8.2f} ms  {nbytes / dt / 1e9:5.0f} GB/s", flush=True)
    return dt


@jax.jit
def attn_interleaved(q, ks, vs):
    # cache [L, B, S, Hkv, D] (current layout); q [B, 1, Hkv, Gq, D]
    def step(c, kv):
        k, v = kv
        s = jnp.einsum("btkgd,bskd->bkgts", c, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bkgts,bskd->btkgd", p, v)
        return c + o.astype(c.dtype) * 1e-3, None

    c, _ = jax.lax.scan(step, q, (ks, vs))
    return c


@jax.jit
def attn_headmajor(q, ks, vs):
    # cache [L, B, Hkv, S, D]; q [B, 1, Hkv, Gq, D]
    def step(c, kv):
        k, v = kv
        s = jnp.einsum("btkgd,bksd->bkgts", c, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bkgts,bksd->btkgd", p, v)
        return c + o.astype(c.dtype) * 1e-3, None

    c, _ = jax.lax.scan(step, q, (ks, vs))
    return c


def main():
    kk = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kk[0], (B0, 1, Hkv, Gq, D), jnp.bfloat16)
    ks_i = jax.random.normal(kk[1], (L, B0, S, Hkv, D), jnp.bfloat16)
    vs_i = jax.random.normal(kk[2], (L, B0, S, Hkv, D), jnp.bfloat16)

    def sync(r):
        return float(np.asarray(jnp.sum(r).astype(jnp.float32)))

    timed("einsum, cache [B,S,Hkv,D] (current)", lambda: attn_interleaved(q, ks_i, vs_i), sync)

    ks_h = jnp.swapaxes(ks_i, 2, 3).copy()
    vs_h = jnp.swapaxes(vs_i, 2, 3).copy()
    timed("einsum, cache [B,Hkv,S,D] (head-major)", lambda: attn_headmajor(q, ks_h, vs_h), sync)


if __name__ == "__main__":
    main()
