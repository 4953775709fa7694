"""8B-vision-shape attention sweep: one-shot kernel bq × mask-variant.

Every one-shot program re-fetches the FULL [S, D] k/v pair, so at the
idefics2-8b 980px shape (B16 H16 N4992 D72) the kernel is K/V-HBM-refetch
bound: per layer the k/v traffic is B·H·(T/bq)·S·D·2·2 bytes — 15 GB at
bq=128, 2.3 GB at bq=832.  The mask-in-scores/sum-in-pv pad tricks inflate
D 72→128 (1.78× on that traffic), so their VPU savings only win once bq is
large enough to discharge the refetch bound.

Usage: python scripts/bench_vision5k.py
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

from mimic_tpu.ops.flash_attention import flash_attention, onepass_attention

B, N, H, D = 16, 4992, 16, 72
LAYERS = 9


def timed(name, fn, sync, iters=5):
    try:
        sync(fn())
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:80]}", flush=True)
        return None
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
    dt = (time.perf_counter() - t0 - rtt) / iters / LAYERS
    gelem = B * H * N * N / dt / 1e9
    print(f"{name:46s} {dt * 1e3:8.2f} ms/layer  {gelem:6.0f} Gelem/s", flush=True)
    return dt


@functools.partial(jax.jit, static_argnames=("mode", "bq"))
def loop(q, k, v, km, mode, bq):
    def step(qc, _):
        if mode == "flash":
            out, _, _ = flash_attention(
                qc, k, v, km, causal=False, need_unmasked=False,
                block_q=512, block_k=1024,
            )
        else:
            out, _, _ = onepass_attention(
                qc, k, v, km, causal=False, need_unmasked=False,
                mask_in_scores=(mode == "maskcol"), block_q=bq,
            )
        return qc + out.astype(qc.dtype) * 1e-3, None

    q2, _ = jax.lax.scan(step, q, None, length=LAYERS)
    return q2


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, N, H, D), jnp.bfloat16)
    # realistic variable-aspect masking: ~25% of keys padded for half the batch
    km_np = np.ones((B, N), np.int32)
    km_np[::2, 3744:] = 0
    km = jnp.asarray(km_np)
    full = jnp.ones((B, N), jnp.int32)

    def sync(r):
        return float(np.asarray(jnp.sum(r).astype(jnp.float32)))

    for bq in (128, 416, 832, 1664):
        timed(f"onepass bq={bq} select, full mask",
              lambda bq=bq: loop(q, k, v, full, "select", bq), sync)
        timed(f"onepass bq={bq} mask-col+sum-pv, full mask",
              lambda bq=bq: loop(q, k, v, full, "maskcol", bq), sync)
    timed("flash bq512/bk1024, full mask", lambda: loop(q, k, v, full, "flash", 0), sync)
    best = 832
    timed(f"onepass bq={best} select, 25%-padded",
          lambda: loop(q, k, v, km, "select", best), sync)
    timed(f"onepass bq={best} mask-col+sum-pv, 25%-padded",
          lambda: loop(q, k, v, km, "maskcol", best), sync)


if __name__ == "__main__":
    main()
