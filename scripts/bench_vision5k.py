"""8B-vision-shape attention: flash vs one-shot (bq=128) at N=5120, D=72.

The 8B batch is 68% vision encode; its attention dispatches to the flash
kernel (running-pair machinery per KV block) because ONEPASS_MAX_S gates the
one-shot kernel at 3072.  With bq=128 the one-shot score tile at S=5120 is
2.6 MB — it fits.  Measures one layer's attention over a 9-iteration
carry-dependent scan at B16 H16 N5120 D72 (the idefics2-8b 980px shape).

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

B, N, H, D = 16, 5120, 16, 72
LAYERS = 9


def timed(name, fn, sync, iters=5):
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
    dt = (time.perf_counter() - t0 - rtt) / iters / LAYERS
    gelem = B * H * N * N / dt / 1e9
    print(f"{name:46s} {dt * 1e3:8.2f} ms/layer  {gelem:6.0f} Gelem/s", flush=True)
    return dt


@functools.partial(jax.jit, static_argnames=("mode",))
def loop(q, k, v, km, mode):
    def step(qc, _):
        if mode == "flash":
            out, _, _ = flash_attention(
                qc, k, v, km, causal=False, need_unmasked=False,
                block_q=512, block_k=1024,
            )
        elif mode == "onepass_col":
            out, _, _ = onepass_attention(
                qc, k, v, km, causal=False, need_unmasked=False,
                mask_in_scores=True,
            )
        else:
            out, _, _ = onepass_attention(
                qc, k, v, km, causal=False, need_unmasked=False,
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
    km_np[::2, 3840:] = 0
    km = jnp.asarray(km_np)
    full = jnp.ones((B, N), jnp.int32)

    def sync(r):
        return float(np.asarray(jnp.sum(r).astype(jnp.float32)))

    timed("flash bq512/bk1024, full mask", lambda: loop(q, k, v, full, "flash"), sync)
    timed("onepass bq=128 select, full mask", lambda: loop(q, k, v, full, "onepass"), sync)
    timed("onepass bq=128 mask-col, full mask", lambda: loop(q, k, v, full, "onepass_col"), sync)
    timed("flash, 25%-padded mask", lambda: loop(q, k, v, km, "flash"), sync)
    timed("onepass bq=128 select, 25%-padded", lambda: loop(q, k, v, km, "onepass"), sync)
    timed("onepass bq=128 mask-col, 25%-padded", lambda: loop(q, k, v, km, "onepass_col"), sync)


if __name__ == "__main__":
    main()
