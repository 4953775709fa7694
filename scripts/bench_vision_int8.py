"""int8 vs bf16 one-pass vision attention at the idefics2-8b 980px shape.

Measures per-layer time of the bf16 one-shot kernel vs the int8-score kernel
(B16 H16 N4992 D72) and reports output accuracy vs an fp32 XLA reference at a
reduced shape.  Decides whether the 8B serving mode routes vision attention
through int8 (``models/vision.py``).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_vision_int8.py
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

from mimic_tpu.ops.flash_attention import onepass_attention
from mimic_tpu.ops.vision_int8 import onepass_attention_int8

B, N, H, D = 16, 4992, 16, 72
LAYERS = 9


def timed(name, fn, sync, iters=5):
    try:
        sync(fn())
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:100]}", flush=True)
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
    print(f"{name:46s} {dt * 1e3:8.2f} ms/layer", flush=True)
    return dt


@functools.partial(jax.jit, static_argnames=("mode", "bq"))
def loop(q, k, v, km, mode, bq):
    def step(qc, _):
        if mode == "int8":
            out = onepass_attention_int8(qc, k, v, km, block_q=bq)
        else:
            out, _, _ = onepass_attention(
                qc, k, v, km, causal=False, need_unmasked=False, block_q=bq
            )
        return qc + out.astype(qc.dtype) * 1e-3, None

    q2, _ = jax.lax.scan(step, q, None, length=LAYERS)
    return q2


def accuracy(km=None):
    """Max/mean relative error of both kernels vs fp32 XLA at a small shape."""
    b, n = 2, 1024
    ks_ = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks_[0], (b, n, H, D), jnp.bfloat16)
    k = jax.random.normal(ks_[1], (b, n, H, D), jnp.bfloat16)
    v = jax.random.normal(ks_[2], (b, n, H, D), jnp.bfloat16)
    mask = km if km is None else km[:b, :n]

    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("bthd,bshd->bhts", qf, kf) / np.sqrt(D)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :] > 0, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhts,bshd->bthd", p, vf)

    denom = jnp.maximum(jnp.abs(ref), 1e-3)
    for name, out in (
        ("bf16 onepass", onepass_attention(q, k, v, mask, causal=False, need_unmasked=False)[0]),
        ("int8 onepass", onepass_attention_int8(q, k, v, mask)),
    ):
        rel = jnp.abs(out.astype(jnp.float32) - ref) / denom
        print(
            f"accuracy {name:14s} max_rel={float(jnp.max(rel)):.4f} "
            f"mean_rel={float(jnp.mean(rel)):.5f}",
            flush=True,
        )


def main():
    ks_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks_[0], (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(ks_[1], (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(ks_[2], (B, N, H, D), jnp.bfloat16)
    full = jnp.ones((B, N), jnp.int32)

    def sync(r):
        return float(np.asarray(jnp.sum(r).astype(jnp.float32)))

    accuracy()
    for bq in (416, 832):
        timed(f"bf16 onepass bq={bq}", lambda bq=bq: loop(q, k, v, full, "bf16", bq), sync)
        timed(f"int8 onepass bq={bq}", lambda bq=bq: loop(q, k, v, full, "int8", bq), sync)
    # no-mask variants (the kernel skips the select pass)
    timed("bf16 onepass bq=832 nomask", lambda: loop(q, k, v, None, "bf16", 832), sync)
    timed("int8 onepass bq=832 nomask", lambda: loop(q, k, v, None, "int8", 832), sync)


if __name__ == "__main__":
    main()
