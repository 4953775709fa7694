"""Decision microbenchmark: persistent decode megakernel vs the layer scan.

ROADMAP item (rounds 2-4): "all four layer matmuls in one pallas_call, weights
streaming across layer boundaries" to shave decode per-call overhead.  This
bench isolates the two effects that idea could buy, at the real decode shape
(M = B·beams = 48 rows, D = 2048, 24 layers, bf16 and int8 weights):

  A. XLA dot chain under ``lax.scan``          — today's bf16 decode path
  B. ONE pallas_call, grid=(L,), h in scratch  — the persistent megakernel
     shape: layer weights stream through VMEM double-buffering while the
     hidden state never leaves the chip
  C. per-layer pallas_call inside ``lax.scan`` — same kernel as B but paying
     one call per layer: B vs C is the pure call-overhead saving, C vs A the
     kernel-vs-XLA streaming difference

Each chain is sequential (h ← tanh(h @ W_l)) like a real decoder, so the
weight streams cannot be overlapped across layers by XLA — exactly the decode
dependency structure.  Effective GB/s = total weight bytes / time.

The verdict goes to docs/KERNELS.md: the megakernel is worth building only if
B sustains meaningfully more bandwidth than A at these shapes (the remaining
decode gap: BASELINE.md puts the bench-model decode at ~6 ms/step vs a
~4.6 ms weight+KV streaming floor).

Usage: python scripts/bench_decode_megakernel.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


_enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

M, D, L = 48, 2048, 24
REPS = 8  # chain repetitions per timed call (amortizes host dispatch)


# --- A: XLA dot scan ---------------------------------------------------------


@jax.jit
def xla_scan(h, W):
    def rep(h, _):
        def step(h, w):
            return jnp.tanh(jnp.dot(h, w)), None

        h, _ = jax.lax.scan(step, h, W)
        return h, None

    h, _ = jax.lax.scan(rep, h, None, length=REPS)
    return h


# --- B: persistent megakernel (one call, grid over layers) ------------------


def _persist_kernel(h_ref, w_ref, o_ref, *, n_layers):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        o_ref[...] = h_ref[...]

    acc = jax.lax.dot_general(
        o_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = jnp.tanh(acc).astype(o_ref.dtype)


def persistent_chain(h, W):
    return pl.pallas_call(
        functools.partial(_persist_kernel, n_layers=L),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((M, D), lambda l: (0, 0)),
            pl.BlockSpec((1, D, D), lambda l: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, D), lambda l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), h.dtype),
    )(h, W)


@jax.jit
def mega_scan(h, W):
    def rep(h, _):
        return persistent_chain(h, W), None

    h, _ = jax.lax.scan(rep, h, None, length=REPS)
    return h


# --- C: per-layer pallas call ------------------------------------------------


def _one_kernel(h_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = jnp.tanh(acc).astype(o_ref.dtype)


def one_matmul(h, w):
    return pl.pallas_call(
        _one_kernel,
        in_specs=[
            pl.BlockSpec((M, D), lambda: (0, 0)),
            pl.BlockSpec((D, D), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, D), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), h.dtype),
    )(h, w)


@jax.jit
def percall_scan(h, W):
    def rep(h, _):
        def step(h, w):
            return one_matmul(h, w), None

        h, _ = jax.lax.scan(step, h, W)
        return h, None

    h, _ = jax.lax.scan(rep, h, None, length=REPS)
    return h


# --- int8 variants of B (weights int8 + per-column scale) -------------------


def _persist_kernel_i8(h_ref, w_ref, s_ref, o_ref, *, n_layers):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        o_ref[...] = h_ref[...]

    w = (w_ref[0].astype(jnp.bfloat16)) * s_ref[0].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        o_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = jnp.tanh(acc).astype(o_ref.dtype)


def persistent_chain_i8(h, W8, S):
    return pl.pallas_call(
        functools.partial(_persist_kernel_i8, n_layers=L),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((M, D), lambda l: (0, 0)),
            pl.BlockSpec((1, D, D), lambda l: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, D), lambda l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), h.dtype),
    )(h, W8, S)


@jax.jit
def mega_scan_i8(h, W8, S):
    def rep(h, _):
        return persistent_chain_i8(h, W8, S), None

    h, _ = jax.lax.scan(rep, h, None, length=REPS)
    return h


def _one_kernel_i8(h_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(jnp.bfloat16) * s_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        h_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = jnp.tanh(acc).astype(o_ref.dtype)


def one_matmul_i8(h, w, s):
    return pl.pallas_call(
        _one_kernel_i8,
        in_specs=[
            pl.BlockSpec((M, D), lambda: (0, 0)),
            pl.BlockSpec((D, D), lambda: (0, 0)),
            pl.BlockSpec((1, D), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, D), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), h.dtype),
    )(h, w, s)


@jax.jit
def percall_scan_i8(h, W8, S):
    def rep(h, _):
        def step(h, ws):
            w, s = ws
            return one_matmul_i8(h, w, s), None

        h, _ = jax.lax.scan(step, h, (W8, S))
        return h, None

    h, _ = jax.lax.scan(rep, h, None, length=REPS)
    return h


def main():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(M, D)) * 0.02, jnp.bfloat16)
    W = jnp.asarray(rng.normal(size=(L, D, D)) * 0.02, jnp.bfloat16)
    W8 = jnp.clip(np.round(rng.normal(size=(L, D, D)) * 30), -127, 127).astype(
        np.int8
    )
    W8 = jnp.asarray(W8)
    S = jnp.full((L, 1, D), 1.0 / 30, jnp.float32)

    bytes_bf16 = L * D * D * 2 * REPS
    bytes_i8 = L * D * D * 1 * REPS

    def timed(name, f, nbytes, iters=400):
        try:
            out = f()
            jax.block_until_ready(out)
            _ = float(np.asarray(out[0, 0]))
        except Exception as e:
            print(f"{name:34s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
            return
        out = f()
        _ = float(np.asarray(out[0, 0]))
        t0 = time.perf_counter()
        for _i in range(3):
            _ = float(np.asarray(out[0, 0]))
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        last = None
        for _i in range(iters):
            last = f()
        _ = float(np.asarray(last[0, 0]))
        dt = (time.perf_counter() - t0 - rtt) / iters
        per_chain = dt / REPS
        print(
            f"{name:34s} {per_chain*1e3:7.3f} ms/chain   "
            f"{nbytes/dt/1e9:6.1f} GB/s effective",
            flush=True,
        )

    timed("A  xla dot scan (bf16)", lambda: xla_scan(h, W), bytes_bf16)
    timed("C  per-layer pallas call (bf16)", lambda: percall_scan(h, W), bytes_bf16)
    timed("B  persistent one-call (bf16)", lambda: mega_scan(h, W), bytes_bf16)
    timed("B8 persistent one-call (int8)", lambda: mega_scan_i8(h, W8, S), bytes_i8)
    timed("C8 per-layer pallas call (int8)", lambda: percall_scan_i8(h, W8, S), bytes_i8)


if __name__ == "__main__":
    main()
