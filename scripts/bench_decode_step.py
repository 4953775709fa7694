"""Decode-step microbench: where do the ~6 ms/step go on the bench model?

Times, on the current backend, for the headline bench shapes (B=16, beams=3 →
M=48 decode rows, 24 layers, D=2048, F=5632, Hkv=8, Dh=128, V=32064):

1. raw XLA matmul scan, separate q/k/v/gate/up (7 dots/layer, current layout)
2. raw XLA matmul scan, fused qkv + gateup (4 dots/layer)
3. Pallas bf16 stacked-weight streaming matmul (if implemented)
4. lm_head dot alone
5. one full decode step through lvlm_forward (cache at 512-token prompt)

All weights are passed as jit ARGUMENTS — closure capture would bake them into
the HLO as constants and push gigabytes through the ~10 MB/s host tunnel.

Usage: python scripts/bench_decode_step.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L, D, F, Hkv, Dh, V = 24, 2048, 5632, 8, 128, 32064
H = 16
M = 48  # B=16 × 3 beams


def timed(name, fn, sync, iters=30, nbytes=None):
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
    bw = f"  {nbytes / dt / 1e9:6.0f} GB/s" if nbytes else ""
    print(f"{name:44s} {dt * 1e3:8.3f} ms{bw}", flush=True)
    return dt


import jax
import jax.numpy as jnp


@jax.jit
def sep_scan(x, w):
    def step(h, w):
        q = jnp.dot(h, w["q"])
        k = jnp.dot(h, w["k"])
        v = jnp.dot(h, w["v"])
        a = q + jnp.pad(k + v, ((0, 0), (0, (H - Hkv) * Dh)))
        h = h + jnp.dot(a, w["o"])
        g = jnp.dot(h, w["g"])
        u = jnp.dot(h, w["u"])
        h = h + jnp.dot(jax.nn.silu(g) * u, w["d"])
        return h, None

    h, _ = jax.lax.scan(step, x, w)
    return h


@jax.jit
def fused_scan(x, w):
    def step(h, w):
        qkv = jnp.dot(h, w["qkv"])
        a = qkv[:, : H * Dh] + jnp.pad(
            qkv[:, H * Dh : (H + Hkv) * Dh] + qkv[:, (H + Hkv) * Dh :],
            ((0, 0), (0, (H - Hkv) * Dh)),
        )
        h = h + jnp.dot(a, w["o"])
        gu = jnp.dot(h, w["gu"])
        h = h + jnp.dot(jax.nn.silu(gu[:, :F]) * gu[:, F:], w["d"])
        return h, None

    h, _ = jax.lax.scan(step, x, w)
    return h


@jax.jit
def giant(x, wall):
    return jnp.dot(jnp.tile(x, (1, L)), wall)


@jax.jit
def head(x, lm_head):
    return jnp.dot(x, lm_head)


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    dt_w = jnp.bfloat16

    w = {
        "q": jax.random.normal(ks[0], (L, D, H * Dh), dt_w),
        "k": jax.random.normal(ks[1], (L, D, Hkv * Dh), dt_w),
        "v": jax.random.normal(ks[2], (L, D, Hkv * Dh), dt_w),
        "o": jax.random.normal(ks[3], (L, H * Dh, D), dt_w),
        "g": jax.random.normal(ks[4], (L, D, F), dt_w),
        "u": jax.random.normal(ks[5], (L, D, F), dt_w),
        "d": jax.random.normal(ks[6], (L, F, D), dt_w),
    }
    x = jax.random.normal(ks[7], (M, D), dt_w)

    layer_bytes = 2 * (D * H * Dh + 2 * D * Hkv * Dh + H * Dh * D + 3 * D * F)
    total_bytes = L * layer_bytes

    def sync_x(r):
        return float(np.asarray(jnp.sum(r).astype(jnp.float32)))

    timed("XLA scan, 7 separate dots/layer", lambda: sep_scan(x, w), sync_x, nbytes=total_bytes)

    wf = {
        "qkv": jnp.concatenate([w["q"], w["k"], w["v"]], axis=-1),
        "o": w["o"],
        "gu": jnp.concatenate([w["g"], w["u"]], axis=-1),
        "d": w["d"],
    }
    timed("XLA scan, fused qkv+gateup (4 dots/layer)", lambda: fused_scan(x, wf), sync_x, nbytes=total_bytes)

    wall = jnp.concatenate([wf["qkv"], wf["gu"]], axis=-1).reshape(L * D, -1)
    timed(
        "one giant [M,L*D]x[L*D,N] dot (bw upper bound)",
        lambda: giant(x, wall), sync_x,
        nbytes=wall.size * 2,
    )

    lm_head = jax.random.normal(ks[0], (D, V), dt_w)
    timed("lm_head [48,2048]x[2048,32064]", lambda: head(x, lm_head), sync_x, nbytes=lm_head.size * 2)

    # int8 weights with inline dequant inside the XLA scan: does XLA stream the
    # int8 bytes at full rate (→ ~2× over bf16) or stall on the convert?
    from mimic_tpu.ops.quant import quantize_weight

    wq8 = {k: quantize_weight(v) for k, v in wf.items()}

    @jax.jit
    def int8_scan(x, wq8):
        def step(h, w):
            def dq(ww):
                return (ww["q8"].astype(jnp.bfloat16) * ww["scale"].astype(jnp.bfloat16)[None, :])

            qkv = jnp.dot(h, dq(w["qkv"]))
            a = qkv[:, : H * Dh] + jnp.pad(
                qkv[:, H * Dh : (H + Hkv) * Dh] + qkv[:, (H + Hkv) * Dh :],
                ((0, 0), (0, (H - Hkv) * Dh)),
            )
            h = h + jnp.dot(a, dq(w["o"]))
            gu = jnp.dot(h, dq(w["gu"]))
            h = h + jnp.dot(jax.nn.silu(gu[:, :F]) * gu[:, F:], dq(w["d"]))
            return h, None

        h, _ = jax.lax.scan(step, x, wq8)
        return h

    timed(
        "XLA scan, int8 inline dequant (4 dots/layer)",
        lambda: int8_scan(x, wq8), sync_x, nbytes=total_bytes // 2,
    )

    # existing Pallas int8 stacked path at the same shapes
    from mimic_tpu.ops.quant import qdot

    @jax.jit
    def int8_pallas_scan(x, wq8):
        def step(h, xs):
            (idx,) = xs

            def hd(ww):
                return {"q8": ww["q8"], "scale": ww["scale"], "layer": idx}

            qkv = qdot(h, hd(wq8["qkv"]))
            a = qkv[:, : H * Dh] + jnp.pad(
                qkv[:, H * Dh : (H + Hkv) * Dh] + qkv[:, (H + Hkv) * Dh :],
                ((0, 0), (0, (H - Hkv) * Dh)),
            )
            h = h + qdot(a, hd(wq8["o"]))
            gu = qdot(h, hd(wq8["gu"]))
            h = h + qdot(jax.nn.silu(gu[:, :F]) * gu[:, F:], hd(wq8["d"]))
            return h, None

        h, _ = jax.lax.scan(step, x, (jnp.arange(L, dtype=jnp.int32),))
        return h

    timed(
        "Pallas int8 stacked scan (4 calls/layer)",
        lambda: int8_pallas_scan(x, wq8), sync_x, nbytes=total_bytes // 2,
    )

    try:
        from mimic_tpu.ops.quant import bf16_matmul_stacked

        @jax.jit
        def pallas_scan(x, wf):
            def step(h, xs):
                idx, = xs
                qkv = bf16_matmul_stacked(h, wf["qkv"], idx)
                a = qkv[:, : H * Dh] + jnp.pad(
                    qkv[:, H * Dh : (H + Hkv) * Dh] + qkv[:, (H + Hkv) * Dh :],
                    ((0, 0), (0, (H - Hkv) * Dh)),
                )
                h = h + bf16_matmul_stacked(a, wf["o"], idx)
                gu = bf16_matmul_stacked(h, wf["gu"], idx)
                h = h + bf16_matmul_stacked(jax.nn.silu(gu[:, :F]) * gu[:, F:], wf["d"], idx)
                return h, None

            h, _ = jax.lax.scan(step, x, (jnp.arange(L, dtype=jnp.int32),))
            return h

        timed("Pallas bf16 stacked scan (4 calls/layer)", lambda: pallas_scan(x, wf), sync_x, nbytes=total_bytes)
    except ImportError:
        print("(bf16_matmul_stacked not implemented yet)", flush=True)

    # full decode step through the model, cache at prompt 512
    from bench import build_bench_model
    from mimic_tpu.models.lvlm import LVLMBatch, lvlm_forward

    cfg, params, tk = build_bench_model()
    B, T, new = 16, 512, 10
    total = T + new
    K = 3
    BK = B * K
    cache = {
        "prompt_k": jnp.zeros((L, B, T, Hkv, Dh), jnp.bfloat16),
        "prompt_v": jnp.zeros((L, B, T, Hkv, Dh), jnp.bfloat16),
        "k": jnp.zeros((L, BK, new, Hkv, Dh), jnp.bfloat16),
        "v": jnp.zeros((L, BK, new, Hkv, Dh), jnp.bfloat16),
        "length": jnp.asarray(T + 3, jnp.int32),
    }
    mask = jnp.ones((BK, total), jnp.int32)
    step_batch = LVLMBatch(input_ids=jnp.ones((BK, 1), jnp.int32), attention_mask=mask)

    @jax.jit
    def decode_step(params, cache):
        out = lvlm_forward(
            params, cfg, step_batch,
            position_ids=jnp.full((BK, 1), T + 3, jnp.int32),
            kv_cache=cache, kv_total_len=total,
        )
        return out.logits

    cache_bytes = sum(int(np.prod(v.shape)) * 2 for k, v in cache.items() if k != "length")
    timed(
        "full decode step (lvlm_forward, cache 512)",
        lambda: decode_step(params, cache), sync_x,
        nbytes=total_bytes + cache_bytes + lm_head.size * 2,
    )

    # ablation: tiny prompt cache → isolates the prompt-KV read + attention cost
    T2 = 16
    cache2 = {
        "prompt_k": jnp.zeros((L, B, T2, Hkv, Dh), jnp.bfloat16),
        "prompt_v": jnp.zeros((L, B, T2, Hkv, Dh), jnp.bfloat16),
        "k": jnp.zeros((L, BK, new, Hkv, Dh), jnp.bfloat16),
        "v": jnp.zeros((L, BK, new, Hkv, Dh), jnp.bfloat16),
        "length": jnp.asarray(T2 + 3, jnp.int32),
    }
    step_batch2 = LVLMBatch(
        input_ids=jnp.ones((BK, 1), jnp.int32),
        attention_mask=jnp.ones((BK, T2 + new), jnp.int32),
    )

    @jax.jit
    def decode_step2(params, cache2):
        out = lvlm_forward(
            params, cfg, step_batch2,
            position_ids=jnp.full((BK, 1), T2 + 3, jnp.int32),
            kv_cache=cache2, kv_total_len=T2 + new,
        )
        return out.logits

    timed(
        "decode step, prompt cache 16 (ablation)",
        lambda: decode_step2(params, cache2), sync_x,
        nbytes=total_bytes + lm_head.size * 2,
    )

    # ablation: decoder_forward only (no embed, no lm_head)
    from mimic_tpu.models.decoder import decoder_forward, make_decode_mask, positions_from_mask

    embeds = jax.random.normal(ks[1], (BK, 1, D), jnp.bfloat16)
    dec_mask = make_decode_mask(mask, total)

    @jax.jit
    def dec_only(lm, cache):
        out = decoder_forward(
            lm["decoder"], cfg.text, embeds, dec_mask,
            jnp.full((BK, 1), T + 3, jnp.int32),
            kv_cache=cache, key_mask=mask,
        )
        return out.hidden

    timed(
        "decoder_forward only (no embed/lm_head)",
        lambda: dec_only(params["lm"], cache), sync_x,
        nbytes=total_bytes - lm_head.size * 2 + cache_bytes,
    )


if __name__ == "__main__":
    main()
