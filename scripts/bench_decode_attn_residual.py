"""Decode-attention residual: measure the mask/concat machinery's real cost.

KERNELS.md carried an ASSERTED claim (VERDICT r4 weak #3): the cached-attention
einsum path "has <0.8 ms/step headroom, all in mask/concat machinery".  This
measures it at the exact headline decode shape (B0=16 × 3 beams folded,
prompt 512 slots, gen region 10, 24 layers, Hkv8 Dh128):

1. production ``layers.cached_attention`` (beam-shared prompt, slot masks,
   current-block concat, unmasked-lse OFF as on the plain decode path), ×24;
2. a stripped variant: the same prompt/cache/current einsums and softmax with
   NO masks, NO where, NO slot arithmetic — the bandwidth-only core;
3. delta = what a fused decode-attention kernel could recover at most from
   mask/concat (its own launch overheads not yet subtracted).

Chained iterations perturb q from the previous output so XLA cannot CSE the
repeats; device time dominates the tunnel RTT.

Usage: python scripts/bench_decode_attn_residual.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


B0, K, H, Hkv, Dh = 16, 3, 16, 8, 128
B = B0 * K
Sp, Sg, T = 512, 16, 1
L, REPS = 24, 40


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.layers import cached_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)), jnp.bfloat16)
    k_new = jnp.asarray(rng.normal(size=(B, T, Hkv, Dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(B, T, Hkv, Dh)), jnp.bfloat16)
    cache_k = jnp.asarray(rng.normal(size=(B, Sg, Hkv, Dh)), jnp.bfloat16)
    cache_v = jnp.asarray(rng.normal(size=(B, Sg, Hkv, Dh)), jnp.bfloat16)
    prompt_k = jnp.asarray(rng.normal(size=(B0, Sp, Hkv, Dh)), jnp.bfloat16)
    prompt_v = jnp.asarray(rng.normal(size=(B0, Sp, Hkv, Dh)), jnp.bfloat16)
    key_mask = jnp.ones((B, Sg), jnp.int32)
    key_mask_new = jnp.ones((B, T), jnp.int32)
    prompt_mask = jnp.ones((B0, Sp), jnp.int32)
    cache_len = jnp.asarray(Sp + 5, jnp.int32)

    # per-step HBM floor: prompt KV read once per batch row + gen/current KV
    nbytes = (
        2 * B0 * Sp * Hkv * Dh * 2 + 2 * B * (Sg + T) * Hkv * Dh * 2
    ) * L * REPS

    ops = dict(
        k_new=k_new, v_new=v_new, cache_k=cache_k, cache_v=cache_v,
        prompt_k=prompt_k, prompt_v=prompt_v, key_mask=key_mask,
        key_mask_new=key_mask_new, prompt_mask=prompt_mask,
        cache_len=cache_len,
    )

    def chain(body):
        @jax.jit
        def run(q0, ops):
            def rep(qc, _):
                def layer(qc2, _):
                    out = body(qc2, ops)
                    return (q0 + 0.001 * out.astype(q0.dtype)), None

                qc, _ = jax.lax.scan(layer, qc, None, length=L)
                return qc, None

            qf, _ = jax.lax.scan(rep, q0, None, length=REPS)
            return qf

        return run

    def production(qc, o):
        out, _, _ = cached_attention(
            qc, o["k_new"], o["v_new"], o["cache_k"], o["cache_v"],
            o["cache_len"], o["key_mask"], o["key_mask_new"],
            prompt_k=o["prompt_k"], prompt_v=o["prompt_v"],
            prompt_mask=o["prompt_mask"],
            need_unmasked=False,
        )
        return out

    def stripped(qc, o):
        """Bandwidth core: same einsums + softmax, zero mask machinery."""
        k_new, v_new = o["k_new"], o["v_new"]
        cache_k, cache_v = o["cache_k"], o["cache_v"]
        prompt_k, prompt_v = o["prompt_k"], o["prompt_v"]
        scale = 1.0 / (Dh ** 0.5)
        qg = (qc.astype(jnp.float32) * scale).astype(qc.dtype).reshape(B, T, Hkv, 2, Dh)
        qf = qg.reshape(B0, K, T, Hkv, 2, Dh).transpose(0, 2, 3, 1, 4, 5)
        qf = qf.reshape(B0, T, Hkv, K * 2, Dh)
        s_p = jnp.einsum("btkgd,bskd->bkgts", qf, prompt_k,
                         preferred_element_type=jnp.float32)
        s_c = jnp.einsum("btkgd,bskd->bkgts", qg, cache_k,
                         preferred_element_type=jnp.float32)
        s_n = jnp.einsum("btkgd,bskd->bkgts", qg, k_new,
                         preferred_element_type=jnp.float32)
        m = jnp.maximum(
            jnp.max(s_p, axis=-1).reshape(B0, Hkv, K, 2, T).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, 2, T),
            jnp.maximum(jnp.max(s_c, axis=-1), jnp.max(s_n, axis=-1)),
        )
        mp = m.reshape(B0, K, Hkv, 2, T).transpose(0, 2, 1, 3, 4).reshape(B0, Hkv, K * 2, T)
        p_p = jnp.exp(s_p - mp[..., None]).astype(prompt_v.dtype)
        p_c = jnp.exp(s_c - m[..., None]).astype(cache_v.dtype)
        p_n = jnp.exp(s_n - m[..., None]).astype(v_new.dtype)
        o_p = jnp.einsum("bkgts,bskd->bkgtd", p_p, prompt_v,
                         preferred_element_type=jnp.float32)
        o_c = jnp.einsum("bkgts,bskd->bkgtd", p_c, cache_v,
                         preferred_element_type=jnp.float32)
        o_n = jnp.einsum("bkgts,bskd->bkgtd", p_n, v_new,
                         preferred_element_type=jnp.float32)
        o_pb = o_p.reshape(B0, Hkv, K, 2, T, Dh).transpose(0, 2, 1, 3, 4, 5).reshape(B, Hkv, 2, T, Dh)
        l_p = jnp.sum(p_p, axis=-1).reshape(B0, Hkv, K, 2, T).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, 2, T)
        l = l_p + jnp.sum(p_c, axis=-1) + jnp.sum(p_n, axis=-1)
        o = (o_pb + o_c + o_n) / jnp.maximum(l, 1e-30)[..., None]
        return o.transpose(0, 3, 1, 2, 4).reshape(B, T, H, Dh)

    def sync(r):
        return float(np.asarray(jnp.sum(r).astype(jnp.float32)))

    results = {}
    for name, body in (("production cached_attention", production),
                       ("stripped einsum core", stripped)):
        run = chain(body)
        sync(run(q, ops))
        out = run(q, ops)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            sync(out)
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        last = run(q, ops)
        sync(last)
        dt = time.perf_counter() - t0 - rtt
        per_step = dt / REPS
        results[name] = per_step
        print(
            f"{name:34s} {per_step*1e3:7.3f} ms/step (24L)  "
            f"{nbytes/REPS/per_step/1e9:6.0f} GB/s effective",
            flush=True,
        )
    delta = results["production cached_attention"] - results["stripped einsum core"]
    print(f"mask/concat machinery delta: {delta*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
