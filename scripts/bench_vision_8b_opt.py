"""8B vision tower (27L, D1152, 980px → N4992) elementwise-phase probe.

docs/KERNELS.md attributes the 1333 ms measured vs 1078 ms floor gap (~200 ms)
to LN/residual/gelu bandwidth and scheduling.  This script measures exactly
where that slack is, by timing the production tower against ablated variants
(identity LN, no residual, identity gelu, fused qkv) at the real shape:
the deltas say what a fusion could actually buy BEFORE any kernel is written.

Usage: python scripts/bench_vision_8b_opt.py
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


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.layers import gelu_act, layer_norm
    from mimic_tpu.models.vision import init_vit_params
    from mimic_tpu.ops.flash_attention import flash_attention

    cfg = get_model_config("idefics2-8b-base").vision
    B, L = 16, cfg.num_layers
    D, F, H = cfg.hidden_size, cfg.intermediate_size, cfg.num_heads
    Dh = D // H
    N = ((cfg.image_size // cfg.patch_size) ** 2 + 127) // 128 * 128  # 4900→4992
    print(f"shape: B{B} L{L} N{N} D{D} F{F} H{H} Dh{Dh}", flush=True)

    vp = init_vit_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    lp_stack = vp["layers"]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, N, D)) * 0.02, jnp.bfloat16)
    kmask = jnp.ones((B, N), jnp.int32)

    def attn(q, k, v):
        out, _, _ = flash_attention(q, k, v, kmask, causal=False, need_unmasked=False)
        return out

    def make_tower(fuse_qkv=False, ln="real", residual=True, act="real"):
        def my_ln(h, w, b):
            if ln == "real":
                return layer_norm(h, w, b, cfg.norm_eps)
            return h

        def step(h, lp):
            res = h
            hn = my_ln(h, lp["ln1_w"], lp["ln1_b"])
            if fuse_qkv:
                wqkv = jnp.concatenate(
                    [lp["q_proj"], lp["k_proj"], lp["v_proj"]], axis=-1
                )
                bqkv = jnp.concatenate([lp["q_bias"], lp["k_bias"], lp["v_bias"]])
                qkv = jnp.dot(hn, wqkv) + bqkv
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = jnp.dot(hn, lp["q_proj"]) + lp["q_bias"]
                k = jnp.dot(hn, lp["k_proj"]) + lp["k_bias"]
                v = jnp.dot(hn, lp["v_proj"]) + lp["v_bias"]
            a = attn(
                q.reshape(B, N, H, Dh), k.reshape(B, N, H, Dh), v.reshape(B, N, H, Dh)
            )
            o = jnp.dot(a.reshape(B, N, D), lp["o_proj"]) + lp["o_bias"]
            h = res + o if residual else o
            res = h
            hn = my_ln(h, lp["ln2_w"], lp["ln2_b"])
            f = jnp.dot(hn, lp["fc1"]) + lp["fc1_bias"]
            if act == "real":
                f = gelu_act(f, cfg.hidden_act)
            d = jnp.dot(f, lp["fc2"]) + lp["fc2_bias"]
            return (res + d if residual else d), None

        @jax.jit
        def tower(x, stack):
            out, _ = jax.lax.scan(step, x, stack)
            return out

        return tower

    def sync(r):
        return float(np.asarray(jnp.sum(r[0, 0]).astype(jnp.float32)))

    def timed(name, tower, iters=5):
        sync(tower(x0, lp_stack))
        out = tower(x0, lp_stack)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            sync(out)
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last = tower(x0, lp_stack)
        sync(last)
        dt = (time.perf_counter() - t0 - rtt) / iters
        print(f"{name:40s} {dt*1e3:8.1f} ms ({dt*1e3/L:5.2f} ms/layer)", flush=True)
        return dt

    base = timed("production step (27L)", make_tower())
    fq = timed("fused qkv", make_tower(fuse_qkv=True))
    timed("fused qkv + identity LN", make_tower(fuse_qkv=True, ln="none"))
    timed("fused qkv + no residual", make_tower(fuse_qkv=True, residual=False))
    timed("fused qkv + identity gelu", make_tower(fuse_qkv=True, act="none"))
    timed(
        "all elementwise off",
        make_tower(fuse_qkv=True, ln="none", residual=False, act="none"),
    )
    print(f"fused-qkv delta: {(base - fq)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
