"""ICL protocol at the REAL 8B scale: idefics2-8b, 8 × 980px demo images/row.

BASELINE.json config 1's shape class (reference ``src/config/data.yaml``:
multi-shot contexts, beam 3, 10 new tokens) on the full idefics2-8b
architecture served int8-w8a8 on one 16 GB chip — batch 8, 2048-token
prompts, 8 image slots per row (slot 0 a fresh query image, slots 1-7 from a
16-image support pool).  Measures the protocol uncached (every image through
the vision tower, the reference's behavior) and with the vision-feature
cache (support images encode once).

Usage: ``python scripts/bench_icl_8b.py``
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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
    import ml_dtypes

    from bench_8b_serving import build_8b_int8
    from mimic_tpu.models.feature_cache import VisionFeatureCache
    from mimic_tpu.models.generate import beam_generate
    from mimic_tpu.models.lvlm import LVLMBatch
    from mimic_tpu.ops.quant import mark_act_quant

    cfg, params, tk, _ = build_8b_int8()
    params = mark_act_quant(params)  # w8a8 text prefill (the 8B serving mode)

    B, T, N, POOL, iters = 8, 2048, 8, 16, 3
    size = cfg.vision.image_size
    ng = size // 14
    bf16 = ml_dtypes.bfloat16
    rng = np.random.default_rng(0)
    ids = rng.integers(300, 32000, size=(B, T)).astype(np.int32)
    for i in range(N):
        pos = 4 + i * (cfg.image_seq_len + 128)
        ids[:, pos : pos + cfg.image_seq_len] = cfg.image_token_id
    ids_j = jnp.asarray(ids)
    mask_j = jnp.ones((B, T), jnp.int32)
    pm_np = np.ones((B, N, ng, ng), np.int32)
    pool = rng.normal(size=(POOL, size, size, 3)).astype(bf16)

    def make_pixels(it):
        px = np.empty((B, N, size, size, 3), bf16)
        keys = []
        draw = np.random.default_rng(1000 + it)
        for b in range(B):
            px[b, 0] = draw.normal(size=(size, size, 3)).astype(bf16)
            keys.append(("query", it, b))
            for j, d in enumerate(draw.integers(0, POOL, size=N - 1)):
                px[b, 1 + j] = pool[d]
                keys.append(("supp", int(d)))
        return px, keys

    gen_kw = dict(
        max_new_tokens=10, num_beams=3,
        eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        attn_impl="flash" if jax.default_backend() == "tpu" else "xla",
    )

    def sync(r):
        return float(np.asarray(jnp.sum(r.tokens).astype(jnp.float32)))

    # -- uncached (reference behavior: EVERY image through the tower, every
    # batch).  The encode is chunked 16-images-at-a-time — encoding all 64 in
    # one program materializes the connector's [64,4900,14336] bf16
    # intermediate (8.4 GB, OOM next to the 9.6 GB weight tree); chunking is
    # strictly favorable to this baseline. --------------------------------
    from mimic_tpu.models.lvlm import encode_images

    enc_fn = jax.jit(
        lambda p, px, pm: encode_images(p, cfg, px, pm, attn_impl=gen_kw["attn_impl"])
    )
    px0, _ = make_pixels(0)
    px0_j = jnp.asarray(px0)
    pm_j = jnp.asarray(pm_np)
    batch_nopx = LVLMBatch(input_ids=ids_j, attention_mask=mask_j)

    def run_unc():
        chunks = [
            enc_fn(
                params,
                px0_j.reshape(B * N, 1, size, size, 3)[i : i + 16],
                pm_j.reshape(B * N, 1, ng, ng)[i : i + 16],
            )
            for i in range(0, B * N, 16)
        ]
        feats = jnp.concatenate(chunks).reshape(B, N * cfg.image_seq_len, -1)
        return beam_generate(params, cfg, batch_nopx, image_feats=feats, **gen_kw)

    t0 = time.perf_counter()
    sync(run_unc())
    print(f"compile+first uncached batch {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = run_unc()
    sync(last)
    dt_u = (time.perf_counter() - t0) / iters
    print(
        f"8B ICL uncached: {dt_u*1e3:.0f} ms/batch -> {B/dt_u:.2f} q/s/chip",
        flush=True,
    )

    # -- cached ---------------------------------------------------------------
    cache = VisionFeatureCache(max_bytes=1 << 30)
    batch_nopx = LVLMBatch(input_ids=ids_j, attention_mask=mask_j)
    cache.get_features(
        params, cfg, pool.reshape(1, POOL, size, size, 3),
        np.ones((1, POOL, ng, ng), np.int32),
        [("supp", i) for i in range(POOL)], attn_impl=gen_kw["attn_impl"],
    )

    def one_cached(px, keys):
        feats = cache.get_features(
            params, cfg, px, pm_np, keys, attn_impl=gen_kw["attn_impl"]
        )
        return beam_generate(
            params, cfg, batch_nopx, image_feats=feats, **gen_kw
        )

    sync(one_cached(*make_pixels(0)))
    sync(one_cached(*make_pixels(1)))
    prebuilt = [make_pixels(100 + it) for it in range(iters)]
    cache.hits = cache.misses = 0
    t0 = time.perf_counter()
    last = None
    for px, keys in prebuilt:
        last = one_cached(px, keys)
    sync(last)
    dt_c = (time.perf_counter() - t0) / iters
    print(
        f"8B ICL cached:   {dt_c*1e3:.0f} ms/batch -> {B/dt_c:.2f} q/s/chip "
        f"(hit rate {cache.hit_rate:.3f})",
        flush=True,
    )
    print(f"speedup: {dt_u/dt_c:.2f}x", flush=True)


if __name__ == "__main__":
    main()
