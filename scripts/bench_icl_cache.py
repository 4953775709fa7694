"""ICL protocol with the vision-feature cache: the round-5 throughput lever.

The ICL eval resamples demo images from ONE fixed support set (reference
``src/dataset_utils/interface.py:296-317``), so across an eval the same
support images are vision-encoded hundreds of times — 64 encodes/batch
dominate the recorded 12.3 q/s (bf16) / 14.1 (int8) ICL rows (BASELINE.md).
With ``models/feature_cache.py`` each support image encodes ONCE; per batch
only the fresh query images miss.

Protocol (same shape class as ``bench_icl_int8.py`` / BASELINE.json config 1):
batch 8, 2048-token prompt, 8 image slots per row — slot 0 is a FRESH query
image every iteration (permanent miss), slots 1-7 are drawn from a 64-image
support pool (hits once warm).  Steady state: 8 misses + 56 hits per batch.

Usage: ``python scripts/bench_icl_cache.py``
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def run_icl_cache_bench(cfg=None, params=None, tk=None, iters=5, pool_size=64):
    """Returns {"qps_cached", "qps_uncached", "hit_rate", "ms_cached", "ms_uncached"}."""
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.feature_cache import VisionFeatureCache
    from mimic_tpu.models.generate import beam_generate
    from mimic_tpu.models.lvlm import LVLMBatch

    if cfg is None:
        from bench import build_bench_model

        cfg, params, tk = build_bench_model()

    B, T, N = 8, 2048, 8
    size = cfg.vision.image_size
    np_side = size // 14
    rng = np.random.default_rng(0)
    ids = rng.integers(300, 32000, size=(B, T)).astype(np.int32)
    for i in range(N):
        pos = 4 + i * (cfg.image_seq_len + 64)
        ids[:, pos : pos + cfg.image_seq_len] = cfg.image_token_id
    ids_j = jnp.asarray(ids)
    mask_j = jnp.ones((B, T), jnp.int32)

    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    pool = rng.normal(size=(pool_size, size, size, 3)).astype(bf16)
    pm_np = np.ones((B, N, np_side, np_side), np.int32)

    def make_pixels(it):
        """Fresh query image per row; demo slots drawn from the fixed pool."""
        px = np.empty((B, N, size, size, 3), bf16)
        keys = []
        draw = np.random.default_rng(1000 + it)
        for b in range(B):
            px[b, 0] = draw.normal(size=(size, size, 3)).astype(bf16)
            keys.append(("query", it, b))
            for j, d in enumerate(draw.integers(0, pool_size, size=N - 1)):
                px[b, 1 + j] = pool[d]
                keys.append(("supp", int(d)))
        return px, keys

    def sync(r):
        return float(np.asarray(jnp.sum(r.tokens).astype(jnp.float32)))

    gen_kw = dict(
        max_new_tokens=10, num_beams=3,
        eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        attn_impl="flash" if jax.default_backend() == "tpu" else "xla",
    )

    # -- uncached baseline (pixels through the in-program encode) ------------
    px0, _ = make_pixels(0)
    batch_px = LVLMBatch(
        input_ids=ids_j, attention_mask=mask_j,
        pixel_values=jnp.asarray(px0, jnp.bfloat16),
        pixel_mask=jnp.ones((B, N), jnp.int32),
        patch_mask=jnp.asarray(pm_np),
    )
    run_unc = lambda: beam_generate(params, cfg, batch_px, **gen_kw)
    sync(run_unc())  # compile
    out = run_unc()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        sync(out)
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = run_unc()
    sync(last)
    dt_unc = max(time.perf_counter() - t0 - rtt, 1e-6)
    qps_unc = B * iters / dt_unc

    # -- cached path ---------------------------------------------------------
    cache = VisionFeatureCache(max_bytes=1 << 30)
    batch_nopx = LVLMBatch(input_ids=ids_j, attention_mask=mask_j)

    def one_cached(it):
        px, keys = make_pixels(it)
        feats = cache.get_features(
            params, cfg, px, pm_np, keys, attn_impl=gen_kw["attn_impl"]
        )
        return beam_generate(
            params, cfg, batch_nopx, image_feats=feats, **gen_kw
        )

    # warm the cache with the ENTIRE pool in one call (the real eval's first
    # pass over the support set), so every timed iteration misses exactly its
    # 8 fresh query images — one constant miss-encode shape, no mid-timing
    # compiles
    pool_px = pool.reshape(1, pool_size, size, size, 3)
    pool_pm = np.ones((1, pool_size, np_side, np_side), np.int32)
    cache.get_features(
        params, cfg, pool_px, pool_pm,
        [("supp", i) for i in range(pool_size)], attn_impl=gen_kw["attn_impl"],
    )
    sync(one_cached(0))  # compile the miss-encode + cached-generate programs
    sync(one_cached(1))  # steady-shape warm call
    # prebuild the measured iterations' pixels (host RNG image synthesis is
    # bench-harness cost, not protocol cost — real eval reads dataset images)
    prebuilt = [make_pixels(100 + it) for it in range(iters)]

    def one_prebuilt(px, keys):
        feats = cache.get_features(
            params, cfg, px, pm_np, keys, attn_impl=gen_kw["attn_impl"]
        )
        return beam_generate(
            params, cfg, batch_nopx, image_feats=feats, **gen_kw
        )

    cache.hits = cache.misses = 0
    t0 = time.perf_counter()
    last = None
    for px, keys in prebuilt:
        last = one_prebuilt(px, keys)
    sync(last)
    dt_c = max(time.perf_counter() - t0 - rtt, 1e-6)
    qps_c = B * iters / dt_c

    return {
        "qps_cached": qps_c,
        "qps_uncached": qps_unc,
        "ms_cached": dt_c / iters * 1e3,
        "ms_uncached": dt_unc / iters * 1e3,
        "hit_rate": cache.hit_rate,
        "pool": pool_size,
    }


def main():
    _enable_compile_cache()
    r = run_icl_cache_bench()
    print(
        f"ICL uncached: {r['ms_uncached']:.0f} ms/batch -> {r['qps_uncached']:.2f} q/s\n"
        f"ICL cached:   {r['ms_cached']:.0f} ms/batch -> {r['qps_cached']:.2f} q/s "
        f"(hit rate {r['hit_rate']:.3f})\n"
        f"speedup: {r['qps_cached'] / r['qps_uncached']:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
