"""ICL-protocol serving row: int8 mode with the int8 prompt-KV kernel on/off.

The quant-KV decode kernel's production shape is the ICL protocol
(BASELINE.json config 1 / reference ``src/config/data.yaml`` 32-shot
contexts): batch 8, ~2048-token multi-shot prompt, 8 demo images, beam 3,
10 new tokens.  The default gate in ``models/generate.py`` engages the kernel
at prompt length >= 1024 when an int8 decode copy is in use — this script
records the end-to-end q/s with the kernel ON vs OFF at exactly that
protocol, the number VERDICT r3 #6 asked to bank in BASELINE.md.

Usage: python scripts/bench_icl_int8.py
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


_enable_compile_cache()

import jax
import jax.numpy as jnp


def main():
    from bench import build_bench_model
    from mimic_tpu.models.generate import beam_generate
    from mimic_tpu.models.lvlm import LVLMBatch
    from mimic_tpu.ops.quant import quantize_lm_params

    cfg, params, tk = build_bench_model()
    dparams = quantize_lm_params(params)
    size = cfg.vision.image_size

    B, T, N = 8, 2048, 8  # ICL protocol: 8 demo images per query context
    rng = np.random.default_rng(0)
    ids = rng.integers(300, 32000, size=(B, T)).astype(np.int32)
    for i in range(N):
        pos = 4 + i * (cfg.image_seq_len + 64)
        ids[:, pos : pos + cfg.image_seq_len] = cfg.image_token_id
    batch = LVLMBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((B, T), jnp.int32),
        pixel_values=jnp.asarray(
            rng.normal(size=(B, N, size, size, 3)).astype(np.float32), jnp.bfloat16
        ),
        pixel_mask=jnp.ones((B, N), jnp.int32),
        patch_mask=jnp.ones((B, N, size // 14, size // 14), jnp.int32),
    )

    def sync(r):
        return float(np.asarray(jnp.sum(r.tokens).astype(jnp.float32)))

    def run(quant_kv):
        return beam_generate(
            params, cfg, batch, max_new_tokens=10, num_beams=3,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
            attn_impl="flash", decode_params=dparams, quant_kv=quant_kv,
        )

    results = {}
    for quant_kv in (False, True):
        sync(run(quant_kv))  # compile
        out = run(quant_kv)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            sync(out)
        rtt = (time.perf_counter() - t0) / 3
        iters = 5
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last = run(quant_kv)
        sync(last)
        dt = max(time.perf_counter() - t0 - rtt, 1e-6)
        ms = dt / iters * 1e3
        qps = B * iters / dt
        results[quant_kv] = qps
        print(
            f"ICL int8 serving quant_kv={quant_kv}: {ms:.0f} ms/batch -> "
            f"{qps:.2f} queries/s/chip",
            flush=True,
        )
    print(
        f"kernel delta at ICL protocol: {results[True]/results[False]:.3f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
