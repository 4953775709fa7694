"""Phase breakdown for the headline bench model (bench.py shapes).

Times vision encode, prefill (incl. vision), greedy end-to-end, and beam-3
end-to-end on the current backend, using the queue-K-then-sync-one-scalar
methodology (block_until_ready does not block on the axon tunnel backend).

Usage: python scripts/bench_phases.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_bench_model
    from mimic_tpu.models.decoder import init_kv_cache
    from mimic_tpu.models.generate import _prefill, beam_generate, greedy_generate
    from mimic_tpu.models.lvlm import LVLMBatch, encode_images

    cfg, params, tk = build_bench_model()

    B, T, N = 16, 512, 1
    size = cfg.vision.image_size
    rng = np.random.default_rng(0)
    ids = rng.integers(300, 32000, size=(B, T)).astype(np.int32)
    ids[:, 4 : 4 + cfg.image_seq_len] = cfg.image_token_id
    batch = LVLMBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((B, T), jnp.int32),
        pixel_values=jnp.asarray(
            rng.normal(size=(B, N, size, size, 3)).astype(np.float32), jnp.bfloat16
        ),
        pixel_mask=jnp.ones((B, N), jnp.int32),
        patch_mask=jnp.ones((B, N, size // 14, size // 14), jnp.int32),
    )
    attn = "flash" if jax.default_backend() == "tpu" else "xla"

    def timed(name, fn, sync, iters=8):
        sync(fn())  # compile + warmup
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
        print(f"{name:32s} {dt * 1e3:8.1f} ms/batch", flush=True)
        return dt

    vis = jax.jit(
        lambda p, b: encode_images(p, cfg, b.pixel_values, b.patch_mask, attn_impl=attn)
    )
    timed("vision encode", lambda: vis(params, batch), lambda r: float(np.asarray(r[0, 0, 0].astype(jnp.float32))))

    total_len = T + 10
    pre = jax.jit(
        lambda p, b: _prefill(
            p, cfg, b, total_len, None, None, 1.0, False, jnp.bfloat16, attn_impl=attn
        )[0]
    )
    timed("prefill incl. vision", lambda: pre(params, batch), lambda r: float(np.asarray(r[0, 0].astype(jnp.float32))))

    def sync_gen(r):
        return int(np.asarray(r.tokens[0, 0]))

    t_greedy = timed(
        "greedy e2e (10 tok)",
        lambda: greedy_generate(
            params, cfg, batch, max_new_tokens=10,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
            attn_impl=attn,
        ),
        sync_gen,
    )
    t_beam = timed(
        "beam-3 e2e (10 tok)",
        lambda: beam_generate(
            params, cfg, batch, max_new_tokens=10, num_beams=3,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
            attn_impl=attn,
        ),
        sync_gen,
    )
    print(f"beam qps: {B / t_beam:.1f}  greedy qps: {B / t_greedy:.1f}", flush=True)


if __name__ == "__main__":
    main()
