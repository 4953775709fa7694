"""Serve engine vs static batching WITH images (round-5: the engine's
images path had CPU tests but no benchmark).

Workload: 32 requests on the 1.67B idefics2-family bench model, prompt
lengths uniform in [96, 512) with 64 inline image tokens each, ONE 378px
image per request, 10 new tokens, greedy.

- static: batches of 16 padded to 512 through ``greedy_generate`` (vision
  encode inside the prefill) — the reference's static shape;
- engine: 16 slots, buckets (128, 256, 512); each admission wave vision-
  encodes its own requests' pixels inside the fused prefill+splice program.

Usage: ``python scripts/bench_serve_images.py``
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


def make_requests(cfg, n=32, lo=96, hi=512, new_tokens=10, seed=0):
    size = cfg.vision.image_size
    ng = size // 14
    rng = np.random.default_rng(seed)
    reqs = []
    for L in rng.integers(lo, hi, size=n):
        ids = rng.integers(300, 32000, size=int(L)).astype(np.int32)
        ids[4 : 4 + cfg.image_seq_len] = cfg.image_token_id
        px = rng.normal(size=(1, size, size, 3)).astype(np.float32)
        pm = np.ones((1, ng, ng), np.int32)
        reqs.append((ids, px, pm, new_tokens))
    return reqs


def run_static(cfg, params, tk, reqs, batch_size=16, bucket=512):
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.generate import greedy_generate
    from mimic_tpu.models.lvlm import LVLMBatch

    def one_batch(chunk):
        B = len(chunk)
        ids = np.full((B, bucket), tk.pad_token_id, np.int32)
        mask = np.zeros((B, bucket), np.int32)
        px = np.zeros((B,) + chunk[0][1].shape, np.float32)
        pm = np.zeros((B,) + chunk[0][2].shape, np.int32)
        for i, (p, im, m, _) in enumerate(chunk):
            ids[i, bucket - len(p):] = p
            mask[i, bucket - len(p):] = 1
            px[i], pm[i] = im, m
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(px, jnp.bfloat16),
            pixel_mask=jnp.ones((B, 1), jnp.int32),
            patch_mask=jnp.asarray(pm),
        )
        return greedy_generate(
            params, cfg, batch, max_new_tokens=chunk[0][3],
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
            attn_impl="flash" if jax.default_backend() == "tpu" else "xla",
        )

    print("compiling static path...", flush=True)
    out = one_batch(reqs[:batch_size])
    _ = int(np.asarray(out.tokens[0, 0]))

    t0 = time.perf_counter()
    outs = []
    for i in range(0, len(reqs), batch_size):
        outs.append(one_batch(reqs[i : i + batch_size]))
    _ = int(np.asarray(outs[-1].tokens[0, 0]))
    dt = time.perf_counter() - t0
    return len(reqs) / dt


def run_engine(cfg, params, tk, reqs, num_slots=32):
    from mimic_tpu.serve.engine import ServeEngine, ServeRequest

    eng = ServeEngine(
        cfg, params, num_slots=num_slots, max_len=544,
        prefill_buckets=(128, 256, 512), decode_block=5,
        eos_token_id=tk.eos_token_id,
    )
    print("compiling engine paths...", flush=True)
    for uid, (p, px, pm, n) in enumerate(reqs):
        eng.submit(ServeRequest(
            uid=uid, input_ids=p, pixel_values=px, patch_mask=pm,
            max_new_tokens=n,
        ))
    eng.run()

    t0 = time.perf_counter()
    for uid, (p, px, pm, n) in enumerate(reqs):
        eng.submit(ServeRequest(
            uid=uid, input_ids=p, pixel_values=px, patch_mask=pm,
            max_new_tokens=n,
        ))
    eng.run()
    dt = time.perf_counter() - t0
    return len(reqs) / dt


def run_engine_feats(cfg, params, tk, reqs, num_slots=32, encode_batch=16):
    """Vision-decoupled mode: encode all requests' images in big batches
    BEFORE submission (the production shape: a vision front-end / feature
    cache feeds the engine), then admit with precomputed ``image_feats``.
    The pre-encode time is measured as part of the engine's total."""
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.lvlm import encode_images
    from mimic_tpu.serve.engine import ServeEngine, ServeRequest

    attn = "flash" if jax.default_backend() == "tpu" else "xla"
    enc = jax.jit(
        lambda p, px, pm: encode_images(p, cfg, px, pm, attn_impl=attn)
    )

    def encode_all():
        outs = []
        for i in range(0, len(reqs), encode_batch):
            chunk = reqs[i : i + encode_batch]
            px = jnp.asarray(
                np.stack([r[1] for r in chunk]), jnp.bfloat16
            )  # [B,1,H,W,C]
            pm = jnp.asarray(np.stack([r[2] for r in chunk]))
            outs.append(enc(params, px, pm))  # [B, S, D]
        return jnp.concatenate(outs)  # ONE shared base [R, S, D]

    def submit_run(eng, base):
        for uid, (p, _, _, n) in enumerate(reqs):
            eng.submit(ServeRequest(
                uid=uid, input_ids=p, image_feats=(base, uid), max_new_tokens=n,
            ))
        return eng.run()

    eng = ServeEngine(
        cfg, params, num_slots=num_slots, max_len=544,
        prefill_buckets=(128, 256, 512), decode_block=5,
        eos_token_id=tk.eos_token_id,
    )
    print("compiling engine (feats) paths...", flush=True)
    submit_run(eng, encode_all())

    t0 = time.perf_counter()
    submit_run(eng, encode_all())
    dt = time.perf_counter() - t0
    return len(reqs) / dt


def main():
    _enable_compile_cache()
    from bench import build_bench_model

    cfg, params, tk = build_bench_model()
    reqs = make_requests(cfg)

    static_qps = run_static(cfg, params, tk, reqs)
    print(f"static batching with images:  {static_qps:.1f} q/s", flush=True)
    engine_qps = run_engine(cfg, params, tk, reqs)
    print(f"engine, in-wave encode:       {engine_qps:.1f} q/s", flush=True)
    feats_qps = run_engine_feats(cfg, params, tk, reqs)
    print(f"engine, decoupled encode:     {feats_qps:.1f} q/s", flush=True)
    print(
        f"speedup decoupled-engine/static: {feats_qps / static_qps:.2f}x "
        f"(in-wave {engine_qps / static_qps:.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
