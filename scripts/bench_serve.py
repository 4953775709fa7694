"""Continuous-batching serve engine vs static batching at mixed prompt lengths.

The static eval path (``models/generate.py``) pads every prompt in a batch to
the bucket of the LONGEST one — mixed-length traffic pays max-length prefill
and decode for every row.  The serve engine (``mimic_tpu/serve/engine.py``)
admits each prompt at its own length bucket into a fixed slot pool, so short
prompts stop subsidizing long ones.  This bench feeds both paths the same
mixed-length request stream (text-only decode shapes; vision encode is
identical work in both paths and would only dilute the comparison):

- 64 requests, prompt lengths uniform in [96, 512), 10 new tokens each
- static: batches of 16, every batch padded to 512 (the protocol bucket)
- engine: 32 slots, buckets (128, 256, 512)

Usage: ``python scripts/bench_serve.py``
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

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


def build_text_model():
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.config import ModelConfig, TextConfig
    from mimic_tpu.models.lm import init_lm_params
    from mimic_tpu.models.tokenizer import SimpleTokenizer

    tk = SimpleTokenizer(padding_side="left")
    text = TextConfig(
        vocab_size=32064, hidden_size=2048, num_layers=24, num_heads=16,
        num_kv_heads=8, intermediate_size=5632, norm_eps=1e-5,
    )
    cfg = ModelConfig(
        name="bench-serve-1b", family="text", text=text,
        pad_token_id=tk.pad_token_id, bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    params = {"lm": init_lm_params(text, jax.random.PRNGKey(0), dtype=jnp.bfloat16)}
    return cfg, params, tk


def make_requests(n=64, lo=96, hi=512, new_tokens=10, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(lo, hi, size=n)
    return [
        (rng.integers(300, 32000, size=L).astype(np.int32), new_tokens)
        for L in lens
    ]


def run_static(cfg, params, tk, reqs, batch_size=16, bucket=512):
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.generate import greedy_generate
    from mimic_tpu.models.lvlm import LVLMBatch

    def one_batch(chunk):
        B = len(chunk)
        ids = np.full((B, bucket), tk.pad_token_id, np.int32)
        mask = np.zeros((B, bucket), np.int32)
        for i, (p, _) in enumerate(chunk):
            ids[i, bucket - len(p):] = p
            mask[i, bucket - len(p):] = 1
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)
        )
        return greedy_generate(
            params, cfg, batch, max_new_tokens=chunk[0][1],
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )

    # warmup/compile
    print("compiling static path...", flush=True)
    out = one_batch(reqs[:batch_size])
    jax.block_until_ready(out.tokens)
    _ = int(np.asarray(out.tokens[0, 0]))

    t0 = time.perf_counter()
    outs = []
    for i in range(0, len(reqs), batch_size):
        outs.append(one_batch(reqs[i : i + batch_size]))
    _ = int(np.asarray(outs[-1].tokens[0, 0]))  # device sync
    dt = time.perf_counter() - t0
    return len(reqs) / dt, outs


def run_engine(cfg, params, tk, reqs, num_slots=32):
    import numpy as np

    from mimic_tpu.serve.engine import ServeEngine, ServeRequest

    eng = ServeEngine(
        cfg, params, num_slots=num_slots, max_len=544,
        prefill_buckets=(128, 256, 512), decode_block=5,
        eos_token_id=tk.eos_token_id,
    )
    # warmup: run the SAME request stream once on the SAME engine object —
    # compiles every (bucket, wave-size) prefill variant and the decode
    # program the measured run will use (``self`` is a static jit arg, so a
    # separate warm engine would not share the in-process executable cache)
    print("compiling engine paths...", flush=True)
    for uid, (p, n) in enumerate(reqs):
        eng.submit(ServeRequest(uid=uid, input_ids=p, max_new_tokens=n))
    eng.run()

    t0 = time.perf_counter()
    for uid, (p, n) in enumerate(reqs):
        eng.submit(ServeRequest(uid=uid, input_ids=p, max_new_tokens=n))
    results = eng.run()
    dt = time.perf_counter() - t0
    return len(reqs) / dt, results


def main():
    print("building model...", flush=True)
    cfg, params, tk = build_text_model()
    reqs = make_requests()

    static_qps, _ = run_static(cfg, params, tk, reqs)
    print(f"static batching (pad to 512): {static_qps:.1f} queries/s", flush=True)

    engine_qps, _ = run_engine(cfg, params, tk, reqs)
    print(f"serve engine (bucketed slots): {engine_qps:.1f} queries/s", flush=True)
    print(f"speedup: {engine_qps / static_qps:.2f}x", flush=True)


if __name__ == "__main__":
    main()
