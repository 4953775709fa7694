"""Benchmark: query-evaluation throughput per chip, eval-protocol shapes.

Measures end-to-end generation throughput (queries/sec) on one TPU chip for an
idefics2-family model in bf16 under the reference eval protocol
(``src/config/eval.yaml``: batch 16, num_beams 3, max_new_tokens 10, one image per
query).  The model is a ~1.1B-parameter instantiation of the flagship
architecture (random weights — throughput is weight-value independent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the previous recorded value in BASELINE.md's
measured table when present, else 1.0 (the reference repo publishes no numbers —
BASELINE.json "published": {}).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_bench_model():
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.config import ModelConfig, PerceiverConfig, TextConfig, VisionConfig
    from mimic_tpu.models.lvlm import init_lvlm_params
    from mimic_tpu.models.tokenizer import SimpleTokenizer

    tk = SimpleTokenizer(padding_side="left")
    text = TextConfig(
        vocab_size=32064,
        hidden_size=2048,
        num_layers=24,
        num_heads=16,
        num_kv_heads=8,
        intermediate_size=5632,
        norm_eps=1e-5,
    )
    vision = VisionConfig(
        hidden_size=1152,
        num_layers=12,
        num_heads=16,
        intermediate_size=4304,
        image_size=378,
        patch_size=14,
        use_class_token=False,
    )
    cfg = ModelConfig(
        name="bench-idefics2-1b",
        family="idefics2",
        text=text,
        vision=vision,
        perceiver=PerceiverConfig(num_latents=64, num_layers=3, num_heads=16, num_kv_heads=4),
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
        image_seq_len=64,
    )
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    return cfg, params, tk


def main():
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.generate import beam_generate
    from mimic_tpu.models.lvlm import LVLMBatch

    cfg, params, tk = build_bench_model()
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

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
        # real idefics2 eval keeps aspect ratio → the variable-aspect path
        # (bucketized position ids + masked vision attention) is always active;
        # the bench exercises it too
        patch_mask=jnp.ones((B, N, size // 14, size // 14), jnp.int32),
    )

    run = lambda: beam_generate(
        params, cfg, batch,
        max_new_tokens=10, num_beams=3,
        eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        attn_impl="flash",
    )

    def sync(result) -> float:
        # device→host scalar pull: the only reliable sync on remote-tunnel
        # backends where block_until_ready returns before execution finishes
        return int(np.asarray(result.tokens[0, 0]))

    # warmup / compile
    sync(run())

    # measure the host round-trip latency alone (tiny precomputed transfer)
    small = run()
    sync(small)
    t0 = time.perf_counter()
    for _ in range(3):
        sync(small)
    rtt = (time.perf_counter() - t0) / 3

    # queue `iters` generations back-to-back (device stream serializes them),
    # then one sync on the last result covers them all
    iters = 5
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = run()
    sync(last)
    dt = max(time.perf_counter() - t0 - rtt, 1e-6)
    qps = B * iters / dt

    baseline = _previous_value()
    vs = qps / baseline if baseline else 1.0
    print(
        json.dumps(
            {
                "metric": "eval_query_throughput_idefics2_1b_beam3",
                "value": round(qps, 3),
                "unit": "queries/sec/chip",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "params": n_params,
                    "batch": B,
                    "prompt_len": T,
                    "beams": 3,
                    "new_tokens": 10,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


def _previous_value():
    """Last recorded value from BENCH_r*.json, if the driver left any."""
    import glob

    best = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            data = json.load(open(path))
            if isinstance(data, dict) and "value" in data:
                best = data["value"]
        except Exception:
            pass
    return best


if __name__ == "__main__":
    main()
