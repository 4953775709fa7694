"""Crossover measurement for the int8 prompt-KV decode kernel gate.

The kernel halves the dominant decode-step HBM read (beam-shared prompt KV)
but adds one Pallas call per layer per step plus a one-time quantization pass.
At the eval protocol (Sp=512, 10 new tokens) the byte saving is too small:
bf16 prompt einsums won 76.7 vs 74.6 q/s end-to-end (BENCH history).  This
script measures beam-3 end-to-end batch time with the kernel ON vs OFF across
prompt lengths to place the static gate in ``models/generate.py``.

Usage: python scripts/bench_quant_kv_gate.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from bench import build_bench_model
    from mimic_tpu.models.lvlm import LVLMBatch
    from mimic_tpu.models.generate import beam_generate
    from mimic_tpu.ops.quant import quantize_lm_params

    cfg, params, tk = build_bench_model()
    dparams = quantize_lm_params(params)
    size = cfg.vision.image_size
    rng = np.random.default_rng(0)

    def sync(r):
        return float(np.asarray(jnp.sum(r.tokens).astype(jnp.float32)))

    for B, T in ((16, 512), (8, 1024), (8, 2048), (4, 4096)):
        ids = rng.integers(300, 32000, size=(B, T)).astype(np.int32)
        ids[:, 4 : 4 + cfg.image_seq_len] = cfg.image_token_id
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((B, T), jnp.int32),
            pixel_values=jnp.asarray(
                rng.normal(size=(B, 1, size, size, 3)).astype(np.float32),
                jnp.bfloat16,
            ),
            pixel_mask=jnp.ones((B, 1), jnp.int32),
            patch_mask=jnp.ones((B, 1, size // 14, size // 14), jnp.int32),
        )
        for qkv in (False, True):
            fn = lambda: beam_generate(
                params, cfg, batch, max_new_tokens=10, num_beams=3,
                eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
                attn_impl="flash", decode_params=dparams, quant_kv=qkv,
            )
            sync(fn())
            out = fn()
            sync(out)
            t0 = time.perf_counter()
            for _ in range(3):
                sync(out)
            rtt = (time.perf_counter() - t0) / 3
            iters = 5
            t0 = time.perf_counter()
            last = None
            for _ in range(iters):
                last = fn()
            sync(last)
            dt = (time.perf_counter() - t0 - rtt) / iters
            print(
                f"B={B} T={T} quant_kv={qkv}: {dt * 1e3:7.1f} ms/batch "
                f"({B / dt:6.2f} q/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
