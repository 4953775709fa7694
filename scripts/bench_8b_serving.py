"""Single-chip 8B serving bench: idefics2-8b architecture in int8-memory mode.

The reference serves idefics2-8b on 20-40 GB GPUs (``scripts/run_mimic.sh:14``
`requires_memory 40000`; fp16 weights alone are ~16.7 GB).  A TPU v5e chip has
16 GB HBM — the bf16 tree does not fit, but the int8-memory serving mode
(``ops/quant.py``: per-channel weight-only quantization, fused qkv/gateup
layout) brings the text tower to ~7.3 GB and the whole model + KV cache under
~12 GB, so the full 8B model serves on ONE chip.

Weights are random (throughput is weight-value independent).  The tree is built
ON DEVICE leaf by leaf: each decoder weight stack is initialized in bf16,
quantized in place (lax.map keeps the fp32 transient to one layer), and the
bf16 copy freed before the next stack — peak HBM stays ≈ int8 tree + one bf16
stack.  A full bf16 8B tree never exists anywhere (host page faults in this
sandbox run ~10 MB/s, so host-side staging is not viable either).

Protocol: reference eval protocol shapes (batch 16, beam 3, 10 new tokens,
512-token prompt, 1 image per query, variable-aspect vision path).

Usage: ``python scripts/bench_8b_serving.py [--phases]`` — with ``--phases``
also times vision encode and prefill separately (decode = total − prefill).
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def build_8b_int8():
    """Device-side leaf-streaming build of the int8-memory idefics2-8b tree."""
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.lvlm import init_lvlm_params
    from mimic_tpu.models.tokenizer import SimpleTokenizer
    from mimic_tpu.ops.quant import (
        DECODER_MATMUL_KEYS,
        concat_quantized,
        quantize_weight,
    )

    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config("idefics2-8b-base")
    cfg = cfg.replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )

    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        lambda: init_lvlm_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )

    make = jax.jit(
        lambda key, shape=None: jax.random.normal(key, shape, jnp.bfloat16) * 0.02,
        static_argnames=("shape",),
    )
    key = jax.random.PRNGKey(0)

    def build(tree, quantize_matmuls=False):
        """Device-side init; decoder matmul stacks quantize immediately so the
        bf16 copy of each stack is freed before the next one materializes."""
        nonlocal key
        out = {}
        for name, leaf in tree.items():
            if isinstance(leaf, dict):
                out[name] = build(leaf, quantize_matmuls)
                continue
            key, sub = jax.random.split(key)
            arr = make(sub, shape=tuple(leaf.shape))
            if quantize_matmuls and name in DECODER_MATMUL_KEYS:
                q = quantize_weight(arr)
                del arr
                jax.block_until_ready(q["q8"])
                out[name] = q
            else:
                out[name] = arr
        return out

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    params = {}
    lm_shapes = dict(shapes["lm"]) if "lm" in shapes else dict(shapes)
    dec_shapes = dict(lm_shapes.pop("decoder"))
    layer_shapes = dict(dec_shapes.pop("layers"))

    params["vision"] = build(shapes["vision"])
    if "connector" in shapes:
        params["connector"] = build(shapes["connector"])
    lm = {k: build({k: v})[k] if not isinstance(v, dict) else build(v)
          for k, v in lm_shapes.items() if k != "lm_head"}
    dec = {k: build({k: v})[k] if not isinstance(v, dict) else build(v)
           for k, v in dec_shapes.items()}
    layers = build(layer_shapes, quantize_matmuls=True)
    # fuse at the int8 level (identical to quantizing the concatenation —
    # per-column scales; all Ns here are 128-aligned so no interior padding)
    layers["qkv_proj"] = concat_quantized(
        [layers.pop("q_proj"), layers.pop("k_proj"), layers.pop("v_proj")]
    )
    layers["gateup_proj"] = concat_quantized(
        [layers.pop("gate_proj"), layers.pop("up_proj")]
    )
    dec["layers"] = layers
    lm["decoder"] = dec
    if "lm_head" in lm_shapes:
        key, sub = jax.random.split(key)
        lm["lm_head"] = quantize_weight(make(sub, shape=tuple(lm_shapes["lm_head"].shape)))
    params["lm"] = lm
    jax.block_until_ready(params)
    gb = sum(l.nbytes for l in jax.tree.leaves(params)) / 1e9
    print(
        f"built {n_params/1e9:.2f}B-param model on device, int8 tree {gb:.1f} GB "
        f"({time.perf_counter()-t0:.0f}s)",
        flush=True,
    )
    return cfg, params, tk, n_params


def make_batch(cfg, B=16, T=512, N=1):
    import jax.numpy as jnp

    from mimic_tpu.models.lvlm import LVLMBatch

    size = cfg.vision.image_size
    rng = np.random.default_rng(0)
    ids = rng.integers(300, 32000, size=(B, T)).astype(np.int32)
    ids[:, 4 : 4 + cfg.image_seq_len] = cfg.image_token_id
    return LVLMBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((B, T), jnp.int32),
        pixel_values=jnp.asarray(
            rng.normal(size=(B, N, size, size, 3)).astype(np.float32), jnp.bfloat16
        ),
        pixel_mask=jnp.ones((B, N), jnp.int32),
        patch_mask=jnp.ones((B, N, size // 14, size // 14), jnp.int32),
    )


def run_8b_bench(phases: bool = False, iters: int = 5, w8a8: bool = False):
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.generate import _prefill, beam_generate

    cfg, params, tk, n_params = build_8b_int8()
    mode = "int8-memory"
    if w8a8:
        # same weight bytes, prefill matmuls re-tagged for the int8 MXU
        from mimic_tpu.ops.quant import mark_act_quant

        params = mark_act_quant(params)
        mode = "int8-w8a8"
    batch = make_batch(cfg)
    B = batch.input_ids.shape[0]
    attn = "flash" if jax.default_backend() == "tpu" else "xla"

    run = lambda: beam_generate(
        params, cfg, batch,
        max_new_tokens=10, num_beams=3,
        eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        attn_impl=attn,
    )

    def sync(x) -> float:
        return float(np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])

    results = {}

    if phases:
        from mimic_tpu.models.lvlm import encode_images

        vis = jax.jit(
            lambda p, pv, pm: encode_images(p, cfg, pv, pm, attn_impl=attn)
        )
        sync(vis(params, batch.pixel_values, batch.patch_mask))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = vis(params, batch.pixel_values, batch.patch_mask)
        sync(out)
        results["vision_ms"] = (time.perf_counter() - t0) / iters * 1e3
        print(f"vision encode: {results['vision_ms']:.0f} ms/batch", flush=True)

        total = batch.input_ids.shape[1] + 10
        pre = jax.jit(
            lambda p, b: _prefill(
                p, cfg, b, total, None, None, 1.0, "unmasked", jnp.bfloat16, attn
            )[0]
        )
        sync(pre(params, batch))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = pre(params, batch)
        sync(out)
        results["prefill_ms"] = (time.perf_counter() - t0) / iters * 1e3
        print(f"prefill (incl. vision): {results['prefill_ms']:.0f} ms/batch", flush=True)

    t0 = time.perf_counter()
    sync(run())
    print(f"compile+first batch {time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = run()
    sync(last)
    dt = time.perf_counter() - t0
    results["total_ms"] = dt / iters * 1e3
    results["qps"] = B * iters / dt
    print(
        f"8B {mode} serving: {results['total_ms']:.0f} ms/batch -> "
        f"{results['qps']:.2f} queries/s/chip",
        flush=True,
    )
    if phases and "prefill_ms" in results:
        dec = results["total_ms"] - results["prefill_ms"]
        print(
            f"decode (total - prefill): {dec:.0f} ms / 10 steps = "
            f"{dec / 10:.1f} ms/step",
            flush=True,
        )
    return results


if __name__ == "__main__":
    run_8b_bench(phases="--phases" in sys.argv, w8a8="--w8a8" in sys.argv)
