"""Microbench: ViT attention at idefics2-8b 980px shapes on the real chip.

The 8B phase breakdown (scripts/bench_8b_serving.py --phases) shows vision
encode at ~78% of the serving batch; within it, attention softmax is the VPU
roofline (B16 H16 N4992 D72 → 6.4G exp-elements per layer).  This bench times
the Pallas flash kernel alone at that shape (27 calls = one SigLIP tower) and
the full vit_forward, so kernel changes can be measured in ~1 min without the
2-minute 8B on-device build.

Usage: python scripts/bench_vision_attn.py [--full]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mimic_tpu.ops.flash_attention import flash_attention

    # N padded to a 1024-multiple, matching vit_forward's kernel-path padding
    # (models/vision.py): 4992 = 39*128 would force 384-key-blocks where
    # per-program overhead dominates
    B, N, H, D = 16, 5120, 16, 72
    maskcol = None
    if "--maskcol" in sys.argv:
        maskcol = True
    if "--no-maskcol" in sys.argv:
        maskcol = False
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
    valid = np.ones((B, N), np.int32)
    valid[:, 4900:] = 0  # 980px square: 4900 real patches, 92 pad
    key_mask = jnp.asarray(valid)

    layers = 27

    @jax.jit
    def tower_attn(q, k, v, key_mask):
        def step(h, _):
            out, _, _ = flash_attention(
                h, k, v, key_mask, causal=False, need_unmasked=False,
                mask_in_scores=maskcol,
            )
            return out.astype(h.dtype), None

        h, _ = jax.lax.scan(step, q, None, length=layers)
        return h

    def sync(x):
        # reduce on device and fetch ONE scalar: pulling the full output
        # through the host tunnel (~10 MB/s here) would dwarf the kernel time
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    sync(tower_attn(q, k, v, key_mask))  # compile
    t0 = time.perf_counter()
    out = tower_attn(q, k, v, key_mask)
    sync(out)
    dt = time.perf_counter() - t0
    per_layer = dt / layers * 1e3
    elems = B * H * N * N
    print(
        f"attention {layers} layers B{B} H{H} N{N} D{D}: {dt*1e3:.0f} ms total, "
        f"{per_layer:.1f} ms/layer, {elems/ (dt/layers) / 1e9:.0f} Gelem/s",
        flush=True,
    )

    if "--full" in sys.argv:
        from mimic_tpu.models.config import VisionConfig
        from mimic_tpu.models.vision import init_vit_params, vit_forward

        cfg = VisionConfig(
            hidden_size=1152, num_layers=27, num_heads=16,
            intermediate_size=4304, image_size=980, patch_size=14,
            use_class_token=False,
        )
        params = init_vit_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        pixels = jnp.asarray(rng.normal(size=(B, 980, 980, 3)), jnp.bfloat16)
        pmask = jnp.ones((B, 70, 70), jnp.int32)
        fwd = jax.jit(
            lambda p, px, pm: vit_forward(p, cfg, px, patch_mask=pm, attn_impl="flash")
        )
        sync(fwd(params, pixels, pmask))
        t0 = time.perf_counter()
        out = fwd(params, pixels, pmask)
        sync(out)
        dt = time.perf_counter() - t0
        print(f"full vit_forward 27L 980px B{B}: {dt*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
