"""Vision-encode sub-phase breakdown for the headline bench model.

Times: patch-embed + position lookup, the 12-layer tower scan (and its
attention share), and the idefics2 connector (modality proj + perceiver), on
the current backend at B=16, 378px SigLIP shapes.

Usage: python scripts/bench_vision_phases.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, sync, iters=10):
    sync(fn())
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
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_bench_model
    from mimic_tpu.models.vision import (
        bucket_position_ids, patchify, perceiver_forward, vit_forward,
    )

    cfg, params, tk = build_bench_model()
    vp = params["vision"]
    vc = cfg.vision
    B = 16
    size = vc.image_size
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(B, size, size, 3)).astype(np.float32), jnp.bfloat16
    )
    patch_mask = jnp.ones((B, size // 14, size // 14), jnp.int32)

    def sync_f(r):
        return float(np.asarray(jnp.sum(r).astype(jnp.float32)))

    @jax.jit
    def embed(vp, pixels, patch_mask):
        x = jnp.dot(patchify(pixels, vc.patch_size), vp["patch_embed"]["kernel"])
        x = x + vp["patch_embed"]["bias"]
        pos_ids = bucket_position_ids(patch_mask)
        n_pos = vp["pos_embed"].shape[0]
        onehot = (pos_ids[:, :, None] == jnp.arange(n_pos)[None, None, :]).astype(
            vp["pos_embed"].dtype
        )
        return x + jnp.einsum("bnt,td->bnd", onehot, vp["pos_embed"])

    timed("patch embed + pos lookup", lambda: embed(vp, pixels, patch_mask), sync_f)

    @jax.jit
    def tower(vp, pixels, patch_mask):
        return vit_forward(vp, vc, pixels, patch_mask=patch_mask, attn_impl="flash")

    t_tower = timed("full tower (embed+12L+post_ln)", lambda: tower(vp, pixels, patch_mask), sync_f)

    # tower with 1-layer params, to get the per-layer cost and fixed overhead
    vp1 = dict(vp)
    vp1["layers"] = jax.tree.map(lambda a: a[:1], vp["layers"])

    @jax.jit
    def tower1(vp1, pixels, patch_mask):
        return vit_forward(vp1, vc, pixels, patch_mask=patch_mask, attn_impl="flash")

    t1 = timed("tower with 1 layer", lambda: tower1(vp1, pixels, patch_mask), sync_f)
    print(f"  -> per-layer {1e3 * (t_tower - t1) / (vc.num_layers - 1):.2f} ms", flush=True)

    feats = tower(vp, pixels, patch_mask)
    ctx_mask = patch_mask.reshape(B, -1)

    @jax.jit
    def connector(cp, feats, ctx_mask):
        return perceiver_forward(
            cp, cfg.perceiver, feats, norm_eps=cfg.text.norm_eps, context_mask=ctx_mask
        )

    timed("connector (modality proj + perceiver)", lambda: connector(params["connector"], feats, ctx_mask), sync_f)


if __name__ == "__main__":
    main()
