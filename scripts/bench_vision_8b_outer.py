"""8B vision encode: where the time OUTSIDE the 27-layer tower goes.

The tower core measures ~1216 ms (bench_vision_8b_opt.py); end-to-end
``encode_images`` was recorded at 1333 ms.  This times the full path and its
sub-phases at the exact production shape (B16, 980px, variable-aspect mask,
one 980-valid image per row) to locate the difference: patchify + one-hot
position lookup, pixel cast, mask plumbing, connector.

Usage: python scripts/bench_vision_8b_outer.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.lvlm import encode_images, init_lvlm_params
    from mimic_tpu.models.vision import (
        bucket_position_ids, patchify, perceiver_forward, vit_forward,
    )

    full_cfg = get_model_config("idefics2-8b-base")
    cfg = full_cfg.vision
    B = 16
    size = cfg.image_size
    ng = size // cfg.patch_size

    # vision + connector params only (no 8B text tower needed)
    import jax.random as jr

    from mimic_tpu.models.vision import init_perceiver_params, init_vit_params

    vp = init_vit_params(cfg, jr.PRNGKey(0), dtype=jnp.bfloat16)
    cp = init_perceiver_params(
        full_cfg.perceiver, cfg.hidden_size, full_cfg.text.hidden_size,
        jr.PRNGKey(1), jnp.bfloat16, project_first=True,
    )
    params = {"vision": vp, "connector": cp}

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(B, 1, size, size, 3)).astype(np.float32), jnp.bfloat16
    )
    patch_mask = jnp.ones((B, 1, ng, ng), jnp.int32)

    def sync(r):
        return float(np.asarray(jnp.sum(r[0, 0]).astype(jnp.float32)))

    def timed(name, fn, iters=5):
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
        print(f"{name:44s} {dt*1e3:8.1f} ms", flush=True)
        return dt

    enc = jax.jit(
        lambda p, px, pm: encode_images(p, full_cfg, px, pm, attn_impl="flash")
    )
    timed("encode_images end-to-end", lambda: enc(params, pixels, patch_mask))

    flat_px = pixels.reshape(B, size, size, 3)
    flat_pm = patch_mask.reshape(B, ng, ng)
    tower = jax.jit(
        lambda vp, px, pm: vit_forward(vp, cfg, px, patch_mask=pm, attn_impl="flash")
    )
    t_tower = timed("vit_forward (embed+27L+post_ln)", lambda: tower(vp, flat_px, flat_pm))

    @jax.jit
    def embed(vp, px, pm):
        x = jnp.dot(patchify(px, cfg.patch_size), vp["patch_embed"]["kernel"])
        x = x + vp["patch_embed"]["bias"]
        pos_ids = bucket_position_ids(pm)
        n_pos = vp["pos_embed"].shape[0]
        onehot = (pos_ids[:, :, None] == jnp.arange(n_pos)[None, None, :]).astype(
            vp["pos_embed"].dtype
        )
        return x + jnp.einsum("bnt,td->bnd", onehot, vp["pos_embed"])

    timed("patchify + one-hot pos embed", lambda: embed(vp, flat_px, flat_pm))

    feats = tower(vp, flat_px, flat_pm)
    ctx = flat_pm.reshape(B, -1)
    conn = jax.jit(
        lambda cp, f, m: perceiver_forward(
            cp, full_cfg.perceiver, f, norm_eps=full_cfg.text.norm_eps, context_mask=m
        )
    )
    timed("connector (proj + perceiver)", lambda: conn(cp, feats, ctx))


if __name__ == "__main__":
    main()
