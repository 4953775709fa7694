"""Single-chip 8B MimIC TRAINING bench: dual-pass step, int8 frozen tower.

The reference's flagship workload is *training* MimIC on idefics2-8b, which
needs a ≥40 GB GPU with ZeRO-2 + CPU offload (``scripts/run_mimic.sh:14``
``requires_memory 40000``, ``src/config/train.yaml:14``
``deepspeed_stage_2_offload``).  The TPU build fits the same dual-pass step on
ONE 16 GB v5e chip:

- the frozen tower is held int8 (weight-only, per-channel — the serving
  build's device-side leaf-streaming quantization, ``bench_8b_serving.py``);
  every int8 matmul differentiates w.r.t. activations through
  ``ops/quant.py::_input_vjp`` (dX = dY·deq(W)ᵀ, exact);
- only the tiny shift pytree gets gradients/optimizer state (the MimIC
  regime, reference ``src/shift_model.py:306-357``) — no ZeRO, no offload;
- the quality gate for int8-tower training is
  ``tests/test_train_int8_tower.py`` (loss curves within 5%, trained-shift
  cosine >0.98 vs the bf16 tower on the oracle model).

Protocol shapes follow the reference train scale: batch 2, record pass
T=2048 with 8 demo images + 1 query image per sample (980px, variable-aspect
path), shift pass T=256 with the query image; losses LM + layer-wise MSE on
M=64 gathered query rows (``src/config/peft/mimic.yaml``).

Usage: ``python scripts/bench_8b_train.py``
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def make_train_batch(cfg, B=2, T_rec=2048, T_shift=256, n_demo_img=8, M=64):
    import jax.numpy as jnp

    size = cfg.vision.image_size
    ng = size // 14
    rng = np.random.default_rng(0)
    S = cfg.image_seq_len  # 64 inline tokens per image

    full_ids = rng.integers(300, 32000, size=(B, T_rec)).astype(np.int32)
    for i in range(n_demo_img + 1):  # demo images + the query image
        pos = 4 + i * (S + 128)
        full_ids[:, pos : pos + S] = cfg.image_token_id
    query_ids = rng.integers(300, 32000, size=(B, T_shift)).astype(np.int32)
    query_ids[:, 4 : 4 + S] = cfg.image_token_id

    def pixels(n):
        return (
            jnp.asarray(
                rng.normal(size=(B, n, size, size, 3)).astype(np.float32),
                jnp.bfloat16,
            ),
            jnp.ones((B, n), jnp.int32),
            jnp.ones((B, n, ng, ng), jnp.int32),
        )

    fpx, fpm, fpatch = pixels(n_demo_img + 1)
    qpx, qpm, qpatch = pixels(1)
    idx = jnp.asarray(np.tile(np.arange(M)[None], (B, 1)), jnp.int32)
    return {
        "full_ids": jnp.asarray(full_ids),
        "full_mask": jnp.ones((B, T_rec), jnp.int32),
        "full_pixels": fpx, "full_pixel_mask": fpm, "full_patch_mask": fpatch,
        "query_ids": jnp.asarray(query_ids),
        "query_mask": jnp.ones((B, T_shift), jnp.int32),
        "query_pixels": qpx, "query_pixel_mask": qpm, "query_patch_mask": qpatch,
        "prefix_q_idx": idx, "shift_q_idx": idx,
        "q_valid": jnp.ones((B, M), jnp.int32),
    }


def analytic_flops(cfg, B, T_rec, T_shift, n_imgs, M):
    """Matmul+attention FLOPs of the dual-pass step (text: record fwd + shift
    fwd + activation-only backward; vision: forward per image, no grads —
    XLA generates no vision backward since no trainable input feeds it)."""
    t = cfg.text
    D, H, Dh = t.hidden_size, t.num_heads, t.head_size
    Hkv, F, L, V = t.num_kv_heads, t.intermediate_size, t.num_layers, t.vocab_size
    p_layer = L * (D * (H * Dh + 2 * Hkv * Dh) + H * Dh * D + 3 * D * F)

    def text_fwd(tokens, ctx):
        return 2 * p_layer * tokens + L * 2 * tokens * ctx * H * Dh

    text = (
        text_fwd(B * T_rec, T_rec)
        + 3 * text_fwd(B * T_shift, T_shift)  # fwd + dX backward (~2× fwd)
        + 2 * (2 * M * B * D * V)             # gathered lm_head rows, both passes
    )
    v = cfg.vision
    N = (v.image_size // v.patch_size) ** 2
    Np = ((N + 127) // 128) * 128  # lane-padded attention length
    pv_layer = v.num_layers * (4 * v.hidden_size**2 + 2 * v.hidden_size * v.intermediate_size)
    vision_one = 2 * pv_layer * N + v.num_layers * 4 * Np * Np * v.hidden_size
    return text, n_imgs * vision_one


def run_8b_train_bench(
    iters: int = 5, B: int = 2, T_rec: int = 2048, T_shift: int = 256,
    n_demo: int = 8,
) -> dict:
    """Measure the 8B dual-pass step (cold vision + warm-cache); returns
    {"cold_ms", "warm_ms", "mfu", "text_mfu_warm"}.  Frees nothing — callers
    should drop references / clear caches afterwards.

    Defaults are the 8-shot shape; ``T_rec=8192, n_demo=33`` is the
    reference's FULL default protocol (``src/config/data.yaml`` num_shot 32:
    32 demo images + 1 query image in the record context)."""
    import jax
    import jax.numpy as jnp

    from bench_8b_serving import build_8b_int8
    from mimic_tpu.config import get_preset
    from mimic_tpu.shift.params import init_shift_params
    from mimic_tpu.train import TrainState, build_optimizer, make_train_step

    cfg, params, tk, n_params = build_8b_int8()

    enc, peft = get_preset("mimic")
    shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
    trainable = {"shift": shift}
    n_train = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(trainable))
    print(f"trainable shift params: {n_train/1e6:.2f}M", flush=True)

    tx = build_optimizer(
        trainable, lr=peft.lr, weight_decay=1e-3, warmup_steps=10,
        total_steps=1000, grad_clip=1.0,
    )
    step = make_train_step(
        cfg, enc, tx,
        ce_loss_weight=peft.ce_loss_weight,
        align_loss_weight=peft.align_loss_weight,
        donate=False,
        attn_impl="flash" if jax.default_backend() == "tpu" else "xla",
        # recompute shift-pass layer internals in the backward (HBM headroom;
        # the shift pass is 1/8 the record pass's tokens, so the extra FLOPs
        # are small next to the record forward)
        shift_remat=True,
    )
    state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))

    M = 64
    print(f"config: B{B} T_rec{T_rec} T_shift{T_shift} demos {n_demo}", flush=True)
    batch = make_train_batch(cfg, B, T_rec, T_shift, n_demo, M)

    text_f, vision_f = analytic_flops(
        cfg, B, T_rec, T_shift, B * (n_demo + 2), M
    )
    flops = text_f + vision_f
    peak = 197e12  # v5e bf16 (the step's matmuls run bf16 after dequant)

    # a one-program encode of > ~20 980px images OOMs (the connector's
    # [n,4900,14336] bf16 intermediate is 8.4 GB at n=64 next to the 9.6 GB
    # weight tree) — the cold in-step measurement only runs where it fits
    dt = float("nan")
    loss0 = None
    state2 = state
    if B * (n_demo + 2) <= 24:
        t0 = time.perf_counter()
        state2, metrics = step(state, params, batch)
        loss0 = float(np.asarray(metrics["loss"]))
        print(
            f"compile+first step {time.perf_counter()-t0:.0f}s, loss {loss0:.4f}",
            flush=True,
        )

        t0 = time.perf_counter()
        m = None
        for _ in range(iters):
            state2, m = step(state2, params, batch)
        last_loss = float(np.asarray(m["loss"]))  # device sync
        dt = (time.perf_counter() - t0) / iters
        print(
            f"8B dual-pass train step: {dt*1e3:.0f} ms/step  "
            f"({flops/1e12:.1f} TF analytic: text {text_f/1e12:.1f} + vision "
            f"{vision_f/1e12:.1f}) -> {flops/dt/1e12:.1f} TF/s, "
            f"MFU {flops/dt/peak:.3f} vs bf16 peak",
            flush=True,
        )
        print(f"loss {loss0:.4f} -> {last_loss:.4f} over {iters+1} steps", flush=True)
        grad_norm = float(np.asarray(m["grad_norm"]))
        print(f"grad_norm {grad_norm:.4f}", flush=True)
    else:
        print(
            "cold in-step vision encode skipped: "
            f"{B*(n_demo+2)} images/step exceeds the one-program encode budget "
            "(the training vision cache is the supported path at this shot "
            "count — exactly like eval's chunked encodes)",
            flush=True,
        )

    # --- warm vision-feature cache (train/vision_cache.py): demo images
    # resample from a fixed train set, so after epoch 1 every record-pass
    # image is a hit and the step runs vision-free.  Steady-state step: ---
    from mimic_tpu.models.lvlm import encode_images

    enc_fn = jax.jit(
        lambda p, px, pm: encode_images(p, cfg, px, pm, attn_impl="flash")
    )

    def chunked_feats(px, pm):
        """Encode [B,N,...] images 16 flat-images at a time (bounds the
        connector intermediate), reassembling [B, N*S, D]."""
        Bp, Np = px.shape[:2]
        flat_px = px.reshape((Bp * Np, 1) + px.shape[2:])
        flat_pm = pm.reshape((Bp * Np, 1) + pm.shape[2:])
        outs = [
            enc_fn(params, flat_px[i : i + 16], flat_pm[i : i + 16])
            for i in range(0, Bp * Np, 16)
        ]
        out = jnp.concatenate(outs)  # [B*N, S, D]
        return out.reshape(Bp, Np * out.shape[1], out.shape[2])

    fb = {k: v for k, v in batch.items()}
    fb["full_feats"] = chunked_feats(batch["full_pixels"], batch["full_patch_mask"])
    fb["query_feats"] = chunked_feats(batch["query_pixels"], batch["query_patch_mask"])
    for pfx in ("full", "query"):
        for suf in ("pixels", "pixel_mask", "patch_mask"):
            fb.pop(f"{pfx}_{suf}", None)
    jax.block_until_ready(fb["full_feats"])

    state3, m3 = step(state2, params, fb)
    float(np.asarray(m3["loss"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state3, m3 = step(state3, params, fb)
    loss_c = float(np.asarray(m3["loss"]))
    dt_c = (time.perf_counter() - t0) / iters
    print(
        f"8B train step, warm vision cache: {dt_c*1e3:.0f} ms/step "
        f"({dt*1e3:.0f} cold) -> {text_f/dt_c/1e12:.1f} text-TF/s, "
        f"text-MFU {text_f/dt_c/peak:.3f}; loss {loss_c:.4f}",
        flush=True,
    )
    has_cold = dt == dt  # not NaN
    return {
        "cold_ms": dt * 1e3 if has_cold else None,
        "warm_ms": dt_c * 1e3,
        "mfu": flops / dt / peak if has_cold else None,
        "text_mfu_warm": text_f / dt_c / peak,
    }


def main():
    _enable_compile_cache()
    if "--shots32" in sys.argv:
        # the reference's full default protocol: 32-shot contexts
        run_8b_train_bench(iters=3, T_rec=8192, n_demo=33)
    else:
        run_8b_train_bench()


if __name__ == "__main__":
    main()
