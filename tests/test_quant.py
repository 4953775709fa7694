"""Int8 weight-only quantization (ops/quant.py).

- quantize_weight: per-channel symmetric scales, exact int8 range, lane padding
- int8_matmul Pallas kernel (interpret mode) == dequantized jnp reference
- qdot CPU fallback == (x @ dequant(W)) exactly
- quantize_lm_params: full-model transform, forward equals the manually
  dequantized model (the quantization error itself, not the kernel, is the only
  deviation from bf16 — validated by reconstruction-error bound)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.ops.quant import (
    int8_matmul,
    is_quantized,
    qdot,
    quantize_lm_params,
    quantize_weight,
)


def _dequant(w):
    n = w["scale"].shape[-1]
    return w["q8"][..., :n].astype(jnp.float32) * w["scale"][..., None, :]


class TestQuantizeWeight:
    def test_roundtrip_error_bound(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 96))
        q = quantize_weight(w)
        assert q["q8"].dtype == jnp.int8
        # per-channel scale: error ≤ scale/2 per element
        err = np.abs(np.asarray(_dequant(q) - w))
        bound = np.asarray(q["scale"])[None, :] * 0.5 + 1e-7
        assert (err <= bound).all()

    def test_lane_padding(self):
        w = jnp.ones((32, 200))
        q = quantize_weight(w)
        assert q["q8"].shape == (32, 256)
        assert q["scale"].shape == (200,)
        assert np.asarray(q["q8"][:, 200:]).sum() == 0

    def test_stacked_layers(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 128))
        q = quantize_weight(w)
        assert q["q8"].shape == (4, 32, 128)
        assert q["scale"].shape == (4, 128)
        # per-layer slices quantize identically to slicing then quantizing
        q0 = quantize_weight(w[0])
        np.testing.assert_array_equal(np.asarray(q["q8"][0]), np.asarray(q0["q8"]))

    def test_zero_column(self):
        w = jnp.zeros((16, 128)).at[:, 0].set(1.0)
        q = quantize_weight(w)
        assert np.isfinite(np.asarray(q["scale"])).all()
        np.testing.assert_allclose(np.asarray(_dequant(q)), np.asarray(w), atol=1e-6)


class TestInt8Matmul:
    @pytest.mark.parametrize("m,k,n", [(16, 128, 128), (32, 256, 384), (48, 128, 256)])
    def test_kernel_interpret_matches_reference(self, m, k, n):
        kx, kw = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(kx, (m, k), jnp.float32)
        w = jax.random.normal(kw, (k, n), jnp.float32)
        q = quantize_weight(w)
        out = int8_matmul(
            x, q["q8"], q["scale"], block_m=16, block_n=128, block_k=128,
            interpret=True,
        )
        ref = x @ _dequant(q)
        # multi-K-block runs accumulate in a different fp32 order than one einsum
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=1e-4)

    def test_kernel_multi_k_block_accumulation(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (16, 512), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(4), (512, 128), jnp.float32)
        q = quantize_weight(w)
        out = int8_matmul(
            x, q["q8"], q["scale"], block_m=16, block_n=128, block_k=128,
            interpret=True,
        )
        ref = x @ _dequant(q)
        # multi-K-block runs accumulate in a different fp32 order than one einsum
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=1e-4)


class TestQdot:
    def test_plain_array_passthrough(self):
        x = jnp.ones((2, 3, 8))
        w = jnp.ones((8, 4))
        np.testing.assert_array_equal(np.asarray(qdot(x, w)), np.asarray(jnp.dot(x, w)))

    def test_quantized_fallback_exact(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 64))
        w = jax.random.normal(jax.random.PRNGKey(6), (64, 200))
        q = quantize_weight(w)
        out = qdot(x, q)
        ref = jnp.einsum("btk,kn->btn", x.astype(jnp.float32), _dequant(q))
        assert out.shape == (2, 7, 200)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_preferred_element_type(self):
        x = jax.random.normal(jax.random.PRNGKey(7), (4, 64), jnp.bfloat16)
        q = quantize_weight(jax.random.normal(jax.random.PRNGKey(8), (64, 128)))
        out = qdot(x, q, preferred_element_type=jnp.float32)
        assert out.dtype == jnp.float32


class TestQuantizeLMParams:
    def _tiny(self):
        from mimic_tpu.models.config import get_model_config
        from mimic_tpu.models.lvlm import init_lvlm_params
        from mimic_tpu.models.tokenizer import SimpleTokenizer

        tk = SimpleTokenizer(padding_side="left")
        cfg = get_model_config("tiny-idefics2")
        cfg = cfg.replace(
            image_token_id=tk.image_token_id,
            pad_token_id=tk.pad_token_id,
            bos_token_id=tk.bos_token_id,
            eos_token_id=tk.eos_token_id,
            text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}),
        )
        params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        return cfg, params, tk

    def test_transform_structure(self):
        cfg, params, _ = self._tiny()
        qp = quantize_lm_params(params)
        layers = qp["lm"]["decoder"]["layers"]
        # fused serving layout: q/k/v → qkv_proj, gate/up → gateup_proj
        assert is_quantized(layers["qkv_proj"]) and is_quantized(layers["gateup_proj"])
        assert is_quantized(layers["o_proj"]) and is_quantized(layers["down_proj"])
        assert "q_proj" not in layers and "gate_proj" not in layers
        t = cfg.text
        assert layers["qkv_proj"]["scale"].shape[-1] == (
            t.num_heads + 2 * t.num_kv_heads
        ) * t.head_size
        assert not is_quantized(layers["input_ln"])
        # vision untouched, original tree unmodified
        assert not is_quantized(params["lm"]["decoder"]["layers"]["q_proj"])
        assert qp["vision"] is params["vision"]
        if "lm_head" in qp["lm"]:
            assert is_quantized(qp["lm"]["lm_head"])

    def test_transform_structure_unfused(self):
        cfg, params, _ = self._tiny()
        qp = quantize_lm_params(params, fuse=False)
        layers = qp["lm"]["decoder"]["layers"]
        assert is_quantized(layers["q_proj"]) and is_quantized(layers["down_proj"])
        assert "qkv_proj" not in layers and "gateup_proj" not in layers

    def test_forward_matches_dequantized_model(self):
        from mimic_tpu.models.lvlm import LVLMBatch, lvlm_forward

        cfg, params, tk = self._tiny()
        qp = quantize_lm_params(params)

        # manually dequantize back into a plain tree
        def undo(t):
            if is_quantized(t):
                return _dequant(t)
            return t

        dq_params = jax.tree.map(undo, qp, is_leaf=is_quantized)

        B, T = 2, 16
        rng = np.random.default_rng(0)
        ids = rng.integers(3, 250, size=(B, T)).astype(np.int32)
        ids[:, 2 : 2 + cfg.image_seq_len] = cfg.image_token_id
        size = cfg.vision.image_size
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((B, T), jnp.int32),
            pixel_values=jnp.asarray(rng.normal(size=(B, 1, size, size, 3)).astype(np.float32)),
            pixel_mask=jnp.ones((B, 1), jnp.int32),
        )
        logits_q = lvlm_forward(qp, cfg, batch).logits
        logits_d = lvlm_forward(dq_params, cfg, batch).logits
        np.testing.assert_allclose(
            np.asarray(logits_q), np.asarray(logits_d), rtol=2e-4, atol=2e-4
        )

    def test_greedy_generate_runs_quantized(self):
        from mimic_tpu.models.generate import greedy_generate
        from mimic_tpu.models.lvlm import LVLMBatch

        cfg, params, tk = self._tiny()
        qp = quantize_lm_params(params)
        B, T = 2, 16
        rng = np.random.default_rng(1)
        ids = rng.integers(3, 250, size=(B, T)).astype(np.int32)
        ids[:, 2 : 2 + cfg.image_seq_len] = cfg.image_token_id
        size = cfg.vision.image_size
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((B, T), jnp.int32),
            pixel_values=jnp.asarray(rng.normal(size=(B, 1, size, size, 3)).astype(np.float32)),
            pixel_mask=jnp.ones((B, 1), jnp.int32),
        )
        out = greedy_generate(
            qp, cfg, batch, max_new_tokens=4,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        assert out.tokens.shape == (B, 4)


class TestInt8MatmulStacked:
    def test_stacked_kernel_interpret(self):
        from mimic_tpu.ops.quant import int8_matmul_stacked

        L, M, K, N = 3, 16, 256, 128
        kx, kw = jax.random.split(jax.random.PRNGKey(9))
        x = jax.random.normal(kx, (M, K), jnp.float32)
        w = jax.random.normal(kw, (L, K, N), jnp.float32)
        q = quantize_weight(w)
        for l in range(L):
            out = int8_matmul_stacked(
                x, q["q8"], q["scale"], jnp.int32(l),
                block_m=16, block_n=128, block_k=128, interpret=True,
            )
            ref = x @ _dequant(q)[l]
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=5e-4, atol=1e-4
            )

    def test_fused_mlp_interpret_matches_reference(self):
        # one-kernel SwiGLU MLP == silu(x@Wg)·(x@Wu) @ Wd on dequantized weights
        from mimic_tpu.ops.quant import fused_mlp_stacked

        L, M, D, F = 2, 16, 128, 512
        kx, kg, kd = jax.random.split(jax.random.PRNGKey(20), 3)
        x = jax.random.normal(kx, (M, D), jnp.float32)
        gu = jax.random.normal(kg, (L, D, 2 * F), jnp.float32)
        down = jax.random.normal(kd, (L, F, D), jnp.float32) / np.sqrt(F)
        qgu, qdown = quantize_weight(gu), quantize_weight(down)
        for l in range(L):
            out = fused_mlp_stacked(
                x, qgu["q8"], qgu["scale"], qdown["q8"], qdown["scale"],
                jnp.int32(l), block_f=256, interpret=True,
            )
            g = x @ _dequant(qgu)[l][:, :F]
            u = x @ _dequant(qgu)[l][:, F:]
            ref = (jax.nn.silu(g) * u) @ _dequant(qdown)[l]
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=5e-3, atol=5e-3
            )

    def test_fused_mlp_dispatch_requires_stacked_tpu(self):
        # the dispatcher declines off-TPU / unstacked handles — decoder falls
        # back to the two-qdot path, so CPU CI still covers the math
        from mimic_tpu.ops.quant import fused_mlp

        gu = quantize_weight(jnp.ones((2, 64, 512)))
        down = quantize_weight(jnp.ones((2, 256, 64)))
        x = jnp.ones((4, 64))
        assert fused_mlp(x, gu, down) is None  # no layer index
        h_gu = {**gu, "layer": jnp.int32(0)}
        h_down = {**down, "layer": jnp.int32(0)}
        if jax.default_backend() != "tpu":
            assert fused_mlp(x, h_gu, h_down) is None

    def test_qdot_stacked_handle_fallback(self):
        w = jax.random.normal(jax.random.PRNGKey(10), (4, 64, 128))
        q = quantize_weight(w)
        x = jax.random.normal(jax.random.PRNGKey(11), (2, 5, 64))
        out = qdot(x, {"q8": q["q8"], "scale": q["scale"], "layer": jnp.int32(2)})
        ref = jnp.einsum("btk,kn->btn", x.astype(jnp.float32), _dequant(q)[2])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_decoder_scan_uses_stacked_handles(self):
        # quantized forward through the full decoder (CPU fallback) still matches
        # the manually dequantized model — covers the index-carrying scan path
        from mimic_tpu.models.config import get_model_config
        from mimic_tpu.models.lm import init_lm_params, lm_forward

        cfg = get_model_config("tiny-idefics2").text
        params = init_lm_params(cfg, jax.random.PRNGKey(0))
        qp = quantize_lm_params(params)

        def undo(t):
            return _dequant(t) if is_quantized(t) else t

        dq = jax.tree.map(undo, qp, is_leaf=is_quantized)
        ids = jnp.asarray(np.random.default_rng(3).integers(0, 250, size=(2, 12)), jnp.int32)
        from mimic_tpu.models.decoder import make_causal_mask

        mask = make_causal_mask(jnp.ones((2, 12), jnp.int32))
        lq = lm_forward(qp, cfg, ids, attn_mask=mask)
        ld = lm_forward(dq, cfg, ids, attn_mask=mask)
        np.testing.assert_allclose(
            np.asarray(lq.logits), np.asarray(ld.logits), rtol=2e-4, atol=2e-4
        )


class TestRunnerQuantModes:
    def _runner(self, quant=None):
        from mimic_tpu.models.factory import build_model

        return build_model("tiny-idefics2", quant=quant)

    def test_dual_copy_mode(self):
        r = self._runner(quant="int8")
        assert r.decode_params is not None
        layers = r.decode_params["lm"]["decoder"]["layers"]
        assert is_quantized(layers["qkv_proj"])
        # serving copy, main tree untouched
        assert not is_quantized(r.params["lm"]["decoder"]["layers"]["q_proj"])

    def test_memory_mode_and_reset(self):
        r = self._runner(quant="int8-memory")
        assert r.decode_params is None
        assert is_quantized(r.params["lm"]["decoder"]["layers"]["qkv_proj"])
        # idempotent re-apply
        r.set_quant("int8-memory")
        # dual-copy on an already-quantized tree is an error
        with pytest.raises(ValueError):
            r.set_quant("int8")

    def test_none_drops_copy(self):
        r = self._runner(quant="int8")
        r.set_quant(None)
        assert r.decode_params is None

    def test_unknown_mode(self):
        with pytest.raises(ValueError):
            self._runner(quant="fp4")

    def test_generate_parity_close_to_bf16(self):
        # decode-copy generation should usually pick the same greedy tokens as
        # full precision on a tiny model (weak check: runs + same shapes)
        r_full = self._runner()
        r_q = self._runner(quant="int8")
        imgs, texts = None, ["hello world", "the quick brown fox"]
        out_full = r_full.generate(imgs, texts, max_new_tokens=4)
        out_q = r_q.generate(imgs, texts, max_new_tokens=4)
        assert len(out_full) == len(out_q) == 2

    def test_eval_config_quant_field(self):
        from mimic_tpu.config import EvalConfig, apply_overrides

        cfg = EvalConfig()
        assert cfg.quant is None
        apply_overrides(cfg, ["quant=int8"])
        assert cfg.quant == "int8"


def test_idefics1_cross_attention_quant_generate():
    # cross-attention layers quantize unfused (q reads text, k/v read image
    # states) and the full generate path runs on the quantized tree
    from mimic_tpu.models.factory import build_model

    r = build_model("tiny-idefics1", quant="int8-memory")
    cross = r.params["lm"]["decoder"]["cross"]
    assert is_quantized(cross["q_proj"]) and "qkv_proj" not in cross
    img = np.zeros((64, 64, 3), np.uint8)
    conv = [{"role": "user", "content": [{"type": "image"}, {"type": "text", "text": "hi"}]}]
    out = r.generate([[img]], [conv], num_beams=2, max_new_tokens=3)
    assert len(out) == 1


class TestW8A8:
    """int8×int8 MXU path: per-row activation quantization + two-scale epilogue.

    Opt-in (``act_quant=True`` / quant="int8-w8a8"); only large-K text-prefill
    shapes dispatch to it on TPU (measured table in the module docstring)."""

    def test_quantize_rows(self):
        from mimic_tpu.ops.quant import quantize_rows

        x = jax.random.normal(jax.random.PRNGKey(9), (4, 7, 64))
        x8, xs = quantize_rows(x)
        assert x8.dtype == jnp.int8 and xs.shape == (4, 7)
        rec = x8.astype(jnp.float32) * xs[..., None]
        err = np.abs(np.asarray(rec - x))
        assert (err <= np.asarray(xs)[..., None] * 0.5 + 1e-7).all()
        # max-magnitude element hits ±127 exactly
        assert np.abs(np.asarray(x8)).max(axis=-1).min() == 127

    def test_quantize_rows_zero_row(self):
        from mimic_tpu.ops.quant import quantize_rows

        x8, xs = quantize_rows(jnp.zeros((3, 16)))
        assert np.isfinite(np.asarray(xs)).all()
        assert np.asarray(x8).sum() == 0

    @pytest.mark.parametrize("m,k,n", [(128, 128, 128), (256, 256, 384)])
    def test_kernel_interpret_matches_reference(self, m, k, n):
        from mimic_tpu.ops.quant import quantize_rows, w8a8_matmul

        kx, kw = jax.random.split(jax.random.PRNGKey(10))
        x = jax.random.normal(kx, (m, k), jnp.float32)
        w = jax.random.normal(kw, (k, n), jnp.float32)
        q = quantize_weight(w, act_quant=True)
        x8, xs = quantize_rows(x)
        out = w8a8_matmul(
            x8, xs, q["q8"], q["scale"], out_dtype=jnp.float32,
            block_m=128, block_n=128, block_k=128, interpret=True,
        )
        ref = (x8.astype(jnp.float32) * xs[:, None]) @ _dequant(q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=1e-3)

    def test_stacked_kernel_interpret_picks_layer(self):
        from mimic_tpu.ops.quant import quantize_rows, w8a8_matmul_stacked

        x = jax.random.normal(jax.random.PRNGKey(11), (128, 128), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(12), (3, 128, 256), jnp.float32)
        q = quantize_weight(w, act_quant=True)
        x8, xs = quantize_rows(x)
        for l in (0, 2):
            out = w8a8_matmul_stacked(
                x8, xs, q["q8"], q["scale"], jnp.int32(l), out_dtype=jnp.float32,
                block_m=128, block_n=128, block_k=128, interpret=True,
            )
            ref = (x8.astype(jnp.float32) * xs[:, None]) @ _dequant(
                {"q8": q["q8"][l], "scale": q["scale"][l]}
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=1e-3)

    def test_qdot_a8_handle_cpu_fallback_exact(self):
        # off-TPU the a8 marker is inert: same exact dequant fallback
        x = jax.random.normal(jax.random.PRNGKey(13), (300, 64))
        w = jax.random.normal(jax.random.PRNGKey(14), (64, 200))
        qa = quantize_weight(w, act_quant=True)
        assert "a8" in qa and qa["a8"].size == 0
        out = qdot(x, qa)
        ref = x.astype(jnp.float32) @ _dequant(qa)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_pad_k_storage_exact(self):
        # ragged-K weights can zero-pad the contraction axis; qdot pads the
        # activation columns to match (zero rows contribute nothing)
        x = jax.random.normal(jax.random.PRNGKey(15), (4, 200))
        w = jax.random.normal(jax.random.PRNGKey(16), (200, 128))
        q = quantize_weight(w, pad_k=True)
        assert q["q8"].shape == (256, 128)
        assert np.asarray(q["q8"][200:]).sum() == 0
        out = qdot(x, q)
        ref = x.astype(jnp.float32) @ _dequant(quantize_weight(w))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_quantize_lm_params_act_quant_marks_self_attn_only(self):
        from mimic_tpu.models.factory import build_model

        r = build_model("tiny-idefics1", quant="int8-w8a8")
        dec = r.params["lm"]["decoder"]
        assert "a8" in dec["layers"]["qkv_proj"]
        assert "a8" in dec["layers"]["gateup_proj"]
        # cross-attention and lm head stay weight-only
        assert "a8" not in dec["cross"]["q_proj"]
        assert "a8" not in r.params["lm"]["lm_head"]
        # generate still runs end-to-end (CPU: marker inert)
        img = np.zeros((64, 64, 3), np.uint8)
        out = r.generate([[img]], ["User: hi<image>\nAssistant:"], max_new_tokens=3)
        assert len(out) == 1

    def test_mark_act_quant_retags_without_copy(self):
        from mimic_tpu.models.factory import build_model
        from mimic_tpu.ops.quant import mark_act_quant

        r = build_model("tiny-idefics2", quant="int8-memory")
        marked = mark_act_quant(r.params)
        lay = marked["lm"]["decoder"]["layers"]
        orig = r.params["lm"]["decoder"]["layers"]
        assert "a8" in lay["qkv_proj"] and "a8" not in orig["qkv_proj"]
        # same underlying weight buffers, no requantization
        assert lay["qkv_proj"]["q8"] is orig["qkv_proj"]["q8"]
        # non-quantized leaves (norms) untouched
        np.testing.assert_array_equal(
            np.asarray(lay["input_ln"]), np.asarray(orig["input_ln"])
        )
