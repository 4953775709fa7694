"""End-to-end dual-pass training-step tests on a tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.config import Strategy, get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.processor import LVLMProcessor
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.shift.lora import init_lora_params
from mimic_tpu.shift.params import init_shift_params
from mimic_tpu.train import TrainCollator, TrainState, build_optimizer, make_train_step
from mimic_tpu.train.step import _to_device_batch


@pytest.fixture(scope="module")
def setup():
    tk = SimpleTokenizer(padding_side="right")
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
    frozen = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    proc = LVLMProcessor(cfg, tk)
    return cfg, frozen, proc, tk


def string_batch(n=2, with_images=True):
    rng = np.random.default_rng(0)
    imgs = lambda k: [rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8) for _ in range(k)]
    return {
        "prefix_texts": [
            "Image:<image> Question: what is this? Answer: a cat\n",
            "Image:<image> Question: how many? Answer: two\n",
        ][:n],
        "query_texts": [
            "Image:<image> Question: what now? Answer:",
            "Image:<image> Question: who? Answer:",
        ][:n],
        "answers": ["a dog", "three"][:n],
        "images": [imgs(2), imgs(2)][:n] if with_images else [[] for _ in range(n)],
    }


def make_state_and_step(cfg, frozen, preset_name, trainable, total_steps=20, accum=1):
    enc, peft = get_preset(preset_name)
    tx = build_optimizer(
        trainable,
        lr=peft.lr, weight_decay=1e-3, warmup_steps=2, total_steps=total_steps,
        grad_clip=1.0, scale_lr=peft.scale_lr, accumulate_steps=accum,
    )
    lora_scaling = peft.lora.scaling() if peft.lora else 1.0
    step = make_train_step(
        cfg, enc, tx,
        ce_loss_weight=peft.ce_loss_weight,
        align_loss_weight=peft.align_loss_weight,
        lora_scaling=lora_scaling,
        donate=False,
    )
    state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
    return state, step, enc


class TestMimicStep:
    def test_loss_decreases(self, setup):
        cfg, frozen, proc, tk = setup
        enc, peft = get_preset("mimic")
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
        trainable = {"shift": shift}
        state, step, enc = make_state_and_step(cfg, frozen, "mimic", trainable)
        collator = TrainCollator(proc, enc.strategy(), num_image_in_query=1)
        batch = _to_device_batch(collator(string_batch()))
        losses = []
        for _ in range(8):
            state, metrics = step(state, frozen, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert "ce_loss" in metrics and "ffn_mse_loss" in metrics

    def test_shift_params_update_and_frozen_untouched(self, setup):
        cfg, frozen, proc, tk = setup
        enc, _ = get_preset("mimic")
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
        state, step, enc = make_state_and_step(cfg, frozen, "mimic", {"shift": shift})
        collator = TrainCollator(proc, enc.strategy())
        batch = _to_device_batch(collator(string_batch()))
        # warmup starts at lr=0 (HF cosine-with-warmup parity), so step twice
        mid_state, _ = step(state, frozen, batch)
        new_state, _ = step(mid_state, frozen, batch)
        changed = jax.tree.map(
            lambda a, b: not np.allclose(a, b), state.trainable, new_state.trainable
        )
        assert all(jax.tree.leaves(changed)), "all shift leaves should update"


class TestLoRAStep:
    def test_lm_loss_only(self, setup):
        cfg, frozen, proc, tk = setup
        enc, peft = get_preset("lora")
        lora = init_lora_params(peft.lora, cfg.text, jax.random.PRNGKey(2))
        state, step, enc = make_state_and_step(cfg, frozen, "lora", {"lora": lora})
        collator = TrainCollator(proc, enc.strategy())
        tb = collator(string_batch())
        # LM_LOSS-only: no record pass materialized (reference :213-214)
        assert tb.full_ids is None
        batch = _to_device_batch(tb)
        losses = []
        for _ in range(6):
            state, metrics = step(state, frozen, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        # B matrices start at zero and must move
        assert not np.allclose(np.asarray(state.trainable["lora"]["q_b"]), 0.0)


class TestLIVEStep:
    def test_kl_strategy(self, setup):
        cfg, frozen, proc, tk = setup
        enc, peft = get_preset("licv")
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(3))
        assert "ffn_scale" in shift
        state, step, enc = make_state_and_step(cfg, frozen, "licv", {"shift": shift})
        collator = TrainCollator(proc, enc.strategy())
        tb = collator(string_batch())
        assert tb.query_ans_idx is not None
        batch = _to_device_batch(tb)
        losses = []
        for _ in range(6):
            state, metrics = step(state, frozen, batch)
            losses.append(float(metrics["loss"]))
        assert "logits_kl_loss" in metrics
        assert losses[-1] < losses[0]


class TestCollator:
    def test_gather_counts_match(self, setup):
        cfg, frozen, proc, tk = setup
        enc, _ = get_preset("mimic")
        collator = TrainCollator(proc, enc.strategy())
        tb = collator(string_batch())
        # query tokens in record pass == real non-bos tokens in shift pass
        assert tb.q_valid.sum() > 0
        assert tb.full_ids.shape[0] == 2
        # query pass keeps only the last image (num_image_in_query=1)
        assert tb.query_pixels.shape[1] == 1
        assert tb.full_pixels.shape[1] == 2

    def test_pad_separator_masked(self, setup):
        cfg, frozen, proc, tk = setup
        enc, _ = get_preset("mimic")
        collator = TrainCollator(proc, enc.strategy())
        tb = collator(string_batch())
        # the injected [PAD] separators must be masked out of attention
        pad_positions = tb.query_ids == tk.pad_token_id
        assert (tb.query_mask[pad_positions] == 0).all()


class TestLoRADropout:
    def test_dropout_changes_loss_across_steps(self, setup):
        cfg, frozen, proc, tk = setup
        import optax
        from mimic_tpu.train import make_train_step
        enc, peft = get_preset("lora")
        lora = init_lora_params(peft.lora, cfg.text, jax.random.PRNGKey(2))
        # nonzero B so the adapter path actually contributes
        lora = {k: (jnp.ones_like(v) * 0.05 if k.endswith("_b") else v) for k, v in lora.items()}
        tx = optax.sgd(0.0)  # frozen optimizer: loss differences come from dropout only
        step = make_train_step(
            cfg, enc, tx, ce_loss_weight=1.0, align_loss_weight=0.0,
            lora_scaling=peft.lora.scaling(), lora_dropout=0.5, donate=False,
        )
        collator = TrainCollator(proc, enc.strategy())
        batch = _to_device_batch(collator(string_batch()))
        state = TrainState({"lora": lora}, tx.init({"lora": lora}), jnp.zeros((), jnp.int32))
        s1, m1 = step(state, frozen, batch)
        s2, m2 = step(s1, frozen, batch)  # step counter advanced → new dropout mask
        assert float(m1["loss"]) != float(m2["loss"])

    def test_no_dropout_deterministic(self, setup):
        cfg, frozen, proc, tk = setup
        import optax
        from mimic_tpu.train import make_train_step
        enc, peft = get_preset("lora")
        lora = init_lora_params(peft.lora, cfg.text, jax.random.PRNGKey(2))
        tx = optax.sgd(0.0)
        step = make_train_step(
            cfg, enc, tx, ce_loss_weight=1.0, align_loss_weight=0.0,
            lora_scaling=peft.lora.scaling(), lora_dropout=0.0, donate=False,
        )
        collator = TrainCollator(proc, enc.strategy())
        batch = _to_device_batch(collator(string_batch()))
        state = TrainState({"lora": lora}, tx.init({"lora": lora}), jnp.zeros((), jnp.int32))
        s1, m1 = step(state, frozen, batch)
        s2, m2 = step(s1, frozen, batch)
        assert float(m1["loss"]) == float(m2["loss"])


def test_lora_step_with_bf16_frozen_params(setup):
    """fp32 LoRA adapters over a bf16 frozen tower: the low-rank delta must
    re-enter the activation dtype or the layer-scan carry dtype breaks
    (regression: bf16[...] carry vs f32[...] output TypeError)."""
    cfg, _, proc, tk = setup
    frozen16 = init_lvlm_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    enc, peft = get_preset("lora")
    lora = init_lora_params(peft.lora, cfg.text, jax.random.PRNGKey(2))
    state, step, enc = make_state_and_step(cfg, frozen16, "lora", {"lora": lora})
    collator = TrainCollator(proc, enc.strategy())
    batch = _to_device_batch(collator(string_batch()))
    state, metrics = step(state, frozen16, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_merge_lora_matches_adapter_forward(setup):
    """Folding LoRA into the weights (serving path) reproduces the adapter
    forward exactly (peft merge_and_unload analog)."""
    from mimic_tpu.models.lvlm import lvlm_forward
    from mimic_tpu.shift.lora import merge_lora

    cfg, frozen, proc, tk = setup
    enc, peft = get_preset("lora")
    lora = init_lora_params(peft.lora, cfg.text, jax.random.PRNGKey(5))
    # B starts at zero (merge would be a no-op); give it real values
    lora = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(6), p.shape), lora
    )
    scaling = peft.lora.scaling()

    collator = TrainCollator(proc, enc.strategy())
    batch = _to_device_batch(collator(string_batch()))
    from mimic_tpu.train.step import _query_lvlm_batch

    with_adapters = lvlm_forward(
        frozen, cfg, _query_lvlm_batch(batch), adapters=lora, lora_scaling=scaling
    ).logits
    merged = merge_lora(frozen, lora, scaling)
    with_merged = lvlm_forward(merged, cfg, _query_lvlm_batch(batch)).logits
    np.testing.assert_allclose(
        np.asarray(with_merged), np.asarray(with_adapters), rtol=2e-5, atol=2e-5
    )
    # original params untouched
    np.testing.assert_array_equal(
        np.asarray(frozen["lm"]["decoder"]["layers"]["q_proj"]),
        np.asarray(jax.tree.leaves({"q": frozen["lm"]["decoder"]["layers"]["q_proj"]})[0]),
    )


def test_mimic_train_step_idefics1_family():
    """Dual-pass MimIC step on the idefics1 architecture: per-layer captures must
    flow through the GROUPED cross-attention scan (ys concatenated across groups)
    and the loss must be finite and decrease."""
    from mimic_tpu.models.config import get_model_config

    tk = SimpleTokenizer(padding_side="right")
    cfg = get_model_config("tiny-idefics1").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
    frozen = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    proc = LVLMProcessor(cfg, tk)

    enc, peft = get_preset("mimic")
    shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
    state, step, enc = make_state_and_step(cfg, frozen, "mimic", {"shift": shift})
    collator = TrainCollator(proc, enc.strategy(), num_image_in_query=1)
    batch = _to_device_batch(collator(string_batch()))
    losses = []
    for _ in range(8):
        state, metrics = step(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
