"""Method-level validation: training the MimIC shift makes the query-only pass
measurably closer to the in-context (record) pass — the property the whole
framework exists to deliver (reference paper §3.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.config import get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.processor import LVLMProcessor
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.shift.params import init_shift_params
from mimic_tpu.train import TrainCollator, TrainState, build_optimizer, make_train_step
from mimic_tpu.train.step import _to_device_batch, compute_loss


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


def batch_of_strings():
    rng = np.random.default_rng(3)
    img = lambda: rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)
    return {
        "prefix_texts": [
            "Image:<image> Question: color? Answer: red\nImage:<image> Question: color? Answer: red\n",
            "Image:<image> Question: count? Answer: two\nImage:<image> Question: count? Answer: two\n",
        ],
        "query_texts": [
            "Image:<image> Question: color? Answer:",
            "Image:<image> Question: count? Answer:",
        ],
        "answers": ["red", "two"],
        "images": [[img(), img(), img()], [img(), img(), img()]],
    }


def alignment_metrics(cfg, frozen, trainable, batch, enc, peft):
    """Recompute the layer-wise alignment loss for a given trainable state."""
    _, metrics = compute_loss(
        trainable, frozen, batch,
        cfg=cfg, strategy=enc.strategy(),
        rec_attn=True, rec_ffn=False, mh=True,
        ce_loss_weight=peft.ce_loss_weight,
        align_loss_weight=peft.align_loss_weight,
        lora_scaling=1.0, logz2="unmasked",
    )
    return {k: float(v) for k, v in metrics.items()}


class TestMimicConvergence:
    def test_shift_closes_gap_to_record_pass(self, setup):
        # mimic_attn_mse records the attention outputs — where the shift acts
        # directly — so the gap-closing effect is observable on a tiny model
        cfg, frozen, proc, tk = setup
        enc, peft = get_preset("mimic_attn_mse")
        # isolate the alignment objective (no CE) so gap-closing is measurable in
        # few steps on a tiny random model
        enc.model_strategy = "Strategy.LAYER_WISE_MSE"
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
        trainable = {"shift": shift}
        tx = build_optimizer(
            trainable, lr=2e-2, weight_decay=0.0, warmup_steps=2, total_steps=100,
            grad_clip=1.0,
        )
        step = make_train_step(
            cfg, enc, tx, ce_loss_weight=0.0, align_loss_weight=1.0, donate=False,
        )
        collator = TrainCollator(proc, enc.strategy(), num_image_in_query=1)
        batch = _to_device_batch(collator(batch_of_strings()))

        before = alignment_metrics(cfg, frozen, trainable, batch, enc, peft)
        state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
        for _ in range(80):
            state, metrics = step(state, frozen, batch)
        after = alignment_metrics(cfg, frozen, state.trainable, batch, enc, peft)

        # the trained shift must substantially close the hidden-state gap between
        # the query-only pass and the in-context record pass
        assert after["attn_mse_loss"] < 0.7 * before["attn_mse_loss"], (before, after)

    def test_zero_shift_matches_unshifted(self, setup):
        """With all-zero shift vectors, shifted and unshifted passes coincide —
        the alignment loss measures exactly the ICL gap."""
        cfg, frozen, proc, tk = setup
        enc, peft = get_preset("mimic_attn_mse")
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
        zero_shift = jax.tree.map(jnp.zeros_like, shift)
        collator = TrainCollator(proc, enc.strategy(), num_image_in_query=1)
        batch = _to_device_batch(collator(batch_of_strings()))
        m_zero = alignment_metrics(cfg, frozen, {"shift": zero_shift}, batch, enc, peft)
        # v=0 ⇒ μ·v = 0 ⇒ identical to no shift at all
        from mimic_tpu.models.lvlm import lvlm_forward
        from mimic_tpu.train.step import _query_lvlm_batch

        plain = lvlm_forward(frozen, cfg, _query_lvlm_batch(batch)).logits
        shifted = lvlm_forward(
            frozen, cfg, _query_lvlm_batch(batch), shift=zero_shift
        ).logits
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(shifted), rtol=1e-5, atol=1e-5
        )
        assert m_zero["attn_mse_loss"] > 0  # a real ICL gap exists to close

    def test_trained_shift_moves_logits_toward_prompted(self, setup):
        """The end claim (paper §3.2): after training, the shifted QUERY-ONLY
        pass's answer-position distributions are closer to the PROMPTED pass's
        than the unshifted ones are (measured by the reference KL)."""
        cfg, frozen, proc, tk = setup
        enc, peft = get_preset("mimic_attn_mse")
        enc.model_strategy = "Strategy.LAYER_WISE_MSE"
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
        trainable = {"shift": shift}
        tx = build_optimizer(
            trainable, lr=2e-2, weight_decay=0.0, warmup_steps=2, total_steps=100,
            grad_clip=1.0,
        )
        step = make_train_step(
            cfg, enc, tx, ce_loss_weight=0.0, align_loss_weight=1.0, donate=False,
        )
        collator = TrainCollator(proc, enc.strategy(), num_image_in_query=1)
        batch = _to_device_batch(collator(batch_of_strings()))
        state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
        for _ in range(80):
            state, _ = step(state, frozen, batch)

        # a KL-bearing strategy makes the collator emit answer-position gathers
        from mimic_tpu.config.flags import parse_strategy
        from mimic_tpu.models.lvlm import lvlm_forward
        from mimic_tpu.train.losses import logits_kl
        from mimic_tpu.train.step import _full_lvlm_batch, _query_lvlm_batch

        kl_strat = parse_strategy("Strategy.LOGITS_KL_DIV | Strategy.LM_LOSS")
        col_kl = TrainCollator(proc, kl_strat, num_image_in_query=1)
        b = _to_device_batch(col_kl(batch_of_strings()))

        prompted = lvlm_forward(frozen, cfg, _full_lvlm_batch(b)).logits
        plain = lvlm_forward(frozen, cfg, _query_lvlm_batch(b)).logits
        shifted = lvlm_forward(
            frozen, cfg, _query_lvlm_batch(b), shift=state.trainable["shift"]
        ).logits

        def kl(q):
            return float(logits_kl(
                q, prompted, b["query_ans_idx"], b["prefix_ans_idx"], b["ans_valid"]
            ))

        assert kl(shifted) < kl(plain), (kl(shifted), kl(plain))
