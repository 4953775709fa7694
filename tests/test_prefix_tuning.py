"""Prefix-tuning (shift/prefix.py) — the peft capability the reference factory
accepts (``src/utils.py:56-57``) but ships no config for.

Semantics oracle: a prefix whose k/v equal the model's OWN post-RoPE KV of a
real token block ``a`` must make ``forward(b, prefix)`` equal
``forward(concat(a, b))`` at b's positions — same keys, same values, same
(shifted) positions.  This pins the injected-past-key-values semantics (HF
peft PrefixTuning) without reimplementing attention in the test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.config import PrefixConfig, get_preset
from mimic_tpu.models.config import tiny_text
from mimic_tpu.models.decoder import init_kv_cache
from mimic_tpu.models.lm import init_lm_params
from mimic_tpu.models.lvlm import LVLMBatch, lvlm_forward
from mimic_tpu.models.generate import greedy_generate
from mimic_tpu.shift.prefix import init_prefix_params, prefix_forward_args


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_text(
        "text", vocab_size=128, hidden_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, intermediate_size=128,
    )
    params = {"lm": init_lm_params(cfg.text, jax.random.PRNGKey(0), dtype=jnp.float32)}
    return cfg, params


def _kv_of_block(cfg, params, ids):
    """Post-RoPE per-layer KV of a token block at positions 0..P-1 (via a
    prefill into an empty cache)."""
    B, P = ids.shape
    cache = init_kv_cache(cfg.text, B, P, jnp.float32)
    out = lvlm_forward(
        params, cfg,
        LVLMBatch(input_ids=ids, attention_mask=jnp.ones((B, P), jnp.int32)),
        kv_cache=cache, kv_total_len=P, cache_empty=True,
    )
    c = out.decoder.kv_cache
    return c["k"][:, 0], c["v"][:, 0]  # [L, P, Hkv, Dh]


def test_prefix_equals_concat_forward(setup):
    """forward(b | prefix=KV(a)) == forward(a ++ b) at b's positions."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    P, T = 8, 16
    a = jnp.asarray(rng.integers(3, 120, size=(1, P)), jnp.int32)
    b = jnp.asarray(rng.integers(3, 120, size=(1, T)), jnp.int32)

    pk, pv = _kv_of_block(cfg, params, a)
    prefix = {"k": pk, "v": pv}

    batch_b = LVLMBatch(input_ids=b, attention_mask=jnp.ones((1, T), jnp.int32))
    qb, pos, cache, total = prefix_forward_args(prefix, batch_b, jnp.float32)
    out_pref = lvlm_forward(
        params, cfg, qb, position_ids=pos, kv_cache=cache, kv_total_len=total
    )

    ab = jnp.concatenate([a, b], axis=1)
    out_ref = lvlm_forward(
        params, cfg,
        LVLMBatch(input_ids=ab, attention_mask=jnp.ones((1, P + T), jnp.int32)),
    )
    np.testing.assert_allclose(
        np.asarray(out_pref.logits[0]),
        np.asarray(out_ref.logits[0, P:]),
        rtol=2e-4, atol=2e-4,
    )


def test_prefix_equals_concat_generation(setup):
    """greedy(b | prefix=KV(a)) produces the same tokens as greedy(a ++ b)."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    P, T = 8, 12
    a = jnp.asarray(rng.integers(3, 120, size=(2, P)), jnp.int32)
    # same a-row for both batch rows: _kv_of_block uses row 0
    a = jnp.tile(a[:1], (2, 1))
    b = jnp.asarray(rng.integers(3, 120, size=(2, T)), jnp.int32)
    pk, pv = _kv_of_block(cfg, params, a[:1])
    prefix = {"k": pk, "v": pv}

    res_pref = greedy_generate(
        params, cfg,
        LVLMBatch(input_ids=b, attention_mask=jnp.ones((2, T), jnp.int32)),
        max_new_tokens=5, eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id, prefix=prefix,
    )
    res_ref = greedy_generate(
        params, cfg,
        LVLMBatch(
            input_ids=jnp.concatenate([a, b], axis=1),
            attention_mask=jnp.ones((2, P + T), jnp.int32),
        ),
        max_new_tokens=5, eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
    )
    assert (np.asarray(res_pref.tokens) == np.asarray(res_ref.tokens)).all()


def test_prefix_training_reduces_ce(setup):
    """LM-loss training of the prefix alone reduces CE on a fixed batch."""
    from mimic_tpu.train import TrainState, build_optimizer, make_train_step

    cfg, params = setup
    enc, peft = get_preset("prefix-tuning")
    prefix = init_prefix_params(
        PrefixConfig(num_virtual_tokens=8), cfg.text, jax.random.PRNGKey(3)
    )
    trainable = {"prefix": prefix}
    tx = build_optimizer(
        trainable, lr=5e-2, weight_decay=0.0, warmup_steps=0,
        total_steps=40, grad_clip=1.0,
    )
    step = make_train_step(
        cfg, enc, tx, ce_loss_weight=peft.ce_loss_weight,
        align_loss_weight=peft.align_loss_weight, donate=False,
    )
    rng = np.random.default_rng(0)
    B, T = 2, 24
    batch = {
        "query_ids": jnp.asarray(rng.integers(3, 120, size=(B, T)), jnp.int32),
        "query_mask": jnp.ones((B, T), jnp.int32),
    }
    state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
    first = None
    for _ in range(25):
        state, metrics = step(state, params, batch)
        if first is None:
            first = float(metrics["ce_loss"])
    last = float(metrics["ce_loss"])
    assert np.isfinite(last)
    assert last < first - 0.05, (first, last)
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda x, y: float(jnp.abs(x - y).sum()), trainable, state.trainable
        ),
    )
    assert moved > 0.0


def test_prefix_preset_and_init_trainable():
    from mimic_tpu.config import TrainConfig
    from mimic_tpu.pipeline.train_entry import init_trainable

    enc, peft = get_preset("prefix-tuning")
    cfg = TrainConfig()
    cfg.encoder, cfg.peft = enc, peft
    text_cfg = tiny_text("text", vocab_size=64, hidden_size=32, num_layers=2,
                         num_heads=2, num_kv_heads=2, intermediate_size=64).text
    tr = init_trainable(cfg, text_cfg, jax.random.PRNGKey(0))
    assert set(tr) == {"prefix"}
    assert tr["prefix"]["k"].shape == (2, 16, 2, text_cfg.head_size)


def test_eval_gate_accepts_prefix_only_runner(tmp_path):
    """run_eval's non-ICL trained-params gate must accept a runner carrying
    ONLY a prefix (no shift/LoRA) — found driving the prefix-tuning pipeline:
    the gate predates prefix and rejected it (pipeline/evaluate.py)."""
    from mimic_tpu.config import EvalConfig
    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.lvlm import init_lvlm_params
    from mimic_tpu.models.runner import LVLMRunner
    from mimic_tpu.models.tokenizer import SimpleTokenizer
    from mimic_tpu.pipeline.evaluate import run_eval
    from tests.test_eval_e2e import synthetic_vqa_splits

    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id, eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(text=cfg.text.__class__(
        **{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    runner = LVLMRunner(cfg, params, tk, pad_multiple=32)
    prefix = init_prefix_params(PrefixConfig(num_virtual_tokens=4), cfg.text,
                                jax.random.PRNGKey(1))
    runner.set_shift(None, prefix=prefix)

    ecfg = EvalConfig()
    ecfg.runname = "gate"
    ecfg.model_name = "tiny-idefics2"
    ecfg.ckpt_path = str(tmp_path / "epoch-0")  # non-ICL -> gate active
    ecfg.data.name = "vqav2"
    ecfg.data.num_query_samples = 2
    ecfg.data.num_shot = 1
    ecfg.batch_size = 2
    ecfg.iterations = 1
    out = run_eval(
        ecfg, runner, result_dir=str(tmp_path), splits=synthetic_vqa_splits()
    )
    assert out is not None
    records, eval_result = out
    assert "overall" in eval_result

    runner.set_shift(None)  # no trained params at all -> still rejected
    ecfg.resume = False
    with pytest.raises(ValueError, match="trained parameters"):
        run_eval(ecfg, runner, result_dir=str(tmp_path), splits=synthetic_vqa_splits())


def test_prefix_merge_path_matches_cached_attention(setup):
    """The round-4 prefix prefill (cacheless block + logsumexp-merged prefix,
    ``decoder.prefix_merge``) must reproduce the cached-attention path exactly
    and must actually be selected (ATTN_PATH_LOG '+prefix')."""
    from mimic_tpu.models import decoder as D

    cfg, params = setup
    prefix = init_prefix_params(
        PrefixConfig(num_virtual_tokens=4), cfg.text, jax.random.PRNGKey(7)
    )
    rng = np.random.default_rng(0)
    B, T = 2, 12
    ids = rng.integers(4, 120, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[0, :3] = 0  # left padding interacts with the merge mask slice
    batch = LVLMBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    pb, pos, cache, total = prefix_forward_args(
        prefix, batch, jnp.float32, extra_len=3
    )

    logits = {}
    for flag in (0, prefix["k"].shape[1]):
        D.ATTN_PATH_LOG.clear()
        out = lvlm_forward(
            params, cfg, pb,
            position_ids=pos,
            kv_cache=jax.tree.map(jnp.copy, cache),
            kv_total_len=total,
            prefix_flash_len=flag,
        )
        if flag:
            assert any(p.endswith("+prefix") for p in D.ATTN_PATH_LOG), D.ATTN_PATH_LOG
        else:
            assert not any(p.endswith("+prefix") for p in D.ATTN_PATH_LOG)
        logits[flag] = np.asarray(out.logits, np.float32)

    np.testing.assert_allclose(logits[4], logits[0], rtol=2e-4, atol=2e-4)
