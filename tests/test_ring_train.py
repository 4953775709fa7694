"""Ring attention threaded into the dual-pass MimIC train step.

Loss/update parity: the same long-record-context batch stepped (a) on one
device with XLA attention and (b) on an 8-virtual-device ('data','sp') mesh
with ``attn_impl="ring"`` (record-pass sequence sharded over 'sp') must give
the same loss and the same updated trainables.  This is the >32-shot
long-context path the reference lacks entirely (SURVEY §5: it manages context
down with batch 2 + ZeRO offload; here the sequence axis scales over ICI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mimic_tpu.config import get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.processor import LVLMProcessor
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.parallel import replicate, shard_batch
from mimic_tpu.shift.params import init_shift_params
from mimic_tpu.train import TrainCollator, TrainState, build_optimizer, make_train_step
from mimic_tpu.train.step import _to_device_batch


def _setup(n_demos=40):
    tk = SimpleTokenizer(padding_side="right")
    cfg = get_model_config("tiny-idefics2")
    cfg = cfg.replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
        text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}),
    )
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    proc = LVLMProcessor(cfg, tk)
    enc, peft = get_preset("mimic")
    shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
    trainable = {"shift": shift}
    tx = build_optimizer(
        trainable, lr=peft.lr, weight_decay=1e-3, warmup_steps=1, total_steps=10,
        grad_clip=1.0,
    )

    B = 2
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)
    demo = "Question: what color is the small object shown? Answer: blue\n"
    string_batch = {
        # >32 demonstrations -> a multi-thousand-token record sequence
        "prefix_texts": ["Image:<image> " + demo * n_demos] * B,
        "query_texts": ["Image:<image> Question: what is this? Answer:"] * B,
        "answers": ["a cat"] * B,
        "images": [[img, img] for _ in range(B)],
    }
    # pad_multiple 64 keeps the record length divisible by the 4-way sp axis
    collator = TrainCollator(proc, enc.strategy(), num_image_in_query=1, pad_multiple=64)
    batch = _to_device_batch(collator(string_batch))
    return cfg, params, enc, peft, tx, trainable, batch


class TestRingTrainStep:
    def test_ring_requires_mesh(self):
        cfg, params, enc, peft, tx, trainable, batch = _setup(n_demos=1)
        with pytest.raises(ValueError, match="ring_mesh"):
            make_train_step(
                cfg, enc, tx, ce_loss_weight=0.5, align_loss_weight=1.0,
                attn_impl="ring",
            )

    def test_ring_loss_and_update_parity(self, eight_devices):
        cfg, params, enc, peft, tx, trainable, batch = _setup()
        T_record = batch["full_ids"].shape[1]
        assert T_record >= 33 * 32, "record context must correspond to >32 shots"

        common = dict(
            ce_loss_weight=peft.ce_loss_weight,
            align_loss_weight=peft.align_loss_weight,
            donate=False,
        )
        state0 = lambda: TrainState(
            jax.tree.map(jnp.asarray, trainable), tx.init(trainable),
            jnp.zeros((), jnp.int32),
        )

        # single-device XLA reference
        step_ref = make_train_step(cfg, enc, tx, **common)
        ref_state, ref_metrics = step_ref(state0(), params, batch)

        # 8-device ('data','sp') mesh, record pass ringed over sp
        mesh = Mesh(
            np.asarray(eight_devices).reshape(2, 4), axis_names=("data", "sp")
        )
        step_ring = make_train_step(
            cfg, enc, tx, **common,
            attn_impl="ring", ring_mesh=mesh, ring_axis="sp",
            ring_batch_axis="data",
            # the short shift pass stays single-device; only the record pass
            # (> 1024 tokens here) rides the ring
            ring_min_len=1024,
        )
        with mesh:
            frozen = replicate(params, mesh)
            sbatch = shard_batch(batch, mesh)
            st = TrainState(
                replicate(state0().trainable, mesh),
                replicate(tx.init(trainable), mesh),
                jnp.zeros((), jnp.int32),
            )
            ring_state, ring_metrics = step_ring(st, frozen, sbatch)
            jax.block_until_ready(ring_metrics["loss"])

        np.testing.assert_allclose(
            float(ring_metrics["loss"]), float(ref_metrics["loss"]),
            rtol=2e-4, atol=1e-5,
        )
        for key in ref_metrics:
            np.testing.assert_allclose(
                float(ring_metrics[key]), float(ref_metrics[key]),
                rtol=5e-4, atol=1e-5, err_msg=key,
            )
        ref_leaves = jax.tree.leaves(ref_state.trainable)
        ring_leaves = jax.tree.leaves(ring_state.trainable)
        for a, b in zip(ref_leaves, ring_leaves):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
            )
