"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.config import get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import LVLMBatch, init_lvlm_params, lvlm_forward
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.parallel import make_mesh, param_shardings, shard_batch, shard_params
from mimic_tpu.shift.params import init_shift_params


@pytest.fixture(scope="module")
def setup(eight_devices):
    tk = SimpleTokenizer()
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id,
    )
    cfg = cfg.replace(text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestSharding:
    def test_param_specs_shard_big_mats(self, setup, eight_devices):
        cfg, params = setup
        mesh = make_mesh(4, 2, eight_devices)
        specs = param_shardings(params, mesh)
        qspec = specs["lm"]["decoder"]["layers"]["q_proj"].spec
        assert qspec == jax.sharding.PartitionSpec(None, None, "model")
        ln = specs["lm"]["decoder"]["layers"]["input_ln"].spec
        assert ln == jax.sharding.PartitionSpec()

    def test_sharded_forward_matches_single(self, setup, eight_devices):
        cfg, params = setup
        rng = np.random.default_rng(0)
        ids = rng.integers(3, 250, size=(4, 16)).astype(np.int32)
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((4, 16), jnp.int32),
        )
        ref = lvlm_forward(params, cfg, batch).logits

        mesh = make_mesh(4, 2, eight_devices)
        with mesh:
            p = shard_params(params, mesh)
            b = jax.device_put(
                batch,
                LVLMBatch(
                    input_ids=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
                    attention_mask=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
                ),
            )
            out = jax.jit(lambda p_, b_: lvlm_forward(p_, cfg, b_).logits)(p, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_sharded_shift_forward(self, setup, eight_devices):
        cfg, params = setup
        enc, _ = get_preset("mimic")
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(1))
        rng = np.random.default_rng(0)
        ids = rng.integers(3, 250, size=(8, 16)).astype(np.int32)
        batch = LVLMBatch(
            input_ids=jnp.asarray(ids), attention_mask=jnp.ones((8, 16), jnp.int32)
        )
        ref = lvlm_forward(params, cfg, batch, shift=shift).logits
        mesh = make_mesh(8, 1, eight_devices)
        with mesh:
            p = shard_params(params, mesh)
            s = jax.device_put(shift, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
            b = shard_batch({"ids": batch.input_ids, "mask": batch.attention_mask}, mesh)
            out = jax.jit(
                lambda p_, s_, i_, m_: lvlm_forward(
                    p_, cfg, LVLMBatch(input_ids=i_, attention_mask=m_), shift=s_
                ).logits
            )(p, s, b["ids"], b["mask"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
