"""Model-parallel generation on the 8-device CPU mesh: the frozen tower sharded
over the 'model' axis (how 8-9B checkpoints fit v5e hosts), batch over 'data'."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.generate import greedy_generate
from mimic_tpu.models.lvlm import LVLMBatch, init_lvlm_params
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.parallel import make_mesh, shard_params


@pytest.fixture(scope="module")
def setup():
    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    return cfg, params, tk


def make_batch(tk, B=4, T=16):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=(B, T)).astype(np.int32)
    return LVLMBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((B, T), jnp.int32)
    )


class TestShardedGeneration:
    def test_model_parallel_greedy_matches_single(self, setup, eight_devices):
        cfg, params, tk = setup
        batch = make_batch(tk)
        ref = greedy_generate(
            params, cfg, batch, max_new_tokens=4,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        mesh = make_mesh(2, 4, eight_devices)  # 2-way data, 4-way tensor parallel
        with mesh:
            p = shard_params(params, mesh)
            b = jax.device_put(
                batch,
                LVLMBatch(
                    input_ids=NamedSharding(mesh, P("data")),
                    attention_mask=NamedSharding(mesh, P("data")),
                ),
            )
            out = greedy_generate(
                p, cfg, b, max_new_tokens=4,
                eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
            )
        np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))

    def test_model_parallel_beam_matches_single(self, setup, eight_devices):
        """Beam search under tp+dp: exercises the beam-shared prompt cache
        (prompt region at batch B, generated region at B·K) with sharded
        weights — the B→B·K query-group fold must compose with the mesh."""
        cfg, params, tk = setup
        batch = make_batch(tk)
        from mimic_tpu.models.generate import beam_generate

        ref = beam_generate(
            params, cfg, batch, max_new_tokens=4, num_beams=3,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        mesh = make_mesh(2, 4, eight_devices)
        with mesh:
            p = shard_params(params, mesh)
            b = jax.device_put(
                batch,
                LVLMBatch(
                    input_ids=NamedSharding(mesh, P("data")),
                    attention_mask=NamedSharding(mesh, P("data")),
                ),
            )
            out = beam_generate(
                p, cfg, b, max_new_tokens=4, num_beams=3,
                eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
            )
        np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
        np.testing.assert_allclose(
            np.asarray(out.scores), np.asarray(ref.scores), rtol=1e-5, atol=1e-5
        )
