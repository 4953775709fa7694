"""Full training run under a device mesh (train_entry use_mesh path)."""

import jax
import numpy as np
import pytest

from mimic_tpu.config import TrainConfig, get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.runner import LVLMRunner
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.pipeline.train_entry import run_train
from tests.test_eval_e2e import synthetic_vqa_splits


class TestMeshTraining:
    def test_run_train_on_mesh(self, tmp_path, eight_devices):
        tk = SimpleTokenizer(padding_side="right")
        mcfg = get_model_config("tiny-idefics2").replace(
            image_token_id=tk.image_token_id,
            pad_token_id=tk.pad_token_id,
            bos_token_id=tk.bos_token_id,
            eos_token_id=tk.eos_token_id,
        )
        mcfg = mcfg.replace(
            text=mcfg.text.__class__(**{**mcfg.text.__dict__, "vocab_size": tk.vocab_size})
        )
        params = init_lvlm_params(mcfg, jax.random.PRNGKey(0))
        runner = LVLMRunner(mcfg, params, tk, pad_multiple=32)

        enc, peft = get_preset("mimic")
        cfg = TrainConfig(
            runname="meshtest", model_name="tiny-idefics2",
            encoder=enc, peft=peft,
            epochs=1, batch_size=4, accumulate_grad_batches=1,
        )
        cfg.mesh.data_axis = 4
        cfg.mesh.model_axis = 2
        cfg.data.name = "vqav2"
        cfg.data.num_query_samples = 4
        cfg.data.num_shot = 1

        state = run_train(
            cfg, result_dir=str(tmp_path), runner=runner,
            splits=synthetic_vqa_splits(), use_mesh=True,
        )
        assert int(state.step) > 0
        assert np.isfinite(np.asarray(jax.tree.leaves(state.trainable)[0])).all()
        run_dir = tmp_path / "ckpt" / "meshtest-tiny-idefics2-vqav2-4-1shot"
        assert (run_dir / "epoch-0").exists()
