"""End-to-end pipeline test: train → checkpoint → eval → analyze on a tiny model
with synthetic data (the full reference workflow, src/pipeline.py analog)."""

import json
import os

import jax
import numpy as np
import pytest

from mimic_tpu.config import DataConfig, TrainConfig, get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.runner import LVLMRunner
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.pipeline.analyze import analyze, sort_runname_key
from mimic_tpu.pipeline.runner import PipelineSpec, run_pipeline, task_grid
from tests.test_eval_e2e import synthetic_vqa_splits


@pytest.fixture(scope="module")
def runner():
    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    return LVLMRunner(cfg, params, tk, pad_multiple=32)


class TestTaskGrid:
    def test_grid_product(self):
        spec = PipelineSpec(
            runname="x", model_name="m", datasets=["vqav2", "coco"],
            num_query_samples=[100], num_shots=[8, 16],
        )
        assert len(task_grid(spec)) == 4

    def test_sort_runname_key(self):
        names = ["epoch-10", "epoch-2", "epoch-1"]
        assert sorted(names, key=sort_runname_key) == ["epoch-1", "epoch-2", "epoch-10"]


class TestFullPipeline:
    def test_train_eval_analyze(self, runner, tmp_path, capsys):
        spec = PipelineSpec(
            runname="pipetest",
            model_name="tiny-idefics2",
            preset="mimic",
            datasets=["vqav2"],
            num_query_samples=[4],
            num_shots=[1],
            train_overrides={
                "epochs": 1,
                "batch_size": 2,
                "accumulate_grad_batches": 1,
            },
            eval_overrides={
                "batch_size": 2,
                "iterations": 1,
            },
        )
        # save_when for unknown tiny model defaults to True → epoch-0 saved
        splits = synthetic_vqa_splits()
        summary = run_pipeline(
            spec, result_dir=str(tmp_path), runner=runner, splits=splits
        )
        assert summary["trained"] == ["pipetest-tiny-idefics2-vqav2-4-1shot"]
        run_dir = tmp_path / "ckpt" / "pipetest-tiny-idefics2-vqav2-4-1shot"
        assert (run_dir / "epoch-0" / "encoder.msgpack").exists()
        assert (run_dir / "config.json").exists()
        assert len(summary["evaluated"]) == 1
        record = json.load(open(summary["evaluated"][0]))
        assert "overall" in record["eval_result"]
        # analyze found the run
        assert "pipetest-tiny-idefics2-vqav2-4-1shot" in summary["analyzed"]
        top = summary["analyzed"]["pipetest-tiny-idefics2-vqav2-4-1shot"]
        assert top and top[0][0] == "epoch-0"
        # runner's shift params were loaded from the checkpoint
        assert runner.shift is not None

    def test_resume_skips_everything(self, runner, tmp_path):
        spec = PipelineSpec(
            runname="pipetest2",
            model_name="tiny-idefics2",
            preset="mimic",
            datasets=["vqav2"],
            num_query_samples=[4],
            num_shots=[1],
            train_overrides={"epochs": 1, "batch_size": 2, "accumulate_grad_batches": 1},
            eval_overrides={"batch_size": 2, "iterations": 1},
        )
        splits = synthetic_vqa_splits()
        run_pipeline(spec, result_dir=str(tmp_path), runner=runner, splits=splits)
        second = run_pipeline(spec, result_dir=str(tmp_path), runner=runner, splits=splits)
        # eval records exist → nothing re-evaluated
        assert second["evaluated"] == []


class TestLoraPipeline:
    def test_lora_eval_merges_adapters(self, runner, tmp_path):
        """LoRA checkpoints fold into the weights at eval load (merge path) and
        repeated checkpoint loads stay idempotent (merge always from the base)."""
        import numpy as np

        spec = PipelineSpec(
            runname="lorapipe",
            model_name="tiny-idefics2",
            preset="lora",
            datasets=["vqav2"],
            num_query_samples=[4],
            num_shots=[1],
            train_overrides={"epochs": 1, "batch_size": 2, "accumulate_grad_batches": 1},
            eval_overrides={"batch_size": 2, "iterations": 1},
        )
        base_q = np.asarray(runner.params["lm"]["decoder"]["layers"]["q_proj"])
        summary = run_pipeline(
            spec, result_dir=str(tmp_path), runner=runner, splits=synthetic_vqa_splits()
        )
        assert len(summary["evaluated"]) == 1
        # adapters were merged: runner carries no live adapters, weights changed
        assert runner.adapters is None
        merged_q = np.asarray(runner.params["lm"]["decoder"]["layers"]["q_proj"])
        assert not np.array_equal(merged_q, base_q)
        # pristine base retained for subsequent checkpoint loads
        np.testing.assert_array_equal(
            np.asarray(runner._unmerged_params["lm"]["decoder"]["layers"]["q_proj"]),
            base_q,
        )
