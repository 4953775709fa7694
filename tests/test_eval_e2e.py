"""End-to-end ICL evaluation on a synthetic VQA dataset with a tiny model —
the minimum E2E slice (mirrors run_icl.sh / BASELINE config 1)."""

import json
import os

import jax
import numpy as np
import pytest

from mimic_tpu.config import DataConfig, EvalConfig, get_preset
from mimic_tpu.data.adapters import build_adapter
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.runner import LVLMRunner
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.pipeline.evaluate import record_path, run_eval
from mimic_tpu.shift.params import init_shift_params


def synthetic_vqa_splits(n_train=8, n_val=6):
    rng = np.random.default_rng(7)

    def item(i, split):
        return {
            "question": f"what color is object {i}?",
            "question_id": i if split == "train" else 1000 + i,
            "question_type": "what color is",
            "answer_type": "other",
            "answers": [{"answer": "red", "answer_confidence": "yes", "answer_id": j} for j in range(10)],
            "answer": "red",
            "image": rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8),
            "image_id": i,
        }

    return {
        "train": [item(i, "train") for i in range(n_train)],
        "validation": [item(i, "val") for i in range(n_val)],
    }


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


def make_cfg(num_shot=1, **kw):
    cfg = EvalConfig(model_name="tiny-idefics2", batch_size=2, iterations=2)
    cfg.data = DataConfig(
        name="vqav2", num_query_samples=4, num_shot=num_shot, seed=3407
    )
    cfg.generation.num_beams = 1
    cfg.generation.max_new_tokens = 4
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestICLEval:
    def test_icl_eval_end_to_end(self, runner, tmp_path):
        cfg = make_cfg()
        result = run_eval(cfg, runner, result_dir=str(tmp_path), splits=synthetic_vqa_splits())
        assert result is not None
        records, metrics = result
        assert "overall" in metrics
        assert 0.0 <= metrics["overall"] <= 100.0
        assert len(records) == 4  # 2 iterations × batch 2
        for r in records:
            assert {"question_id", "raw_output", "prediction", "answers"} <= set(r)
        # record file exists with the reference layout
        path = record_path(cfg, str(tmp_path))
        assert path.endswith("1shot.json")
        payload = json.load(open(path))
        assert payload["eval_result"]["overall"] == metrics["overall"]

    def test_resume_skip(self, runner, tmp_path):
        cfg = make_cfg()
        first = run_eval(cfg, runner, result_dir=str(tmp_path), splits=synthetic_vqa_splits())
        assert first is not None
        again = run_eval(cfg, runner, result_dir=str(tmp_path), splits=synthetic_vqa_splits())
        assert again is None  # resume-skip (eval.py:43-46)

    def test_shifted_eval(self, runner, tmp_path):
        # MimIC-style eval: shifts active during generation (epoch record path)
        enc, _ = get_preset("mimic")
        shift = init_shift_params(enc, runner.cfg.text, jax.random.PRNGKey(3))
        runner.set_shift(shift)
        try:
            cfg = make_cfg(ckpt_path=str(tmp_path / "ckpt" / "run-x" / "epoch-0"))
            result = run_eval(cfg, runner, result_dir=str(tmp_path), splits=synthetic_vqa_splits())
            assert result is not None
            path = record_path(cfg, str(tmp_path))
            assert path.endswith("epoch-0.json") and os.path.exists(path)
        finally:
            runner.set_shift(None)

    def test_zero_shot(self, runner, tmp_path):
        cfg = make_cfg(num_shot=0)
        result = run_eval(cfg, runner, result_dir=str(tmp_path), splits=synthetic_vqa_splits())
        assert result is not None
