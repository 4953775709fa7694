"""CLI + text-only runner smoke tests."""

import json
import os

import jax
import numpy as np
import pytest

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import init_lvlm_params
from mimic_tpu.models.runner import LVLMRunner
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.pipeline.cli import main


class TestAnalyzeCLI:
    def test_analyze_runs(self, tmp_path, capsys):
        record_dir = tmp_path / "record" / "exp-tiny-vqav2-4-1shot"
        record_dir.mkdir(parents=True)
        with open(record_dir / "epoch-0.json", "w") as f:
            json.dump({"eval_result": {"overall": 42.0}}, f)
        main(["analyze", "exp", "--result-dir", str(tmp_path)])
        out = capsys.readouterr().out
        assert "exp-tiny-vqav2-4-1shot" in out and "42.000" in out

    def test_help(self, capsys):
        main([])
        assert "train" in capsys.readouterr().out

    def test_unknown_command_exits(self):
        with pytest.raises(SystemExit):
            main(["frobnicate"])


class TestTextOnlyModels:
    def test_config_registry(self):
        for name in ("mistral-7b", "qwen2-7b"):
            cfg = get_model_config(name)
            assert cfg.vision is None
            assert cfg.family == "text"

    def test_text_only_generate(self):
        tk = SimpleTokenizer(padding_side="left")
        cfg = get_model_config("tiny-idefics2").replace(
            image_token_id=tk.image_token_id,
            pad_token_id=tk.pad_token_id,
            bos_token_id=tk.bos_token_id,
            eos_token_id=tk.eos_token_id,
        )
        cfg = cfg.replace(
            family="text",
            vision=None,
            perceiver=None,
            image_seq_len=0,
            text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}),
        )
        params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        runner = LVLMRunner(cfg, params, tk, pad_multiple=16)
        out = runner.generate(None, ["Question: hello? Answer:"], num_beams=1, max_new_tokens=3)
        assert len(out) == 1 and isinstance(out[0], str)
        # ChatML template is used for conversations
        text = runner.apply_prompt_template(
            [{"role": "question", "content": [{"type": "text", "text": "hi"}]},
             {"role": "answer"}]
        )
        assert text.startswith("<|im_start|>question")


class TestLengthBuckets:
    def test_bucket_selection(self):
        tk = SimpleTokenizer(padding_side="left")
        cfg = get_model_config("tiny-idefics2").replace(
            image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id,
            bos_token_id=tk.bos_token_id, eos_token_id=tk.eos_token_id,
        )
        cfg = cfg.replace(
            family="text", vision=None, perceiver=None, image_seq_len=0,
            text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}),
        )
        params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        runner = LVLMRunner(cfg, params, tk, pad_multiple=16, length_buckets=(32, 64))
        captured = {}
        orig = runner.processor

        class Spy:
            def __call__(self, images, text, pad_to=None, **kw):
                # generate() probes first (pad_to=None), then pads to the bucket
                if pad_to is not None:
                    captured["pad_to"] = pad_to
                return orig(images, text, pad_to=pad_to, **kw)

        runner.processor = Spy()
        runner.generate(None, ["short text"], num_beams=1, max_new_tokens=2)
        assert captured["pad_to"] == 32
