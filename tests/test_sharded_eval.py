"""Host-sharded evaluation within one task.

The reference farms whole (dataset, shot, epoch) tasks to GPUs
(``src/pipeline.py:169-227``) but a single task is single-device; here one
task's query set shards across hosts (``run_eval(shard=(rank, R))``) and rank 0
merges records + metric rows — results must be identical to a single-host run.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mimic_tpu.config import DataConfig, EvalConfig
from mimic_tpu.data.adapters import build_adapter
from tests.test_eval_e2e import synthetic_vqa_splits


class TestShardedDataloader:
    def test_shards_cover_single_host_contexts(self):
        """Union of per-rank contexts == single-host contexts, with the demo
        blocks each query would have received on a single host."""
        def contexts(rank, num_replicas, num_shot=2):
            dcfg = DataConfig(name="vqav2", num_query_samples=6, num_shot=num_shot, seed=3407)
            splits = synthetic_vqa_splits(n_train=8, n_val=6)
            ad = build_adapter(dcfg, splits=splits)
            if num_replicas > 1:
                ad.set_eval_shard(rank, num_replicas)
            out = []
            for batch in ad.validation_dataloader(batch_size=1):
                for ctx in batch:
                    demos = [it["question_id"] for it in ctx[:-1]]
                    out.append((demos, ctx[-1]["question_id"]))
            return out

        single = contexts(0, 1)
        r0, r1 = contexts(0, 2), contexts(1, 2)
        assert len(single) == 6 and len(r0) == 3 and len(r1) == 3
        # rank r holds queries r, r+2, r+4 with the SAME demos as single-host
        assert r0 == [single[0], single[2], single[4]]
        assert r1 == [single[1], single[3], single[5]]

    def test_zero_shot_sharding(self):
        dcfg = DataConfig(name="vqav2", num_query_samples=5, num_shot=0, seed=3407)
        dcfg.is_icl = True
        splits = synthetic_vqa_splits(n_train=8, n_val=6)
        qids = []
        for rank in range(2):
            ad = build_adapter(dcfg, splits=splits)
            ad.set_eval_shard(rank, 2)
            for batch in ad.validation_dataloader(batch_size=1):
                qids += [ctx[-1]["question_id"] for ctx in batch]
        ad_all = build_adapter(dcfg, splits=splits)
        all_qids = [
            ctx[-1]["question_id"]
            for batch in ad_all.validation_dataloader(batch_size=1)
            for ctx in batch
        ]
        assert sorted(qids) == sorted(all_qids)


_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from tests.test_eval_e2e import synthetic_vqa_splits
from tests.test_sharded_eval import _make_runner, _make_eval_cfg
from mimic_tpu.pipeline.evaluate import run_eval

rank = int(sys.argv[1])
cfg = _make_eval_cfg()
runner = _make_runner()
out = run_eval(
    cfg, runner, result_dir=sys.argv[2], splits=synthetic_vqa_splits(),
    shard=(rank, 2), shard_merge_timeout=600.0,
)
print("RANK", rank, "DONE", out is None)
"""


def _make_runner():
    import jax

    from mimic_tpu.models.config import get_model_config
    from mimic_tpu.models.lvlm import init_lvlm_params
    from mimic_tpu.models.runner import LVLMRunner
    from mimic_tpu.models.tokenizer import SimpleTokenizer

    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(
        text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size})
    )
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    return LVLMRunner(cfg, params, tk, pad_multiple=32)


def _make_eval_cfg():
    cfg = EvalConfig(model_name="tiny-idefics2", batch_size=1, iterations=None)
    cfg.data = DataConfig(name="vqav2", num_query_samples=4, num_shot=1, seed=3407)
    cfg.generation.num_beams = 1
    cfg.generation.max_new_tokens = 4
    return cfg


class TestTwoProcessEval:
    @pytest.mark.slow
    def test_two_process_eval_matches_single_host(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sharded_dir = str(tmp_path / "sharded")
        single_dir = str(tmp_path / "single")

        env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
        env.pop("XLA_FLAGS", None)
        script = _WORKER.format(repo=repo)
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script, str(rank), sharded_dir],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for rank in range(2)
        ]
        for p in procs:
            out, _ = p.communicate(timeout=900)
            assert p.returncode == 0, out.decode()

        # single-host reference, in-process
        cfg = _make_eval_cfg()
        result = run_single = None
        from mimic_tpu.pipeline.evaluate import record_path, run_eval

        runner = _make_runner()
        run_single = run_eval(
            cfg, runner, result_dir=single_dir, splits=synthetic_vqa_splits(),
            shard=(0, 1),
        )
        assert run_single is not None
        single_records, single_metrics = run_single

        merged = json.load(open(record_path(cfg, sharded_dir)))
        assert merged["eval_result"] == single_metrics
        assert [r["question_id"] for r in merged["records"]] == [
            r["question_id"] for r in single_records
        ]
        assert [r["prediction"] for r in merged["records"]] == [
            r["prediction"] for r in single_records
        ]
        # no stray part files left behind
        rec_dir = os.path.dirname(record_path(cfg, sharded_dir))
        assert not [f for f in os.listdir(rec_dir) if ".part-" in f]
