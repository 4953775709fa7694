"""End-to-end eval over the remaining adapters (caption/mme/seed/hateful) with
synthetic data and the tiny runner."""

import numpy as np
import pytest

from mimic_tpu.config import DataConfig, EvalConfig
from mimic_tpu.pipeline.evaluate import run_eval
from tests.test_eval_e2e import runner  # fixture reuse  # noqa: F401


def rand_img(i):
    return np.random.default_rng(i).integers(0, 255, size=(28, 28, 3)).astype(np.uint8)


def caption_splits(n_train=6, n_val=4):
    def item(i):
        return {
            "image": rand_img(i),
            "filename": f"img{i}.jpg",
            "cocoid": i,
            "caption": f"a photo number {i}",
            "sentences_raw": [f"a photo number {i}", f"picture {i} here"],
        }

    return {"train": [item(i) for i in range(n_train)],
            "validation": [item(100 + i) for i in range(n_val)]}


def mme_splits(n=10):
    items = [
        {"question_id": f"m{i}", "question": f"is it {i}?", "answer": "Yes" if i % 2 else "No",
         "image": rand_img(i)}
        for i in range(n)
    ]
    return {"train": items[:4], "validation": items[4:]}


def seed_splits(n=10):
    items = [
        {"question_id": f"s{i}", "question": f"which {i}?", "answer": "A",
         "choice_a": "x", "choice_b": "y", "choice_c": "z", "choice_d": "w",
         "image": rand_img(i), "data_type": "image"}
        for i in range(n)
    ]
    return {"train": items[:4], "validation": items[4:]}


def hateful_splits(n=8):
    items = [
        {"id": i, "text": f"meme {i}", "label": i % 2, "img": rand_img(i)}
        for i in range(n)
    ]
    return {"train": items[:4], "validation": items[4:]}


def make_cfg(name, num_shot=1, **kw):
    cfg = EvalConfig(model_name="tiny-idefics2", batch_size=2, iterations=1)
    cfg.data = DataConfig(name=name, num_query_samples=4, num_shot=num_shot, seed=3407)
    cfg.generation.num_beams = 1
    cfg.generation.max_new_tokens = 4
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


@pytest.mark.parametrize(
    "name,splits_fn,metric_key",
    [
        ("coco", caption_splits, "CIDEr"),
        ("mme", mme_splits, "accuracy"),
        ("seed_bench", seed_splits, "exact_match"),
        ("hateful_memes", hateful_splits, "accuracy"),
    ],
)
def test_adapter_eval_end_to_end(runner, tmp_path, name, splits_fn, metric_key):  # noqa: F811
    cfg = make_cfg(name)
    result = run_eval(cfg, runner, result_dir=str(tmp_path), splits=splits_fn())
    assert result is not None
    records, metrics = result
    assert metric_key in metrics
    assert len(records) == 2  # 1 iteration × batch 2


def test_max_skip_oom_budget(runner):  # noqa: F811
    """OOM batches are skipped up to the budget, then re-raised
    (interface.py:152-190 semantics, RESOURCE_EXHAUSTED as the TPU analog)."""
    from mimic_tpu.data.adapters import build_adapter

    cfg = make_cfg("coco")
    adapter = build_adapter(cfg.data, splits=caption_splits())
    dl = adapter.validation_dataloader(batch_size=2)
    batch = next(iter(dl))
    gen_args = dict(num_beams=1, max_new_tokens=4)

    class OOMRunner:
        def __init__(self, inner, fail_times):
            self.inner = inner
            self.fail_times = fail_times
            self.calls = 0

        def generate(self, *a, **kw):
            self.calls += 1
            if self.calls <= self.fail_times:
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory while allocating")
            return self.inner.generate(*a, **kw)

    oom = OOMRunner(runner, fail_times=1)
    assert adapter.get_prediction(oom, batch, max_skip_oom=1, **gen_args) is None
    assert adapter.get_prediction(oom, batch, max_skip_oom=1, **gen_args) is not None

    oom2 = OOMRunner(runner, fail_times=10)
    adapter._num_skip_oom = 0
    assert adapter.get_prediction(oom2, batch, max_skip_oom=1, **gen_args) is None
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        adapter.get_prediction(oom2, batch, max_skip_oom=1, **gen_args)

    # a non-OOM error is never swallowed
    class BoomRunner:
        def generate(self, *a, **kw):
            raise ValueError("boom")

    adapter._num_skip_oom = 0
    with pytest.raises(ValueError, match="boom"):
        adapter.get_prediction(BoomRunner(), batch, max_skip_oom=5, **gen_args)
