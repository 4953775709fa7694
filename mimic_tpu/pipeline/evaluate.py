"""Evaluation entry — parity with reference ``src/eval.py``.

- ICL mode iff no checkpoint path is given (``eval.py:24``)
- record path ``<result_dir>/record/<runname>/{N}shot.json`` (ICL) or
  ``epoch-N.json`` (checkpoint) (``eval.py:26-39``)
- resume-skip when the record exists (``eval.py:43-46``)
- shifts stay active for all generation once loaded (``eval.py:52-61``)
- records persist {eval_result, records, configs} (``eval.py:67-79``)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

from ..config import EvalConfig, config_to_dict
from ..data.adapters import build_adapter
from ..utils import get_expand_runname


def record_path(cfg: EvalConfig, result_dir: str) -> str:
    runname = get_expand_runname(cfg)
    record_dir = os.path.join(result_dir, "record", runname)
    if cfg.is_icl:
        fname = f"{cfg.data.num_shot}shot.json"
    else:
        epoch = os.path.basename(cfg.ckpt_path)  # "epoch-N"
        fname = f"{epoch}.json"
    return os.path.join(record_dir, fname)


def save_record(path: str, eval_result: Dict, records, train_cfg: Optional[Dict], eval_cfg: Dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "eval_result": eval_result,
        "records": records,
        "train_config": train_cfg,
        "eval_config": eval_cfg,
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)


def run_eval(
    cfg: EvalConfig,
    runner,
    result_dir: str = "results",
    adapter=None,
    splits=None,
) -> Optional[Tuple[Any, Dict]]:
    """Evaluate ``runner`` on the configured dataset; returns (records, metrics) or
    None when the record already exists and resume is on."""
    cfg.data.is_icl = cfg.is_icl
    path = record_path(cfg, result_dir)
    if cfg.resume and os.path.exists(path):
        print(f"Record {path} exists, skipping.")
        return None

    if adapter is None:
        adapter = build_adapter(cfg.data, splits=splits)

    if cfg.data.length_buckets and hasattr(runner, "length_buckets"):
        runner.length_buckets = tuple(cfg.data.length_buckets)

    if not cfg.is_icl:
        # load trained shift/adapters into the runner
        from ..train.checkpoints import load_trainable

        if (
            runner.shift is None
            and runner.adapters is None
            and not getattr(runner, "_lora_merged", False)
        ):
            raise ValueError(
                "Non-ICL eval requires the runner to carry trained shift params "
                "(use load_trainable + runner.set_shift before run_eval, or pass "
                "a template via EvalConfig and let the caller load it)."
            )

    records, eval_result = adapter.eval(cfg, runner)

    train_cfg = None
    if cfg.ckpt_path:
        cfg_file = os.path.join(os.path.dirname(cfg.ckpt_path), "config.json")
        if os.path.exists(cfg_file):
            train_cfg = json.load(open(cfg_file))
    save_record(path, eval_result, records, train_cfg, config_to_dict(cfg))
    return records, eval_result
