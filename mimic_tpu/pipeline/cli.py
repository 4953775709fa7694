"""Command-line interface (reference ``src/pipeline.py:230-298`` CLI analog).

    python -m mimic_tpu train   runname=exp model_name=idefics2-8b-base data.num_shot=16
    python -m mimic_tpu eval    model_name=idefics2-8b-base ckpt_path=results/ckpt/.../epoch-9
    python -m mimic_tpu analyze prefix
    python -m mimic_tpu pipeline -r exp -m idefics2-8b-base -d vqav2 -q 500 -s 16 -p mimic
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from ..config import (
    AnalyzeConfig,
    EvalConfig,
    TrainConfig,
    apply_overrides,
    get_preset,
)


def _train(overrides: List[str]) -> None:
    cfg = TrainConfig()
    preset = None
    for o in list(overrides):
        if o.startswith("preset="):
            preset = o.split("=", 1)[1]
            overrides.remove(o)
    if preset:
        cfg.encoder, cfg.peft = get_preset(preset)
    apply_overrides(cfg, overrides)
    from .train_entry import run_train

    run_train(cfg)


def _eval(overrides: List[str]) -> None:
    cfg = EvalConfig()
    preset = None
    for o in list(overrides):
        if o.startswith("preset="):
            preset = o.split("=", 1)[1]
            overrides.remove(o)
    if preset:
        cfg.encoder, cfg.peft = get_preset(preset)
    apply_overrides(cfg, overrides)
    from ..models.factory import build_model
    from .evaluate import run_eval
    from .runner import _load_ckpt_into_runner

    runner = build_model(cfg.model_name, cfg.data.name)
    if not cfg.is_icl:
        _load_ckpt_into_runner(cfg, runner)
    if cfg.quant:
        # after ckpt load / LoRA merge so the int8 copy reflects final weights
        runner.set_quant(cfg.quant)
    run_eval(cfg, runner)


def _analyze(args: List[str]) -> None:
    parser = argparse.ArgumentParser(prog="mimic_tpu analyze")
    parser.add_argument("prefix")
    parser.add_argument("--result-dir", default="results")
    parser.add_argument("--metric-key", default=None)
    parser.add_argument("--topk", type=int, default=1)
    parser.add_argument("--verbose", action="store_true")
    ns = parser.parse_args(args)
    from .analyze import analyze

    analyze(ns.prefix, ns.result_dir, ns.metric_key, ns.topk, ns.verbose)


def _pipeline(args: List[str]) -> None:
    parser = argparse.ArgumentParser(prog="mimic_tpu pipeline")
    parser.add_argument("-r", "--runname", required=True)
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("-d", "--datasets", nargs="+", default=["vqav2"])
    parser.add_argument("-q", "--num-query-samples", nargs="+", type=int, default=[500])
    parser.add_argument("-s", "--num-shots", nargs="+", type=int, default=[32])
    parser.add_argument("-p", "--preset", default="mimic")
    parser.add_argument("-t", "--train", action="store_true")
    parser.add_argument("-e", "--eval", action="store_true")
    parser.add_argument("-a", "--analyze", action="store_true")
    parser.add_argument("--result-dir", default="results")
    ns = parser.parse_args(args)
    all_phases = not (ns.train or ns.eval or ns.analyze)
    from ..models.factory import build_model
    from .runner import PipelineSpec, run_pipeline

    spec = PipelineSpec(
        runname=ns.runname,
        model_name=ns.model,
        preset=ns.preset,
        datasets=ns.datasets,
        num_query_samples=ns.num_query_samples,
        num_shots=ns.num_shots,
        do_train=ns.train or all_phases,
        do_eval=ns.eval or all_phases,
        do_analyze=ns.analyze or all_phases,
    )
    runner = build_model(ns.model, ns.datasets[0])
    run_pipeline(spec, result_dir=ns.result_dir, runner=runner)


def _maybe_init_distributed() -> None:
    """Multi-host: ``MIMIC_TPU_DISTRIBUTED=1`` runs ``jax.distributed.initialize()``
    (coordinator/process env comes from the TPU runtime).  Opt-in so single-host
    runs never pay coordinator discovery; the per-host grid/query sharding in
    train_entry/runner keys off ``jax.process_index()`` either way — the analog
    of the reference's DistributedSampler + Lightning world-size plumbing."""
    import os

    if os.environ.get("MIMIC_TPU_DISTRIBUTED") == "1":
        import jax

        jax.distributed.initialize()


def main(argv: Optional[List[str]] = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    _maybe_init_distributed()
    command, rest = argv[0], argv[1:]
    if command == "train":
        _train(rest)
    elif command == "eval":
        _eval(rest)
    elif command == "analyze":
        _analyze(rest)
    elif command == "pipeline":
        _pipeline(rest)
    else:
        print(f"Unknown command {command!r}\n{__doc__}")
        sys.exit(2)


if __name__ == "__main__":
    main()
