from .analyze import analyze, sort_runname_key
from .evaluate import record_path, run_eval, save_record
from .runner import PipelineSpec, run_pipeline, task_grid
from .train_entry import init_trainable, run_train

__all__ = [
    "PipelineSpec",
    "analyze",
    "init_trainable",
    "record_path",
    "run_eval",
    "run_pipeline",
    "run_train",
    "save_record",
    "sort_runname_key",
    "task_grid",
]
