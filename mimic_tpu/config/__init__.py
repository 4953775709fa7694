from .core import (
    AnalyzeConfig,
    DataConfig,
    EncoderConfig,
    EvalConfig,
    GenerationConfig,
    LoraConfig,
    MeshConfig,
    PeftConfig,
    TrainConfig,
    apply_overrides,
    config_from_dict,
    config_to_dict,
    load_yaml_config,
)
from .flags import ShiftStrategy, Strategy, parse_flags, parse_shift_strategy, parse_strategy
from .paths import Paths, get_paths, set_paths
from .presets import get_preset, preset_names

__all__ = [
    "AnalyzeConfig",
    "DataConfig",
    "EncoderConfig",
    "EvalConfig",
    "GenerationConfig",
    "LoraConfig",
    "MeshConfig",
    "PeftConfig",
    "TrainConfig",
    "Paths",
    "ShiftStrategy",
    "Strategy",
    "apply_overrides",
    "config_from_dict",
    "config_to_dict",
    "get_paths",
    "get_preset",
    "load_yaml_config",
    "parse_flags",
    "parse_shift_strategy",
    "parse_strategy",
    "preset_names",
    "set_paths",
]
