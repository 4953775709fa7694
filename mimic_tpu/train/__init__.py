from .checkpoints import (
    all_checkpoints_exist,
    existing_ckpt_epochs,
    load_trainable,
    save_run_config,
    save_trainable,
)
from .collate import TrainBatch, TrainCollator
from .losses import layer_wise_cos, layer_wise_mse, lm_cross_entropy, logits_kl
from .masking import generate_label_mask, mask_to_gather, paired_gather_width
from .optim import build_optimizer, cosine_warmup_schedule
from .step import TrainState, compute_loss, make_train_step
from .trainer import MetricLogger, get_max_epochs, make_save_when, train_loop

__all__ = [
    "MetricLogger",
    "TrainBatch",
    "TrainCollator",
    "TrainState",
    "all_checkpoints_exist",
    "build_optimizer",
    "compute_loss",
    "cosine_warmup_schedule",
    "existing_ckpt_epochs",
    "generate_label_mask",
    "get_max_epochs",
    "layer_wise_cos",
    "layer_wise_mse",
    "lm_cross_entropy",
    "load_trainable",
    "logits_kl",
    "make_save_when",
    "make_train_step",
    "mask_to_gather",
    "paired_gather_width",
    "save_run_config",
    "save_trainable",
    "train_loop",
]
