"""Training entry — assembles a full run (reference ``src/train.py`` analog)."""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..data.adapters import build_adapter
from ..models.factory import build_model
from ..parallel import make_mesh, replicate, shard_params
from ..shift.lora import init_lora_params
from ..shift.params import init_shift_params
from ..train import (
    TrainCollator,
    TrainState,
    build_optimizer,
    make_train_step,
    train_loop,
)
from ..train.trainer import get_max_epochs


def init_trainable(cfg: TrainConfig, text_cfg, key: jax.Array) -> Dict[str, Any]:
    trainable: Dict[str, Any] = {}
    if cfg.encoder.kind != "none":
        trainable["shift"] = init_shift_params(cfg.encoder, text_cfg, key)
    if cfg.peft.lora is not None:
        trainable["lora"] = init_lora_params(cfg.peft.lora, text_cfg, jax.random.fold_in(key, 1))
    if cfg.peft.prefix is not None:
        from ..shift.prefix import init_prefix_params

        trainable["prefix"] = init_prefix_params(
            cfg.peft.prefix, text_cfg, jax.random.fold_in(key, 2)
        )
    if not trainable:
        raise ValueError(
            "Nothing to train: encoder kind 'none' and no LoRA/prefix config"
        )
    return trainable


def run_train(
    cfg: TrainConfig,
    result_dir: str = "results",
    runner=None,
    splits=None,
    use_mesh: bool = False,
) -> TrainState:
    runner = runner or build_model(cfg.model_name, cfg.data.name, dtype=jnp.bfloat16)
    adapter = build_adapter(cfg.data, splits=splits)

    trainable = init_trainable(cfg, runner.cfg.text, jax.random.PRNGKey(cfg.seed))

    def apply_template(ctx):
        return runner.apply_prompt_template(ctx)

    # per-host query sharding (the analog of the reference's manual
    # DistributedSampler, src/train.py:104 + interface.py:251-253)
    n_proc, proc_id = jax.process_count(), jax.process_index()
    dl = adapter.train_dataloader(
        apply_template, cfg.batch_size,
        distributed=n_proc > 1, num_replicas=n_proc, rank=proc_id,
    )
    max_epochs = cfg.epochs or get_max_epochs(cfg.model_name, cfg.data.num_query_samples)
    steps_per_epoch = max(len(dl) // max(cfg.accumulate_grad_batches, 1), 1)
    total_steps = steps_per_epoch * max_epochs
    warmup = (
        int(cfg.warmup_step * total_steps)
        if isinstance(cfg.warmup_step, float)
        else int(cfg.warmup_step)
    )

    tx = build_optimizer(
        trainable,
        lr=cfg.peft.lr,
        weight_decay=cfg.weight_decay,
        warmup_steps=warmup,
        total_steps=total_steps,
        grad_clip=cfg.grad_clip_val,
        scale_lr=cfg.peft.scale_lr,
        accumulate_steps=cfg.accumulate_grad_batches,
    )
    lora_scaling = cfg.peft.lora.scaling() if cfg.peft.lora else 1.0
    attn_impl = cfg.attn_impl
    if attn_impl == "auto":
        attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
    step = make_train_step(
        runner.cfg, cfg.encoder, tx,
        ce_loss_weight=cfg.peft.ce_loss_weight,
        align_loss_weight=cfg.peft.align_loss_weight,
        lora_scaling=lora_scaling,
        lora_dropout=cfg.peft.lora.dropout if cfg.peft.lora else 0.0,
        attn_impl=attn_impl,
        seed=cfg.seed,
    )

    # training vision-feature cache: demo images resample from the fixed
    # train set (interface.py:192-289 semantics) and the tower is frozen —
    # cache their encoded features instead of re-encoding every step.
    # Inline-splice families only; the mesh path keeps the in-step encode
    # (feats would need their own sharding story).
    use_vcache = (
        getattr(cfg, "vision_cache", False)
        and runner.cfg.family != "idefics1"
        and runner.cfg.vision is not None
        and not use_mesh
    )
    collator = TrainCollator(
        runner.processor, cfg.encoder.strategy(),
        num_image_in_query=cfg.data.num_image_in_query,
        max_query_len=cfg.data.max_query_len,
        max_full_len=cfg.data.max_full_len,
        emit_image_keys=use_vcache,
    )
    batch_transform = None
    if use_vcache:
        from ..train.vision_cache import TrainVisionCache

        batch_transform = TrainVisionCache(
            runner.cfg, runner.params,
            max_bytes=getattr(cfg, "vision_cache_mb", 2048) * 1024 * 1024,
            attn_impl=attn_impl if attn_impl in ("flash", "xla") else None,
        )

    frozen = runner.params
    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = make_mesh(n_data=cfg.mesh.data_axis, n_model=cfg.mesh.model_axis)
        frozen = shard_params(frozen, mesh)
        trainable = replicate(trainable, mesh)

    state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))

    from ..data.prefetch import prefetch

    def epoch_batches(epoch: int):
        # collate (tokenize + image decode) in background thread(s) while the
        # device executes the current step (DataConfig.num_workers analog of the
        # reference's DataLoader workers, src/config/data.yaml:7)
        return prefetch(
            dl, depth=2, transform=collator, workers=max(1, cfg.data.num_workers)
        )

    from ..train.optim import cosine_warmup_schedule

    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        state = train_loop(
            cfg, state, frozen, step, epoch_batches,
            result_dir=result_dir, max_epochs=max_epochs,
            lr_schedule=cosine_warmup_schedule(cfg.peft.lr, warmup, total_steps),
            batch_transform=batch_transform,
        )
    return state


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
