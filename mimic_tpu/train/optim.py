"""Optimizer construction: AdamW + cosine-with-warmup, reference param groups.

Parity with ``ShiftModel.configure_optimizers`` (``src/shift_model.py:306-390``):

- decay / no-decay split: parameters whose name contains "bias" (here: the
  ``attn_logz1_b`` leaves) get weight_decay 0
- optional ``scale_lr`` group (LIVE): leaves whose name contains "log_Z1"/"scale"
  train at ``peft.scale_lr`` instead of ``lr``
- schedule: linear warmup → cosine decay to 0 (transformers
  ``get_cosine_schedule_with_warmup``)
- gradient clipping by global norm (Lightning ``gradient_clip_val``)
- gradient accumulation via ``optax.MultiSteps``
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax


def cosine_warmup_schedule(peak_lr: float, warmup_steps: int, total_steps: int):
    """0→peak linear over warmup, then cosine peak→0 at total_steps (HF formula)."""
    warmup_steps = max(int(warmup_steps), 0)
    decay_steps = max(total_steps - warmup_steps, 1)

    def schedule(step):
        import jax.numpy as jnp

        warm = peak_lr * jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        progress = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = peak_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def _leaf_labels(trainable, scale_lr_enabled: bool) -> Any:
    """Label each leaf 'scale' or 'regular' by its key path."""

    def label(path_str: str) -> str:
        low = path_str.lower()
        if scale_lr_enabled and ("logz1" in low or "scale" in low):
            return "scale"
        return "regular"

    flat = jax.tree_util.tree_flatten_with_path(trainable)[0]
    labels_flat = [label(jax.tree_util.keystr(p)) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(trainable)
    return jax.tree_util.tree_unflatten(treedef, labels_flat)


def _decay_mask(trainable) -> Any:
    def is_decay(path) -> bool:
        # reference non_decay_names = ["bias"]; our bias-analog leaves end in "_b"
        # for the log-Z1 linear and contain "bias" for converted weights
        s = jax.tree_util.keystr(path).lower()
        return not ("bias" in s or s.endswith("logz1_b']") or "logz1_b" in s)

    return jax.tree_util.tree_map_with_path(lambda p, _: is_decay(p), trainable)


def build_optimizer(
    trainable_template: Dict[str, Any],
    *,
    lr: float,
    weight_decay: float,
    warmup_steps: int,
    total_steps: int,
    grad_clip: Optional[float] = 1.0,
    scale_lr: Optional[float] = None,
    accumulate_steps: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    def group(peak):
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(weight_decay, mask=_decay_mask),
            optax.scale_by_learning_rate(
                cosine_warmup_schedule(peak, warmup_steps, total_steps)
            ),
        )

    if scale_lr is not None:
        labels = _leaf_labels(trainable_template, True)
        inner = optax.multi_transform(
            {"regular": group(lr), "scale": group(scale_lr)}, labels
        )
    else:
        inner = group(lr)

    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(inner)
    tx = optax.chain(*parts)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
