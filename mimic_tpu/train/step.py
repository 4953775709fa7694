"""The jitted dual-pass training step.

The reference runs: record pass (frozen model + forward hooks, no grad,
``src/shift_model.py:224-234``) then shift pass (patched attention,
``:236-243``) then loss assembly (``:246-283``), under Lightning/DeepSpeed.
Here the whole thing — both forwards, masked losses, grad of the tiny trainable
pytree, optimizer update — is ONE compiled XLA program per batch shape.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import EncoderConfig, Strategy
from ..models.config import ModelConfig
from ..models.lvlm import LVLMBatch, lvlm_forward
from ..shift.params import multi_head, needs_attn_capture, needs_ffn_capture
from .collate import TrainBatch
from .losses import layer_wise_cos, layer_wise_mse, lm_cross_entropy, logits_kl


def _to_device_batch(tb: TrainBatch) -> Dict[str, Any]:
    """numpy TrainBatch → dict of jnp arrays (only non-None leaves).

    ``*_image_keys`` are host-side cache keys (``train/vision_cache.py``),
    not device data — they never enter the jitted step."""
    out = {}
    for k, v in vars(tb).items():
        if v is not None and not k.endswith("_image_keys"):
            out[k] = jnp.asarray(v)
    return out


def _model_dtype(frozen) -> Any:
    for leaf in jax.tree.leaves(frozen):
        if jnp.issubdtype(leaf.dtype, jnp.floating) and leaf.dtype != jnp.float32:
            return leaf.dtype
    return jnp.float32


def _query_lvlm_batch(b: Dict[str, Any]) -> LVLMBatch:
    return LVLMBatch(
        input_ids=b["query_ids"],
        attention_mask=b["query_mask"],
        pixel_values=b.get("query_pixels"),
        pixel_mask=b.get("query_pixel_mask"),
        image_attention_mask=b.get("query_img_attn"),
        patch_mask=b.get("query_patch_mask"),
    )


def _full_lvlm_batch(b: Dict[str, Any]) -> LVLMBatch:
    return LVLMBatch(
        input_ids=b["full_ids"],
        attention_mask=b["full_mask"],
        pixel_values=b.get("full_pixels"),
        pixel_mask=b.get("full_pixel_mask"),
        image_attention_mask=b.get("full_img_attn"),
        patch_mask=b.get("full_patch_mask"),
    )


def compute_loss(
    trainable: Dict[str, Any],
    frozen: Dict[str, Any],
    batch: Dict[str, Any],
    *,
    cfg: ModelConfig,
    strategy: Strategy,
    rec_attn: bool,
    rec_ffn: bool,
    mh: bool,
    ce_loss_weight: float,
    align_loss_weight: float,
    lora_scaling: float,
    logz2: str,
    attn_impl: str = "xla",
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    ring_kwargs: Optional[Dict[str, Any]] = None,
    shift_remat: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    shift = trainable.get("shift") or None
    lora = trainable.get("lora") or None
    prefix = trainable.get("prefix") or None
    ring_kwargs = ring_kwargs or {}
    loss = jnp.zeros((), jnp.float32)
    metrics: Dict[str, jnp.ndarray] = {}

    need_prefix = strategy != Strategy.LM_LOSS
    layer_wise = strategy.has_layer_wise()
    prefix_logits = prefix_attn = prefix_ffn = None
    if need_prefix:
        # record pass: frozen weights, adapters disabled (reference
        # ``disable_adapter()``, :225), gradients cannot flow (no trainable inputs)
        # Only the KL strategies read the record logits — for the others, skip
        # the [B,T,V] unembed (at 8B scale the f32 logits of a 2048-token
        # record pass are 0.5 GB of the 16 GB chip, and they were dead)
        out1 = lvlm_forward(
            frozen, cfg, _full_lvlm_batch(batch),
            image_feats=batch.get("full_feats"),
            capture_attn=rec_attn, capture_ffn=rec_ffn, logz2=logz2,
            attn_impl=attn_impl, **ring_kwargs,
            last_logit_only=Strategy.LOGITS_KL_DIV not in strategy,
            capture_gather_idx=batch.get("prefix_q_idx") if layer_wise else None,
        )
        prefix_logits = jax.lax.stop_gradient(out1.logits)
        prefix_attn = jax.lax.stop_gradient(out1.decoder.attn_capture) if rec_attn else None
        prefix_ffn = jax.lax.stop_gradient(out1.decoder.ffn_capture) if rec_ffn else None

    # both passes can run the Pallas kernel: the record pass is gradient-free and
    # the shift pass differentiates through flash_attention_diff's custom VJP
    pass2_impl = attn_impl
    qb = _query_lvlm_batch(batch)
    prefix_kwargs = {}
    if prefix is not None:
        # prefix-tuning: the learned KV rides as a pre-written cache (length P)
        # and the forward takes the cached-attention path — all queries attend
        # the P virtual slots, causal within the real block (HF past_key_values
        # semantics); fully differentiable (broadcast + concat + einsums)
        from ..shift.prefix import prefix_forward_args

        qb, pos, cache, total = prefix_forward_args(
            prefix, qb, _model_dtype(frozen)
        )
        prefix_kwargs = dict(position_ids=pos, kv_cache=cache, kv_total_len=total)
    out2 = lvlm_forward(
        frozen, cfg, qb,
        image_feats=batch.get("query_feats"),
        shift=shift, adapters=lora, lora_scaling=lora_scaling,
        lora_dropout=lora_dropout, dropout_rng=dropout_rng,
        multi_head=mh, capture_attn=rec_attn, capture_ffn=rec_ffn, logz2=logz2,
        attn_impl=pass2_impl, **ring_kwargs, **prefix_kwargs,
        remat=shift_remat,
        capture_gather_idx=batch.get("shift_q_idx") if layer_wise else None,
    )

    if Strategy.LM_LOSS in strategy:
        ce = lm_cross_entropy(out2.logits, batch["query_ids"], batch["query_mask"])
        metrics["ce_loss"] = ce
        w = 1.0 if strategy == Strategy.LM_LOSS else ce_loss_weight
        loss = loss + w * ce

    if strategy.has_layer_wise():
        loss_fn = (
            layer_wise_mse if Strategy.LAYER_WISE_MSE in strategy else layer_wise_cos
        )
        suffix = "mse_loss" if Strategy.LAYER_WISE_MSE in strategy else "cos_sim"
        align = jnp.zeros((), jnp.float32)
        for name, shift_cap, prefix_cap in (
            ("attn", out2.decoder.attn_capture, prefix_attn),
            ("ffn", out2.decoder.ffn_capture, prefix_ffn),
        ):
            if shift_cap is None or prefix_cap is None:
                continue
            # captures are already gathered at the query-token indices inside
            # the decoder scan; identity indices keep the loss math unchanged
            M = shift_cap.shape[2]
            ident = jnp.broadcast_to(
                jnp.arange(M)[None], (shift_cap.shape[1], M)
            )
            part = loss_fn(
                shift_cap, prefix_cap, ident, ident, batch["q_valid"],
            )
            metrics[f"{name}_{suffix}"] = part
            align = align + part
        loss = loss + align_loss_weight * align

    if Strategy.LOGITS_KL_DIV in strategy:
        kl = logits_kl(
            out2.logits, prefix_logits,
            batch["query_ans_idx"], batch["prefix_ans_idx"], batch["ans_valid"],
        )
        metrics["logits_kl_loss"] = kl
        loss = loss + align_loss_weight * kl

    metrics["loss"] = loss
    return loss, metrics


class TrainState(NamedTuple):
    trainable: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def make_train_step(
    cfg: ModelConfig,
    encoder_cfg: EncoderConfig,
    optimizer: optax.GradientTransformation,
    *,
    ce_loss_weight: float,
    align_loss_weight: float,
    lora_scaling: float = 1.0,
    lora_dropout: float = 0.0,
    logz2: str = "unmasked",
    attn_impl: str = "xla",
    accumulate_steps: int = 1,
    donate: bool = True,
    seed: int = 0,
    ring_mesh: Any = None,
    ring_axis: str = "sp",
    ring_batch_axis: Optional[str] = None,
    ring_min_len: int = 0,
    shift_remat: bool = False,
):
    """Build the jitted (state, frozen, batch) → (state, metrics) step.

    Gradient accumulation uses ``optax.MultiSteps`` semantics via the wrapped
    optimizer — pass the already-wrapped optimizer when ``accumulate_steps > 1``.

    ``attn_impl="ring"`` + ``ring_mesh``: the record pass's sequence axis is
    sharded over ``ring_axis`` of the mesh and attention runs as a ppermute
    ring (``ops/ring_attention.py``) — exact attention for >32-shot contexts
    that exceed one device's memory (the reference has no long-context
    strategy; it manages context down, SURVEY §5).  Sequences shorter than
    ``ring_min_len`` (e.g. the shift pass) stay single-device.
    """
    strategy = encoder_cfg.strategy()
    ring_kwargs = {}
    if attn_impl == "ring":
        if ring_mesh is None:
            raise ValueError('attn_impl="ring" requires ring_mesh')
        ring_kwargs = dict(
            ring_mesh=ring_mesh, ring_axis=ring_axis,
            ring_batch_axis=ring_batch_axis, ring_min_len=ring_min_len,
        )
    loss_kwargs = dict(
        cfg=cfg,
        strategy=strategy,
        rec_attn=needs_attn_capture(encoder_cfg),
        rec_ffn=needs_ffn_capture(encoder_cfg),
        mh=multi_head(encoder_cfg),
        ce_loss_weight=ce_loss_weight,
        align_loss_weight=align_loss_weight,
        lora_scaling=lora_scaling,
        lora_dropout=lora_dropout,
        logz2=logz2,
        attn_impl=attn_impl,
        ring_kwargs=ring_kwargs,
        shift_remat=shift_remat,
    )
    base_rng = jax.random.PRNGKey(seed)

    def step_fn(state: TrainState, frozen, batch):
        dropout_rng = (
            jax.random.fold_in(base_rng, state.step) if lora_dropout > 0.0 else None
        )
        (loss, metrics), grads = jax.value_and_grad(
            lambda t: compute_loss(
                t, frozen, batch, dropout_rng=dropout_rng, **loss_kwargs
            ),
            has_aux=True,
        )(state.trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
