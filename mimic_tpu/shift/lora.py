"""LoRA adapter parameters (baseline; reference uses HF peft,
``src/utils.py:50-63`` + ``src/config/peft/lora.yaml``).

Adapters are stacked per-layer ``[L, ...]`` pytrees consumed by the decoder scan:
``W x + (α/r) · B(A x)`` on the configured attention projections.  A is
kaiming-style random, B zeros (delta starts at 0, peft convention).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import LoraConfig
from ..models.config import TextConfig

LoraParams = Dict[str, jnp.ndarray]

_PROJ_DIMS = {
    "q_proj": lambda c: c.num_heads * c.head_size,
    "k_proj": lambda c: c.num_kv_heads * c.head_size,
    "v_proj": lambda c: c.num_kv_heads * c.head_size,
    "o_proj": lambda c: c.hidden_size,
}
_PROJ_IN = {
    "q_proj": lambda c: c.hidden_size,
    "k_proj": lambda c: c.hidden_size,
    "v_proj": lambda c: c.hidden_size,
    "o_proj": lambda c: c.num_heads * c.head_size,
}


def init_lora_params(
    lora_cfg: LoraConfig, text_cfg: TextConfig, key: jax.Array, dtype=jnp.float32
) -> LoraParams:
    params: LoraParams = {}
    L, r = text_cfg.num_layers, lora_cfg.r
    for i, target in enumerate(lora_cfg.target_modules):
        name = target if target.endswith("_proj") else f"{target}_proj"
        if name not in _PROJ_DIMS:
            raise ValueError(f"Unsupported LoRA target {target!r}")
        short = name[0]  # q/k/v/o
        d_in = _PROJ_IN[name](text_cfg)
        d_out = _PROJ_DIMS[name](text_cfg)
        k = jax.random.fold_in(key, i)
        # kaiming-uniform bound for A (peft default), zeros for B
        bound = math.sqrt(6.0 / d_in)
        params[f"{short}_a"] = (
            jax.random.uniform(k, (L, d_in, r), minval=-bound, maxval=bound)
        ).astype(dtype)
        params[f"{short}_b"] = jnp.zeros((L, r, d_out), dtype)
    return params


def lora_scaling(lora_cfg: LoraConfig) -> float:
    return lora_cfg.scaling()


def merge_lora(params, adapters: LoraParams, scaling: float):
    """Fold trained LoRA adapters into the frozen decoder weights for serving:
    W' = W + scaling · A@B per layer per target projection.

    Equivalent forward (peft ``merge_and_unload`` analog) without the per-layer
    adapter matmuls at decode time.  Returns a NEW params pytree; the input is
    untouched.  Adapter leaves are stacked [L, d_in, r] / [L, r, d_out] matching
    the stacked decoder weights [L, d_in, d_out].
    """
    layers = dict(params["lm"]["decoder"]["layers"])
    for short in ("q", "k", "v", "o"):
        a, b = adapters.get(f"{short}_a"), adapters.get(f"{short}_b")
        if a is None:
            continue
        name = f"{short}_proj"
        w = layers[name]
        delta = scaling * jnp.einsum("lir,lro->lio", a, b)
        layers[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    out = dict(params)
    out["lm"] = dict(params["lm"])
    out["lm"]["decoder"] = dict(params["lm"]["decoder"])
    out["lm"]["decoder"]["layers"] = layers
    return out
