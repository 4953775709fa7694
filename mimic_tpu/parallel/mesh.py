"""Device mesh + sharding rules.

Replaces the reference's Lightning DDP / DeepSpeed-ZeRO stack
(``src/config/train.yaml:14``, ``src/shift_model.py:363-367``) with
``jax.sharding``: a ``Mesh('data', 'model')`` over ICI, parameters sharded over
the ``model`` axis (tensor parallel — needed to fit the 8-9B frozen towers per
v5e host), batches over ``data``, and XLA inserting the collectives.

Gradient all-reduce over ``data`` happens automatically: trainable params are
replicated across ``data``, so XLA psums their grads — the analog of "Lightning
owns NCCL" (SURVEY §2.3).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# parameter partition rules
# ---------------------------------------------------------------------------

# (regex on the flattened key path) → PartitionSpec.  First match wins; default
# replicated.  Layer-stacked leaves have a leading L axis (never sharded).
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # text decoder attention / mlp: shard the head/ffn dim over 'model'
    (r"\['(q|k|v)_proj'\]$", P(None, None, "model")),
    (r"\['o_proj'\]$", P(None, "model", None)),
    (r"\['(gate|up)_proj'\]$", P(None, None, "model")),
    (r"\['down_proj'\]$", P(None, "model", None)),
    (r"\['(q|k|v)_bias'\]$", P(None, "model")),
    # embedding / lm head: shard the vocab dim
    (r"\['embed'\]$", P("model", None)),
    (r"\['lm_head'\]$", P(None, "model")),
    # vision tower dense layers (2D kernels inside the scan stack)
    (r"\['fc1'\]$", P(None, None, "model")),
    (r"\['fc2'\]$", P(None, "model", None)),
    # connector / projector big mats
    (r"\['modality_proj'\]\['(gate|up)'\]$", P(None, "model")),
    (r"\['modality_proj'\]\['down'\]$", P("model", None)),
)

# LoRA / shift params are tiny — replicate them everywhere.


def _spec_for(path_str: str, ndim: int) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path_str):
            if len(spec) == ndim:
                return spec
            # rule written for stacked [L, ...] leaves; drop the leading None for
            # unstacked 2D weights
            trimmed = P(*spec[1:]) if len(spec) == ndim + 1 else None
            if trimmed is not None and len(trimmed) == ndim:
                return trimmed
            return P()
    return P()


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Build a NamedSharding tree for a parameter pytree by key-path rules.

    Axes whose dimension is not divisible by the mesh axis size fall back to
    replication on that dimension (e.g. a 32003-row vocab under 8-way model
    parallelism stays replicated rather than erroring)."""

    def spec(path, leaf):
        path_str = jax.tree_util.keystr(path)
        p = _spec_for(path_str, np.ndim(leaf))
        shape = np.shape(leaf)
        fixed = []
        for dim, axis in enumerate(p):
            if axis is None:
                fixed.append(None)
                continue
            size = mesh.shape[axis]
            fixed.append(axis if shape[dim] % size == 0 else None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(spec, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_shardings(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard every batch leaf over 'data' on its leading axis."""
    return jax.tree.map(lambda x: NamedSharding(mesh, P("data")), batch)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return jax.device_put(batch, batch_shardings(batch, mesh))


def replicate(tree: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return jax.device_put(tree, replicated(mesh))
