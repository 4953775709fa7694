"""Checkpoint I/O for the trainable pytree.

Reference layout parity (``src/utils.py:96-116``, ``src/shift_model.py:293-304``):
``<result_dir>/ckpt/<runname>/epoch-N/`` holding the encoder weights (lmm keys
stripped — here the trainable pytree *is* only the encoder) plus the archived train
config; "resume" = skip-if-all-checkpoints-exist at run granularity
(``src/train.py:71-84``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

ENCODER_FILE = "encoder.msgpack"
CONFIG_FILE = "config.json"


def save_trainable(ckpt_dir: str, trainable: Dict[str, Any]) -> None:
    from flax import serialization

    os.makedirs(ckpt_dir, exist_ok=True)
    host = jax.tree.map(np.asarray, trainable)
    with open(os.path.join(ckpt_dir, ENCODER_FILE), "wb") as f:
        f.write(serialization.to_bytes(host))


def load_trainable(ckpt_dir: str, template: Dict[str, Any]) -> Dict[str, Any]:
    from flax import serialization

    with open(os.path.join(ckpt_dir, ENCODER_FILE), "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(jax.tree.map(np.asarray, template), data)
    return jax.tree.map(jnp.asarray, restored)


def save_run_config(run_dir: str, cfg_dict: Dict[str, Any]) -> None:
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, CONFIG_FILE), "w") as f:
        json.dump(cfg_dict, f, indent=4, default=str)


def existing_ckpt_epochs(run_dir: str) -> List[int]:
    if not os.path.isdir(run_dir):
        return []
    out = []
    for d in os.listdir(run_dir):
        if d.startswith("epoch-"):
            try:
                out.append(int(d.split("-")[-1]))
            except ValueError:
                pass
    return sorted(out)


def all_checkpoints_exist(run_dir: str, max_epochs: int, save_when) -> bool:
    """Reference resume-skip: every epoch that save_when wants is already saved."""
    have = set(existing_ckpt_epochs(run_dir))
    return all(not save_when(e) or e in have for e in range(max_epochs))
