"""Model factory — ``build_model`` analog (reference ``src/utils.py:66-93``).

Builds an ``LVLMRunner`` for a named model: architecture config + parameters
(converted JAX checkpoint from the configured path, else random init for smoke
runs) + tokenizer (HF from the checkpoint path when present, else the
self-contained byte tokenizer) — including the idefics2 image-resolution override
for seed/mme (reference ``src/utils.py:73-79``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config.paths import Paths, get_paths
from .config import ModelConfig, get_model_config
from .lvlm import init_lvlm_params
from .runner import LVLMRunner
from .tokenizer import HFTokenizerAdapter, SimpleTokenizer

_MODEL_PATH_FIELD = {
    "idefics-9b": "idefics_9b_path",
    "idefics2-8b-base": "idefics2_8b_base_path",
    "llava-interleave-7b": "llava_interleave_7b_path",
}


def load_params(cfg: ModelConfig, path: Optional[str], dtype=jnp.bfloat16, seed: int = 0):
    """Load converted weights (``params.msgpack`` written by ``convert.py``) or
    random-init at the configured dtype."""
    if path:
        ckpt = os.path.join(path, "params.msgpack")
        if os.path.exists(ckpt):
            from flax import serialization

            template = init_lvlm_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
            with open(ckpt, "rb") as f:
                return serialization.from_bytes(template, f.read())
    return init_lvlm_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)


def build_tokenizer(cfg: ModelConfig, path: Optional[str]):
    if path and os.path.exists(os.path.join(path, "tokenizer_config.json")):
        return HFTokenizerAdapter.from_pretrained(path)
    return SimpleTokenizer()


def build_model(
    model_name: str,
    dataset_name: str = "",
    paths: Optional[Paths] = None,
    dtype=jnp.bfloat16,
    params: Optional[Dict[str, Any]] = None,
    tokenizer=None,
    quant: Optional[str] = None,
) -> LVLMRunner:
    paths = paths or get_paths()
    cfg = get_model_config(model_name)
    path = getattr(paths, _MODEL_PATH_FIELD.get(model_name, ""), None) if not model_name.startswith("tiny-") else None
    tokenizer = tokenizer or build_tokenizer(cfg, path)
    cfg = cfg.replace(
        image_token_id=tokenizer.image_token_id,
        pad_token_id=tokenizer.pad_token_id,
        bos_token_id=tokenizer.bos_token_id,
        eos_token_id=tokenizer.eos_token_id,
    )
    if tokenizer.vocab_size != cfg.text.vocab_size and model_name.startswith("tiny-"):
        cfg = cfg.replace(
            text=cfg.text.__class__(
                **{**cfg.text.__dict__, "vocab_size": tokenizer.vocab_size}
            )
        )
    image_size = None
    if "idefics2" in model_name and (
        "seed" in dataset_name or "mme" in dataset_name
    ):
        # seed/mme cannot run full resolution (reference src/utils.py:76-79)
        image_size = 448
    if params is None:
        params = load_params(cfg, path, dtype=dtype)
    return LVLMRunner(cfg, params, tokenizer, image_size=image_size, quant=quant)
