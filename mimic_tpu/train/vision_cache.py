"""Vision-feature cache for TRAINING (the record pass's demo images recur).

The MimIC train dataloader resamples demonstrations from one fixed train set
(reference ``src/dataset_utils/interface.py:192-289``: a replacement
``RandomSampler`` over at most ``num_query_samples`` support items), and the
vision tower is FROZEN — so every demo image's features are constants that the
reference recomputes every step, epoch after epoch.  At the 8B scale the
record pass's vision encodes are ~60% of the 2.2 s dual-pass step
(``scripts/bench_8b_train.py``).

``TrainVisionCache`` is a ``train_loop`` batch transform: it swaps each
TrainBatch's pixel fields for cached encoded features
(``models/feature_cache.py``; keys emitted by
``TrainCollator(emit_image_keys=True)``) and the jitted step consumes them
via ``full_feats`` / ``query_feats`` (``compute_loss``).  After the first
epoch every train image is a hit and the step runs vision-free.

Numerics: features are the encode function's own outputs — every occurrence
of an image sees IDENTICAL features (more self-consistent than the uncached
step, where batch composition can perturb ulps).  Versus the uncached step
the loss may differ by float ulps (different encode batch shapes);
``tests/test_train_vision_cache.py`` bounds it.

Inline-splice families only (idefics1 cross-attention needs per-step image
states and its own mask plumbing — excluded, as in serve/eval).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from ..models.config import ModelConfig
from ..models.feature_cache import VisionFeatureCache
from .collate import TrainBatch
from .step import _to_device_batch


class TrainVisionCache:
    """Batch transform: TrainBatch → device dict with cached image features."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Dict[str, Any],
        max_bytes: int = 2 * 1024 * 1024 * 1024,
        attn_impl: Optional[str] = None,
    ):
        if cfg.family == "idefics1":
            raise ValueError("train vision cache does not support cross-attention families")
        import jax

        self.cfg = cfg
        self.params = params
        self.attn_impl = attn_impl or (
            "flash" if jax.default_backend() == "tpu" else "xla"
        )
        self.cache = VisionFeatureCache(max_bytes=max_bytes)

    def __call__(self, tb: TrainBatch) -> Dict[str, Any]:
        batch = _to_device_batch(tb)
        for pfx in ("full", "query"):
            keys = getattr(tb, f"{pfx}_image_keys")
            pixels = getattr(tb, f"{pfx}_pixels")
            if keys is None or pixels is None:
                continue
            batch[f"{pfx}_feats"] = self.cache.get_features(
                self.params, self.cfg, pixels,
                getattr(tb, f"{pfx}_patch_mask"), keys, attn_impl=self.attn_impl,
            )
            # feats replace the pixel path entirely (inline splice needs only
            # the input ids); dropping the pixels also skips their transfer
            for suffix in ("pixels", "pixel_mask", "patch_mask"):
                batch.pop(f"{pfx}_{suffix}", None)
        return batch
