"""Keyed vision-feature cache for the ICL evaluation protocol.

The reference's ICL eval resamples demonstrations from ONE fixed, seeded
support set (``src/dataset_utils/interface.py:296-317``): across a 500-query
eval the same support images recur in context after context, yet every
``generate`` call re-encodes them from pixels.  At the ICL protocol (B8,
2048-token prompts, 8 demo images per context) the 64 vision encodes dominate
the batch (BASELINE.md: 651 ms/batch, vision-bound).

This cache keys each image by a content digest and keeps its ENCODED feature
tokens (post vision tower + connector/projector, ``models/lvlm.py``
``encode_images``) on device:

- hits skip the vision tower entirely (and, in the runner path, the
  host→device pixel transfer);
- misses are encoded in ONE batched call, padded to power-of-two bucket sizes
  so repeated calls reuse compiled programs;
- entries are LRU-evicted under a byte budget (``max_bytes``) so a long eval
  cannot exhaust the 16 GB chip.

Bit-exactness: a cached feature is the output of the same encode function on
the same input, so every occurrence of a support image sees IDENTICAL
features.  ``tests/test_feature_cache.py`` asserts cached and uncached eval
produce identical records end-to-end.

Inline-splice families only (idefics2 / llava): idefics1's cross-attention
consumes image states every decode step with its own masking and is excluded
(as in ``serve/engine.py``).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .lvlm import encode_images

# key for an all-zero padding slot (pixel_mask == 0); its features are never
# gathered by splice_image_embeds, so one shared entry per shape suffices
_PAD = "pad"


def image_key(img: Any) -> Tuple:
    """Content digest of a source image (PIL image or array-like).

    Hashing the SOURCE (pre-processing) is cheap (raw uint8 bytes) and
    subsumes the processed pixels and patch mask: one processor configuration
    per runner makes processing deterministic in the source.
    """
    if img is None:
        return (_PAD,)
    if hasattr(img, "mode") and hasattr(img, "tobytes"):  # PIL duck type
        return (
            "pil", img.mode, tuple(img.size),
            hashlib.blake2b(img.tobytes(), digest_size=16).digest(),
        )
    arr = np.ascontiguousarray(np.asarray(img))
    return (
        "arr", arr.shape, str(arr.dtype),
        hashlib.blake2b(arr.tobytes(), digest_size=16).digest(),
    )


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _encode_batch(params, cfg: ModelConfig, pixels, patch_mask, attn_impl):
    """[M,1,H,W,C] (+ optional [M,1,nh,nw]) → per-image features [M,S,D]."""
    return encode_images(params, cfg, pixels, patch_mask, attn_impl=attn_impl)


class VisionFeatureCache:
    """LRU image-key → encoded-feature store (device-resident)."""

    def __init__(self, max_bytes: int = 512 * 1024 * 1024):
        self.max_bytes = max_bytes
        self._store: "OrderedDict[Tuple, jnp.ndarray]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self._store)

    @property
    def nbytes(self) -> int:
        return self._bytes

    def clear(self) -> None:
        self._store.clear()
        self._bytes = 0

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0

    # -- core ---------------------------------------------------------------

    def get_features(
        self,
        params: Dict[str, Any],
        cfg: ModelConfig,
        pixel_values: np.ndarray,            # [B,N,H,W,C] (np or jnp)
        patch_mask: Optional[np.ndarray],    # [B,N,nh,nw] or None
        keys: Sequence[Tuple],               # flat, length B*N (row-major)
        attn_impl: str = "xla",
    ) -> jnp.ndarray:
        """Assemble [B, N*S, D] image features, encoding only cache misses.

        ``keys[b*N + i]`` identifies ``pixel_values[b, i]``; use ``(_PAD,)``
        (``image_key(None)``) for padding slots.  Misses — deduplicated within
        the batch, so a demo image repeated across contexts encodes once even
        on a cold cache — are encoded in one call padded to a power-of-two
        row count; hits never touch the vision tower.
        """
        if cfg.family == "idefics1":
            raise ValueError("feature cache does not support cross-attention families")
        B, N = pixel_values.shape[:2]
        keys = list(keys)
        if len(keys) != B * N:
            raise ValueError(f"{len(keys)} keys for {B}x{N} images")

        # ordered-unique miss keys with a representative flat index each;
        # hit entries are touched NOW so this batch's working set is MRU and
        # cannot be evicted by the insert below
        miss_order: "OrderedDict[Tuple, int]" = OrderedDict()
        for flat, k in enumerate(keys):
            if k in self._store:
                self._store.move_to_end(k)
            elif k not in miss_order:
                miss_order[k] = flat
        self.misses += len(miss_order)
        self.hits += len(keys) - len(miss_order)

        if miss_order:
            M = len(miss_order)
            Mp = _next_pow2(M)
            shape = pixel_values.shape[2:]
            px_host = np.asarray(pixel_values).reshape((B * N,) + shape)
            px = np.zeros((Mp, 1) + shape, px_host.dtype)
            pm = None
            if patch_mask is not None:
                pm_host = np.asarray(patch_mask).reshape((B * N,) + patch_mask.shape[2:])
                pm = np.zeros((Mp, 1) + pm_host.shape[1:], pm_host.dtype)
            for j, flat in enumerate(miss_order.values()):
                px[j, 0] = px_host[flat]
                if pm is not None:
                    pm[j, 0] = pm_host[flat]
            feats = _encode_batch(
                params, cfg, jnp.asarray(px),
                jnp.asarray(pm) if pm is not None else None, attn_impl,
            )  # [Mp, S, D]
            entry_bytes = int(feats[0].size) * feats.dtype.itemsize
            for j, k in enumerate(miss_order):
                self._store[k] = feats[j]
                self._bytes += entry_bytes

        slices: List[jnp.ndarray] = []
        for k in keys:
            feat = self._store[k]
            self._store.move_to_end(k)
            slices.append(feat)
        out = jnp.stack(slices)  # [B*N, S, D]

        # evict AFTER assembly: this batch's whole working set (hits AND new
        # misses, all MRU by now) stays resident while it is being used; a
        # byte budget smaller than one batch evicts oldest-first afterwards
        while self._bytes > self.max_bytes and len(self._store) > 1:
            _, old = self._store.popitem(last=False)
            self._bytes -= int(old.size) * old.dtype.itemsize

        S, D = out.shape[1], out.shape[2]
        return out.reshape(B, N * S, D)
