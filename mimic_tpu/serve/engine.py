"""Continuous-batching serving engine: fixed decode slots + bucketed prefill.

Beyond the reference's scope (its eval loop is static batches through HF
``generate``, ``src/dataset_utils/interface.py:152-190``); this is the natural
TPU serving shape once a model fits one chip:

- **S decode slots** share one compiled single-token decode program.  Every
  slot sits at its own sequence length — the decoder writes new KV at
  per-slot positions (``cache_write_pos``) and attends under per-slot key
  masks, so a new request joins mid-flight without recompiling or waiting for
  the batch to drain.
- **Bucketed prefill admission**: prompts pad to a small set of length
  buckets (one compiled prefill per bucket × admitted-count), then their KV
  block is spliced into a free slot.  Mixed prompt lengths stop costing
  max-length padding for the whole batch — the static-batch tax this engine
  exists to remove.
- Everything runs on one device stream: the host loop interleaves admissions
  with blocks of decode steps and syncs once per block, not per token.

Greedy decode (serving); the MimIC shift stays active when ``shift`` is set
(μ-gate consumes the masked log-normalizer — empty slot positions are not real
pad tokens, so ``logz2="masked"`` semantics apply here by construction).
IDEFICS-1 is not supported (cross-attention needs image states every step).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.lvlm import LVLMBatch, lvlm_forward
from ..models.generate import _prefill


@dataclass
class ServeRequest:
    uid: int
    input_ids: np.ndarray               # [T] prompt token ids (unpadded)
    pixel_values: Optional[np.ndarray] = None  # [N,H,W,C]
    patch_mask: Optional[np.ndarray] = None
    max_new_tokens: int = 10


@dataclass
class ServeResult:
    uid: int
    tokens: List[int] = field(default_factory=list)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class ServeEngine:
    """One-chip continuous-batching server over a fixed slot pool."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Dict[str, Any],
        *,
        num_slots: int = 16,
        max_len: int = 1024,
        prefill_buckets: Sequence[int] = (128, 256, 512),
        decode_block: int = 4,
        shift: Optional[Dict[str, jnp.ndarray]] = None,
        eos_token_id: Optional[int] = None,
        decode_params: Optional[Dict[str, Any]] = None,
    ):
        if cfg.family == "idefics1":
            raise ValueError("serve engine does not support cross-attention families")
        self.cfg = cfg
        self.params = params
        self.decode_params = decode_params if decode_params is not None else params
        self.shift = shift
        self.S = num_slots
        self.T = max_len
        self.buckets = tuple(sorted(prefill_buckets))
        self.decode_block = decode_block
        self.eos = eos_token_id if eos_token_id is not None else cfg.eos_token_id

        dtype = jnp.bfloat16
        for leaf in jax.tree.leaves(params):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                dtype = leaf.dtype
                break
        L = cfg.text.num_layers
        Hkv, Dh = cfg.text.num_kv_heads, cfg.text.head_size
        self._cache = {
            "k": jnp.zeros((L, self.S, self.T, Hkv, Dh), dtype),
            "v": jnp.zeros((L, self.S, self.T, Hkv, Dh), dtype),
            "length": jnp.asarray(self.T, jnp.int32),
        }
        # per-slot host state
        self._len = np.zeros(self.S, np.int32)        # tokens incl. next input
        self._alive = np.zeros(self.S, bool)
        self._budget = np.zeros(self.S, np.int32)
        self._req: List[Optional[ServeResult]] = [None] * self.S
        # device-side per-slot state
        self._valid = jnp.zeros((self.S, self.T + 1), jnp.int32)
        self._tok = jnp.zeros((self.S,), jnp.int32)
        self._pos = jnp.zeros((self.S,), jnp.int32)   # cache write column
        self._rpos = jnp.zeros((self.S,), jnp.int32)  # RoPE position (real tokens)
        self._uid = itertools.count()
        self._pending: List[ServeRequest] = []
        self._done: List[ServeResult] = []

    # -- compiled programs ---------------------------------------------------

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(3, 4, 5, 6, 7))
    def _decode_steps(self, dparams, shift, cache, valid, tok, pos, rpos):
        """Advance every slot ``decode_block`` tokens in one program.

        ``pos`` is the cache write column (prompt bucket + generated count);
        ``rpos`` is the RoPE position (count of REAL tokens — left padding
        does not advance it), matching ``positions_from_mask`` semantics.
        """

        def one(carry, _):
            cache, valid, tok, pos, rpos = carry
            batch = LVLMBatch(input_ids=tok[:, None], attention_mask=valid)
            out = lvlm_forward(
                dparams, self.cfg, batch,
                position_ids=rpos[:, None],
                kv_cache=cache,
                kv_total_len=self.T + 1,
                shift=shift,
                logz2="masked",
                cache_write_pos=pos,
            )
            next_tok = jnp.argmax(out.logits[:, -1], axis=-1).astype(jnp.int32)
            # the just-processed token is now in the cache: open its mask slot
            valid = valid.at[jnp.arange(self.S), pos].set(1)
            return (
                (out.decoder.kv_cache, valid, next_tok, pos + 1, rpos + 1),
                next_tok,
            )

        (cache, valid, tok, pos, rpos), toks = jax.lax.scan(
            one, (cache, valid, tok, pos, rpos), None, length=self.decode_block
        )
        return cache, valid, tok, pos, rpos, toks  # toks [decode_block, S]

    @partial(jax.jit, static_argnums=(0, 2))
    def _prefill_bucket(self, params, bucket, ids, mask, pixels, pixel_mask, patch_mask):
        batch = LVLMBatch(
            input_ids=ids, attention_mask=mask,
            pixel_values=pixels, pixel_mask=pixel_mask, patch_mask=patch_mask,
        )
        last_logits, cache, _ = _prefill(
            params, self.cfg, batch, bucket, self.shift, None, 1.0, "masked",
            self._cache["k"].dtype, "xla",
        )
        first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        return cache["k"], cache["v"], first

    @partial(jax.jit, static_argnums=(0,))
    def _insert(self, cache, valid, tok, pos, rpos, slot, k_new, v_new, n_valid,
                n_real, first_tok):
        """Splice one prefilled request into slot ``slot``."""
        k = jax.lax.dynamic_update_slice(
            cache["k"], k_new[:, None], (0, slot, 0, 0, 0)
        )
        v = jax.lax.dynamic_update_slice(
            cache["v"], v_new[:, None], (0, slot, 0, 0, 0)
        )
        row = (jnp.arange(self.T + 1) < n_valid).astype(jnp.int32)
        row = row.at[self.T].set(1)  # current-token column always attendable
        valid = jax.lax.dynamic_update_slice(valid, row[None], (slot, 0))
        tok = tok.at[slot].set(first_tok)
        pos = pos.at[slot].set(n_valid)
        rpos = rpos.at[slot].set(n_real)
        return {"k": k, "v": v, "length": cache["length"]}, valid, tok, pos, rpos

    # -- host API --------------------------------------------------------------

    def submit(self, req: ServeRequest) -> int:
        bucket = self._bucket_for(len(req.input_ids))
        if bucket + req.max_new_tokens > self.T:
            raise ValueError(
                f"bucket {bucket} + max_new_tokens {req.max_new_tokens} "
                f"exceeds slot capacity {self.T}"
            )
        self._pending.append(req)
        return req.uid

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds largest bucket {self.buckets[-1]}")

    def _admit(self) -> None:
        free = [s for s in range(self.S) if not self._alive[s]]
        if not free or not self._pending:
            return
        # group admissible requests by bucket (one prefill program per bucket)
        by_bucket: Dict[int, List[ServeRequest]] = {}
        take = min(len(free), len(self._pending))
        for req in self._pending[:take]:
            by_bucket.setdefault(self._bucket_for(len(req.input_ids)), []).append(req)
        self._pending = self._pending[take:]

        for bucket, reqs in by_bucket.items():
            A = len(reqs)
            ids = np.zeros((A, bucket), np.int32)
            mask = np.zeros((A, bucket), np.int32)
            pixels = None
            pixel_mask = None
            patch_mask = None
            if any(r.pixel_values is not None for r in reqs):
                shape = next(
                    r.pixel_values.shape for r in reqs if r.pixel_values is not None
                )
                pixels = np.zeros((A,) + shape, np.float32)
                pixel_mask = np.zeros((A, shape[0]), np.int32)
                if any(r.patch_mask is not None for r in reqs):
                    pshape = next(
                        r.patch_mask.shape for r in reqs if r.patch_mask is not None
                    )
                    patch_mask = np.zeros((A,) + pshape, np.int32)
            for a, r in enumerate(reqs):
                n = len(r.input_ids)
                ids[a, bucket - n:] = r.input_ids  # left padding
                mask[a, bucket - n:] = 1
                if pixels is not None and r.pixel_values is not None:
                    pixels[a] = r.pixel_values
                    pixel_mask[a] = 1
                    if patch_mask is not None and r.patch_mask is not None:
                        patch_mask[a] = r.patch_mask
            k, v, first = self._prefill_bucket(
                self.params, bucket,
                jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(pixels) if pixels is not None else None,
                jnp.asarray(pixel_mask) if pixel_mask is not None else None,
                jnp.asarray(patch_mask) if patch_mask is not None else None,
            )
            first_host = np.asarray(first)
            for a, r in enumerate(reqs):
                slot = free.pop(0)
                # left-padded prefill: valid KV occupies columns [0, bucket) of
                # the slot; padding columns are masked off via the valid row
                n = len(r.input_ids)
                (self._cache, self._valid, self._tok, self._pos,
                 self._rpos) = self._insert(
                    self._cache, self._valid, self._tok, self._pos, self._rpos,
                    jnp.asarray(slot, jnp.int32),
                    k[:, a], v[:, a],
                    jnp.asarray(bucket, jnp.int32),
                    jnp.asarray(n, jnp.int32),
                    first[a],
                )
                # mask out the left-pad columns (insert marked [0, bucket) valid)
                if n < bucket:
                    row = np.zeros(self.T + 1, np.int32)
                    row[bucket - n: bucket] = 1
                    row[self.T] = 1
                    self._valid = self._valid.at[slot].set(jnp.asarray(row))
                self._len[slot] = bucket + 1
                self._alive[slot] = True
                self._budget[slot] = r.max_new_tokens - 1  # first token done
                res = ServeResult(uid=r.uid)
                res.tokens.append(int(first_host[a]))
                self._req[slot] = res
                if first_host[a] == self.eos or self._budget[slot] <= 0:
                    self._retire(slot)

    def _retire(self, slot: int) -> None:
        self._alive[slot] = False
        res = self._req[slot]
        if res is not None:
            if res.tokens and res.tokens[-1] == self.eos:
                res.tokens = res.tokens[:-1]
            self._done.append(res)
            self._req[slot] = None

    def run(self) -> List[ServeResult]:
        """Process all submitted requests to completion; returns results
        ordered by uid."""
        while self._pending or self._alive.any():
            self._admit()
            if not self._alive.any():
                continue
            (self._cache, self._valid, self._tok, self._pos, self._rpos,
             toks) = self._decode_steps(
                self.decode_params, self.shift, self._cache, self._valid,
                self._tok, self._pos, self._rpos,
            )
            toks_host = np.asarray(toks)  # [decode_block, S] — one sync per block
            for step in range(self.decode_block):
                for s in range(self.S):
                    if not self._alive[s] or self._budget[s] <= 0:
                        continue
                    t = int(toks_host[step, s])
                    res = self._req[s]
                    res.tokens.append(t)
                    self._len[s] += 1
                    self._budget[s] -= 1
                    if t == self.eos or self._budget[s] <= 0:
                        self._retire(s)
        return sorted(self._done, key=lambda r: r.uid)
