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
- **Stall-free scheduling** (round-4 redesign): slot lifetimes are
  scheduled DETERMINISTICALLY — a request occupies its slot for at most
  ``ceil((max_new_tokens-1)/decode_block)`` decode blocks — so the host
  enqueues every admission and decode block without waiting on the device.
  EOS is handled *in-program* (a per-slot ``finished`` flag pads subsequent
  tokens, same semantics as ``greedy_generate``) and the generated tokens are
  pulled in ONE device→host sync at the end of ``run()``.  On a remote-tunnel
  TPU this is the difference between RTT-bound (~2 q/s) and device-bound
  throughput; on a local chip it removes the per-block latency bubble.
- **Early-EOS slot reclamation** (round-5, ``reclaim=True`` default): the
  host additionally reads each issued block's tokens ONE BLOCK BEHIND the
  device — the transfer overlaps the in-flight block's compute, so the
  pipeline never stalls — and frees slots whose request already emitted EOS
  instead of letting them burn their remaining scheduled blocks.  On
  EOS-variable traffic (long ``max_new_tokens`` budgets, short actual
  generations) this is the continuous-batching win; at uniform short budgets
  the reader finds nothing and costs nothing on the device stream.

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
    # precomputed encoded image features (``encode_images`` output for this
    # request's images, e.g. from ``models/feature_cache.py``), as either
    #   - an array [N*S, D], or
    #   - ``(base, row)`` — row ``row`` of a SHARED batched array
    #     [R, N*S, D]; requests sharing one base admit with a single
    #     ``jnp.take`` per wave instead of per-request slices + stack
    #     (each extra dispatch costs real latency on a remote-tunnel TPU).
    # Decouples vision encoding from prefill admission: waves are small
    # (pow2-padded slot fills), where in-wave vision encode runs at poor
    # batch efficiency.  Encode ahead of submission, batched and cached.
    image_feats: Optional[Any] = None


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
        reclaim: bool = True,
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
        # slot S (one extra) is a scratch slot: admission waves pad their row
        # count to powers of two (bounding compiled program variants) and the
        # pad rows splice into the scratch slot, never scheduled for decode
        self.Sp = self.S + 1
        self._cache = {
            "k": jnp.zeros((L, self.Sp, self.T, Hkv, Dh), dtype),
            "v": jnp.zeros((L, self.Sp, self.T, Hkv, Dh), dtype),
            "length": jnp.asarray(self.T, jnp.int32),
        }
        # per-slot host state (deterministic schedule — never read from device)
        self._len = np.zeros(self.S, np.int32)        # tokens incl. next input
        self._alive = np.zeros(self.S, bool)
        self._blocks_left = np.zeros(self.S, np.int64)
        # device-side per-slot state
        self._valid = jnp.zeros((self.Sp, self.T + 1), jnp.int32)
        self._tok = jnp.zeros((self.Sp,), jnp.int32)
        self._pos = jnp.zeros((self.Sp,), jnp.int32)  # cache write column
        self._rpos = jnp.zeros((self.Sp,), jnp.int32)  # RoPE position (real tokens)
        self._fin = jnp.zeros((self.Sp,), bool)       # in-program EOS flag
        self._uid = itertools.count()
        self._pending: List[ServeRequest] = []
        # claims: (uid, first_ref=(wave_idx, row), start_chunk, budget, slot)
        self._claims: List[tuple] = []
        self._firsts: List[jnp.ndarray] = []          # per-admission first tokens
        self._chunks: List[jnp.ndarray] = []          # per-block toks [block, S]
        # early-EOS slot reclamation (round-5): the host reads each issued
        # block's tokens ONE BLOCK BEHIND the device (the read overlaps the
        # next block's compute, so the zero-stall pipeline is kept) and frees
        # slots whose tenant already emitted EOS instead of letting them burn
        # their remaining scheduled blocks.  ``_tenant[slot]`` is the claim
        # index currently occupying the slot — chunk rows are attributed to
        # the tenant that owned the slot for those steps, so a reused slot's
        # old data can never free the new tenant.
        self.reclaim = reclaim
        self._tenant: Dict[int, int] = {}
        self.reclaimed_blocks = 0                     # scheduled blocks saved
        self.blocks_run = 0                           # decode blocks issued

    # -- compiled programs ---------------------------------------------------

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(3, 4, 5, 6, 7, 8))
    def _decode_steps(self, dparams, shift, cache, valid, tok, pos, rpos, fin):
        """Advance every slot ``decode_block`` tokens in one program.

        ``pos`` is the cache write column (prompt bucket + generated count);
        ``rpos`` is the RoPE position (count of REAL tokens — left padding
        does not advance it), matching ``positions_from_mask`` semantics.
        ``fin`` carries EOS in-program (``greedy_generate`` semantics: once a
        slot emits EOS, every later token is pad) so the host never reads
        tokens mid-flight.
        """
        pad = self.cfg.pad_token_id

        def one(carry, _):
            cache, valid, tok, pos, rpos, fin = carry
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
            fin = fin | (tok == self.eos)
            next_tok = jnp.argmax(out.logits[:, -1], axis=-1).astype(jnp.int32)
            next_tok = jnp.where(fin, pad, next_tok)
            # the just-processed token is now in the cache: open its mask slot
            valid = valid.at[jnp.arange(self.Sp), pos].set(1)
            # retired / freed-but-unreused slots keep stepping: clamp pos at T
            # so the valid-mask write stays in range (column T is the
            # always-attendable current-token column, already 1).  The k/v
            # scatter at column T is then a DELIBERATE out-of-bounds drop
            # (JAX scatter update semantics) — prefill fully resets the row on
            # slot reuse, so nothing downstream reads those columns.
            return (
                (out.decoder.kv_cache, valid, next_tok,
                 jnp.minimum(pos + 1, self.T), rpos + 1, fin),
                next_tok,
            )

        (cache, valid, tok, pos, rpos, fin), toks = jax.lax.scan(
            one, (cache, valid, tok, pos, rpos, fin), None,
            length=self.decode_block,
        )
        return cache, valid, tok, pos, rpos, fin, toks  # toks [decode_block, S]

    @partial(jax.jit, static_argnums=(0, 2), donate_argnums=(3, 4, 5, 6, 7, 8))
    def _prefill_insert(
        self, params, bucket, cache, valid, tok, pos, rpos, fin,
        packed, pixels, pixel_mask, patch_mask, feats=None,
    ):
        """Prefill one admission wave (A rows, one bucket) and splice every
        row into its slot — ONE device dispatch per (bucket, A) wave.

        ``packed`` [A, bucket+3] int32 carries the whole wave in ONE
        host→device transfer (each small transfer costs a tunnel round-trip,
        ~25 ms measured): columns [0, bucket) are the left-padded prompt ids,
        then slot index (pad rows point at the scratch slot ``self.S``),
        left-pad count, and real-token count.  The attention mask is derived
        from the pad count in-program.  The per-row splices unroll inside the
        trace, so the prefilled KV never round-trips through HBM-visible
        outputs between programs.
        """
        ids = packed[:, :bucket]
        slots = packed[:, bucket]
        n_pads = packed[:, bucket + 1]
        n_reals = packed[:, bucket + 2]
        mask = (
            jnp.arange(bucket)[None, :] >= n_pads[:, None]
        ).astype(jnp.int32)
        batch = LVLMBatch(
            input_ids=ids, attention_mask=mask,
            pixel_values=pixels, pixel_mask=pixel_mask, patch_mask=patch_mask,
        )
        # flash prefill on TPU: buckets are 128-multiples and decoder head
        # sizes lane-aligned, so the Pallas path applies (measured ~2× over
        # XLA sdpa at the 512-bucket prefill shape — the same dispatch the
        # static eval path uses)
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
        last_logits, pcache, _ = _prefill(
            params, self.cfg, batch, bucket, self.shift, None, 1.0, "masked",
            self._cache["k"].dtype, impl, image_feats=feats,
        )
        first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

        A = ids.shape[0]
        col = jnp.arange(self.T + 1)
        k, v = cache["k"], cache["v"]
        for a in range(A):  # unrolled: A is a static shape dimension
            slot = slots[a]
            k = jax.lax.dynamic_update_slice(
                k, pcache["k"][:, a][:, None], (0, slot, 0, 0, 0)
            )
            v = jax.lax.dynamic_update_slice(
                v, pcache["v"][:, a][:, None], (0, slot, 0, 0, 0)
            )
            row = ((col >= n_pads[a]) & (col < bucket)).astype(jnp.int32)
            row = row.at[self.T].set(1)  # current-token column always attendable
            valid = jax.lax.dynamic_update_slice(valid, row[None], (slot, 0))
            tok = tok.at[slot].set(first[a])
            pos = pos.at[slot].set(bucket)
            rpos = rpos.at[slot].set(n_reals[a])
            fin = fin.at[slot].set(first[a] == self.eos)
        return (
            {"k": k, "v": v, "length": cache["length"]},
            valid, tok, pos, rpos, fin, first,
        )

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

    def _admit(self) -> List[tuple]:
        """Admit pending requests into free slots; returns the new waves'
        unread-first records (for the reclamation reader)."""
        new_items: List[tuple] = []
        free = [s for s in range(self.S) if not self._alive[s]]
        if not free or not self._pending:
            return new_items
        # bucket-major admission: fill the wave from the deepest bucket queues
        # first, so a wave needs as few distinct prefill programs (= device
        # dispatches) as possible.  Within a bucket, arrival order is kept;
        # across buckets strict arrival order is traded for dispatch count —
        # bounded unfairness: every pending request is admitted within
        # #buckets waves.
        queues: Dict[int, List[int]] = {}  # bucket -> pending-list indices
        for i, req in enumerate(self._pending):
            queues.setdefault(self._bucket_for(len(req.input_ids)), []).append(i)
        by_bucket: Dict[int, List[ServeRequest]] = {}
        room = len(free)
        taken: set = set()
        for bucket in sorted(queues, key=lambda b: -len(queues[b])):
            if room <= 0:
                break
            take = queues[bucket][:room]
            by_bucket[bucket] = [self._pending[i] for i in take]
            taken.update(take)
            room -= len(take)
        # remove admitted entries by POSITION: the same ServeRequest object
        # submitted twice is two queue entries, and only the admitted copy
        # leaves the queue (an id()-based filter would silently drop both)
        self._pending = [
            r for i, r in enumerate(self._pending) if i not in taken
        ]

        for bucket, reqs in by_bucket.items():
            # pad the wave to the next power of two (bounds compiled program
            # variants to log2(S)+1 per bucket); pad rows target the scratch slot
            A = 1
            while A < len(reqs):
                A *= 2
            packed = np.zeros((A, bucket + 3), np.int32)
            packed[:, bucket] = self.S  # default: scratch slot
            packed[:, bucket + 1] = bucket  # pad count (pad rows: all-pad)
            pixels = None
            pixel_mask = None
            patch_mask = None
            feats = None
            if any(r.image_feats is not None for r in reqs):
                # vision-decoupled admission: features were encoded ahead of
                # submission (batched/cached) — the wave prefill only splices
                if any(
                    r.pixel_values is not None and r.image_feats is None
                    for r in reqs
                ):
                    raise ValueError(
                        "one admission wave mixes precomputed image_feats with "
                        "raw pixel_values — encode all or none ahead of submit"
                    )
                shared = [
                    r.image_feats for r in reqs
                    if isinstance(r.image_feats, tuple)
                ]
                if len(shared) == sum(r.image_feats is not None for r in reqs) and (
                    shared and all(f[0] is shared[0][0] for f in shared)
                ):
                    # one shared base: a single gather builds the wave.
                    # Rows without images point at row 0 — splice never reads
                    # them (their prompts carry no image tokens).
                    base = shared[0][0]
                    idx = [
                        int(r.image_feats[1]) if r.image_feats is not None else 0
                        for r in reqs
                    ] + [0] * (A - len(reqs))
                    feats = jnp.take(base, jnp.asarray(idx, jnp.int32), axis=0)
                else:
                    first = next(
                        r.image_feats for r in reqs if r.image_feats is not None
                    )
                    f0 = jnp.asarray(
                        first[0][first[1]] if isinstance(first, tuple) else first
                    )
                    rows = []
                    for r in reqs:
                        f = r.image_feats
                        if f is None:
                            rows.append(jnp.zeros_like(f0))
                        elif isinstance(f, tuple):
                            rows.append(jnp.asarray(f[0][f[1]]))
                        else:
                            rows.append(jnp.asarray(f))
                    rows += [jnp.zeros_like(f0)] * (A - len(reqs))
                    feats = jnp.stack(rows)  # [A, N*S, D]
            elif any(r.pixel_values is not None for r in reqs):
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
            slots = np.full(A, self.S, np.int32)
            for a, r in enumerate(reqs):
                n = len(r.input_ids)
                packed[a, bucket - n : bucket] = r.input_ids  # left padding
                slots[a] = free.pop(0)
                packed[a, bucket] = slots[a]
                packed[a, bucket + 1] = bucket - n
                packed[a, bucket + 2] = n
                if pixels is not None and r.pixel_values is not None:
                    pixels[a] = r.pixel_values
                    pixel_mask[a] = 1
                    if patch_mask is not None and r.patch_mask is not None:
                        patch_mask[a] = r.patch_mask
            (self._cache, self._valid, self._tok, self._pos, self._rpos,
             self._fin, first) = self._prefill_insert(
                self.params, bucket,
                self._cache, self._valid, self._tok, self._pos, self._rpos,
                self._fin,
                jnp.asarray(packed),
                jnp.asarray(pixels) if pixels is not None else None,
                jnp.asarray(pixel_mask) if pixel_mask is not None else None,
                jnp.asarray(patch_mask) if patch_mask is not None else None,
                feats,
            )
            wave = len(self._firsts)
            self._firsts.append(first)  # device array — pulled once at the end
            entries = []
            for a, r in enumerate(reqs):
                slot = int(slots[a])
                self._len[slot] = bucket + 1
                budget = r.max_new_tokens - 1  # first token came from prefill
                blocks = -(-budget // self.decode_block) if budget > 0 else 0
                self._alive[slot] = blocks > 0
                self._blocks_left[slot] = blocks
                seq = len(self._claims)
                self._claims.append(
                    (r.uid, (wave, a), len(self._chunks), budget, slot)
                )
                self._tenant[slot] = seq
                entries.append((a, slot, seq))
            new_items.append(("first", wave, entries))
        return new_items

    def run(self) -> List[ServeResult]:
        """Process all submitted requests to completion; returns results
        ordered by uid.

        The loop issues work first — admissions and decode blocks enqueue on
        the device stream — then (``reclaim=True``) reads the tokens of
        everything issued EXCEPT the newest block, one block behind the
        device, so the read overlaps the in-flight block's compute instead of
        stalling the stream.  A slot whose tenant's read-back tokens contain
        EOS is freed immediately: its remaining scheduled blocks are never
        issued, and (with a queue) the slot re-admits a pending request a
        block later.  With ``reclaim=False`` lifetimes are fully deterministic
        and the only device→host sync is the final ``_collect`` pull."""
        unread: List[tuple] = []
        while self._pending or self._alive.any():
            unread.extend(self._admit())
            if self._alive.any():
                (self._cache, self._valid, self._tok, self._pos, self._rpos,
                 self._fin, toks) = self._decode_steps(
                    self.decode_params, self.shift, self._cache, self._valid,
                    self._tok, self._pos, self._rpos, self._fin,
                )
                self._chunks.append(toks)  # device array [decode_block, S]
                unread.append(("chunk", len(self._chunks) - 1))
                self.blocks_run += 1
                live = self._alive.nonzero()[0]
                self._blocks_left[live] -= 1
                self._alive[live] = self._blocks_left[live] > 0
            if self.reclaim and len(unread) > 1:
                for item in unread[:-1]:
                    self._reclaim_item(item)
                del unread[:-1]
        return self._collect()

    def _reclaim_item(self, item: tuple) -> None:
        """Scan one read-back record (a wave's first tokens or a decode
        block's chunk) for EOS and free the emitting slots early."""
        if item[0] == "first":
            _, wave, entries = item
            first = np.asarray(self._firsts[wave])
            for a, slot, seq in entries:
                if (
                    self._alive[slot]
                    and self._tenant.get(slot) == seq
                    and int(first[a]) == self.eos
                ):
                    self.reclaimed_blocks += int(self._blocks_left[slot])
                    self._alive[slot] = False
                    self._blocks_left[slot] = 0
        else:
            _, ci = item
            chunk = np.asarray(self._chunks[ci])  # [decode_block, Sp]
            lo = ci * self.decode_block
            for slot in range(self.S):
                if not self._alive[slot]:
                    continue
                seq = self._tenant.get(slot)
                if seq is None:
                    continue
                _, _, c0, budget, _ = self._claims[seq]
                if ci < c0:
                    continue  # chunk predates this tenant (slot was reused)
                start = max(lo, c0 * self.decode_block)
                stop = min(lo + self.decode_block, c0 * self.decode_block + budget)
                if stop <= start:
                    continue
                if (chunk[start - lo : stop - lo, slot] == self.eos).any():
                    self.reclaimed_blocks += int(self._blocks_left[slot])
                    self._alive[slot] = False
                    self._blocks_left[slot] = 0

    def _collect(self) -> List[ServeResult]:
        """ONE device→host sync: pull all block tokens + first tokens, then
        assemble per-request sequences (truncate at EOS, host-side)."""
        chunks = (
            np.asarray(jnp.concatenate(self._chunks, axis=0))
            if self._chunks else np.zeros((0, self.S), np.int32)
        )  # [total_steps, Sp]
        # one pull for ALL first tokens (device-side concat of ragged waves)
        if self._firsts:
            flat = np.asarray(jnp.concatenate([f.reshape(-1) for f in self._firsts]))
            firsts, off = [], 0
            for f in self._firsts:
                n = int(f.shape[0])
                firsts.append(flat[off : off + n])
                off += n
        else:
            firsts = []
        done = []
        for uid, (wave, a), c0, budget, slot in self._claims:
            toks = [int(firsts[wave][a])]
            if budget > 0:
                start = c0 * self.decode_block
                toks += [
                    int(t)
                    for t in chunks[start : start + budget, slot]
                ]
            if self.eos in toks:
                toks = toks[: toks.index(self.eos)]
            res = ServeResult(uid=uid)
            res.tokens = toks
            done.append(res)
        self._claims, self._firsts, self._chunks = [], [], []
        # stale tenant entries are harmless (the reclaim reader gates on
        # _alive, and _admit re-tenants every slot it fills) but would index
        # into the cleared claims list — drop them with the rest of run state
        self._tenant.clear()
        return sorted(done, key=lambda r: r.uid)
