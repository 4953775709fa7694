"""Serve engine vs static batching on EOS-variable traffic (round-5 VERDICT #3).

The round-4 serve bench used uniform max_new_tokens=10 with no EOS variance —
exactly the workload where deterministic slot lifetimes cost nothing.  Real
traffic gives every request a BUDGET (max_new_tokens) but generations END at
EOS, early and unevenly.  This bench builds that workload honestly:

- the model's unembedding EOS column is scaled so greedy decode emits EOS
  organically (geometric-ish actual lengths, measured and printed) — both
  paths see identical dynamics;
- 64 text requests, prompt lengths uniform [96, 512), max_new_tokens = 64;
- **static** = the reference's batch-of-16 shape (pad to 512) with
  HF-``generate`` early-stopping semantics at chunk granularity: decode runs
  in compiled 8-step chunks and the host stops a batch once every row has
  emitted EOS (reads pipelined one chunk behind, so the check does not stall
  the device).  This is a STRONGER baseline than the reference's actual
  fixed-length loop;
- **engine** = 32 slots with early-EOS slot reclamation
  (``serve/engine.py``), and with ``reclaim=False`` for contrast.

Usage: ``python scripts/bench_serve_varlen.py``
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def build_eos_model(eos_scale=4.0):
    """bench_serve's 1B text model with the EOS unembedding column scaled so
    greedy decode emits EOS with a per-step probability in the ~0.05-0.2 range
    (variable actual lengths under a fixed budget)."""
    from bench_serve import build_text_model

    cfg, params, tk = build_text_model()
    head = params["lm"]["lm_head"]  # [D, V]
    params["lm"]["lm_head"] = head.at[:, tk.eos_token_id].set(
        head[:, tk.eos_token_id] * eos_scale
    )
    return cfg, params, tk


def make_requests(n=64, lo=96, hi=512, budget=64, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(lo, hi, size=n)
    return [
        (rng.integers(300, 32000, size=L).astype(np.int32), budget) for L in lens
    ]


# -- static path: chunked early-stop greedy (HF all-finished semantics) -------

def make_static_chunked(cfg, params, tk, bucket, budget, chunk):
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.generate import _prefill
    from mimic_tpu.models.lvlm import LVLMBatch, lvlm_forward

    pad, eos = tk.pad_token_id, tk.eos_token_id
    total = bucket + budget

    @jax.jit
    def prefill(params, ids, mask):
        batch = LVLMBatch(input_ids=ids, attention_mask=mask)
        last_logits, cache, _ = _prefill(
            params, cfg, batch, total, None, None, 1.0, "unmasked",
            jnp.bfloat16, "flash" if jax.default_backend() == "tpu" else "xla",
        )
        first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        n_real = jnp.sum(mask, axis=-1)
        B = ids.shape[0]
        mask_full = jnp.concatenate(
            [mask, jnp.zeros((B, budget), mask.dtype)], axis=-1
        )
        return first, cache, n_real, mask_full

    @partial(jax.jit, donate_argnums=(2, 3, 4, 5))
    def chunk_steps(params, i0, tok, cache, mask_full, fin, n_real):
        """``chunk`` greedy steps starting at generated-position i0
        (mirrors ``greedy_generate``'s step body exactly)."""

        def one(carry, i):
            tok, cache, mask_full, fin = carry
            tok = jnp.where(fin, pad, tok)
            mask_full = mask_full.at[:, bucket + i].set(1)
            step_batch = LVLMBatch(input_ids=tok[:, None], attention_mask=mask_full)
            out = lvlm_forward(
                params, cfg, step_batch,
                position_ids=(n_real + i)[:, None],
                kv_cache=cache, kv_total_len=total,
            )
            fin = fin | (tok == eos)
            nxt = jnp.argmax(out.logits[:, -1], axis=-1).astype(jnp.int32)
            nxt = jnp.where(fin, pad, nxt)
            return (nxt, out.decoder.kv_cache, mask_full, fin), tok

        (tok, cache, mask_full, fin), toks = jax.lax.scan(
            one, (tok, cache, mask_full, fin), i0 + jnp.arange(chunk)
        )
        return tok, cache, mask_full, fin, toks  # toks [chunk, B]

    def run_batch(chunk_reqs):
        B = len(chunk_reqs)
        ids = np.full((B, bucket), pad, np.int32)
        mask = np.zeros((B, bucket), np.int32)
        for i, (p, _) in enumerate(chunk_reqs):
            ids[i, bucket - len(p):] = p
            mask[i, bucket - len(p):] = 1
        first, cache, n_real, mask_full = prefill(
            params, jnp.asarray(ids), jnp.asarray(mask)
        )
        tok = first
        fin = jnp.zeros((B,), bool)
        chunks = [first[None]]  # device arrays, pulled lazily
        fin_host = np.zeros(B, bool)
        n_chunks = -(-(budget - 1) // chunk)
        issued = []
        for c in range(n_chunks):
            tok, cache, mask_full, fin, toks = chunk_steps(
                params, c * chunk, tok, cache, mask_full, fin, n_real
            )
            chunks.append(toks)
            issued.append(toks)
            # read ONE chunk behind: stop once every row has emitted EOS
            if len(issued) > 1:
                prev = np.asarray(issued[-2])
                fin_host |= (prev == eos).any(axis=0)
                if fin_host.all():
                    break
        return chunks

    return run_batch


def run_static(cfg, params, tk, reqs, batch_size=16, bucket=512, chunk=8):
    import jax
    import jax.numpy as jnp

    budget = reqs[0][1]
    run_batch = make_static_chunked(cfg, params, tk, bucket, budget, chunk)

    def sync(chunks):
        return float(np.asarray(jnp.sum(chunks[-1]).astype(jnp.float32)))

    print("compiling static chunked path...", flush=True)
    sync(run_batch(reqs[:batch_size]))

    t0 = time.perf_counter()
    all_tokens = []
    for i in range(0, len(reqs), batch_size):
        chunks = run_batch(reqs[i : i + batch_size])
        all_tokens.append(chunks)
    sync(all_tokens[-1])
    dt = time.perf_counter() - t0
    # decode results host-side (outside the timed region is fine for q/s, but
    # keep the pull inside like the engine's _collect does)
    lengths = []
    for chunks in all_tokens:
        toks = np.concatenate([np.asarray(c) for c in chunks], axis=0)  # [steps,B]
        for b in range(toks.shape[1]):
            seq = toks[:, b].tolist()
            lengths.append(seq.index(tk.eos_token_id) if tk.eos_token_id in seq else len(seq))
    return len(reqs) / dt, lengths


def run_engine(cfg, params, tk, reqs, num_slots=32, reclaim=True):
    from mimic_tpu.serve.engine import ServeEngine, ServeRequest

    eng = ServeEngine(
        cfg, params, num_slots=num_slots, max_len=576,
        prefill_buckets=(128, 256, 512), decode_block=8,
        eos_token_id=tk.eos_token_id, reclaim=reclaim,
    )
    print(f"compiling engine paths (reclaim={reclaim})...", flush=True)
    for uid, (p, n) in enumerate(reqs):
        eng.submit(ServeRequest(uid=uid, input_ids=p, max_new_tokens=n))
    eng.run()
    eng.reclaimed_blocks = eng.blocks_run = 0  # report the measured run only

    t0 = time.perf_counter()
    for uid, (p, n) in enumerate(reqs):
        eng.submit(ServeRequest(uid=uid, input_ids=p, max_new_tokens=n))
    results = eng.run()
    dt = time.perf_counter() - t0
    return len(reqs) / dt, results, eng


def main():
    _enable_compile_cache()
    print("building EOS-variable model...", flush=True)
    cfg, params, tk = build_eos_model()
    reqs = make_requests()

    static_qps, lengths = run_static(cfg, params, tk, reqs)
    print(
        f"static chunked early-stop: {static_qps:.1f} q/s  "
        f"(actual lengths mean {np.mean(lengths):.1f}, "
        f"p50 {np.percentile(lengths, 50):.0f}, max {np.max(lengths)})",
        flush=True,
    )

    eng_qps, results, eng = run_engine(cfg, params, tk, reqs, reclaim=True)
    elens = [len(r.tokens) for r in results]
    print(
        f"engine (reclaim): {eng_qps:.1f} q/s  "
        f"(reclaimed {eng.reclaimed_blocks} blocks, ran {eng.blocks_run})",
        flush=True,
    )
    print(f"engine lengths mean {np.mean(elens):.1f}", flush=True)

    eng0_qps, _, eng0 = run_engine(cfg, params, tk, reqs, reclaim=False)
    print(
        f"engine (no reclaim): {eng0_qps:.1f} q/s (ran {eng0.blocks_run} blocks)",
        flush=True,
    )
    print(
        f"speedup engine/static: {eng_qps / static_qps:.2f}x; "
        f"reclaim on/off: {eng_qps / eng0_qps:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
