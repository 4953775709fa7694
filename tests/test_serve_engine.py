"""Continuous-batching serve engine vs static greedy generation.

Each request's tokens must match a standalone unpadded ``greedy_generate`` of
the same prompt — slot reuse, bucketed left-padded prefill, per-slot cache
write positions, and mid-flight admission must all be invisible to results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.config import get_preset
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.generate import greedy_generate
from mimic_tpu.models.lvlm import LVLMBatch, init_lvlm_params
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.serve import ServeEngine, ServeRequest
from mimic_tpu.shift.params import init_shift_params


def _model(family="text"):
    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config(f"tiny-{family}")
    cfg = cfg.replace(
        image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id, eos_token_id=tk.eos_token_id,
        text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}),
    )
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    return cfg, params, tk


def _static_greedy(cfg, params, tk, ids, max_new, pixel_values=None, shift=None):
    batch = LVLMBatch(
        input_ids=jnp.asarray(ids[None].astype(np.int32)),
        attention_mask=jnp.ones((1, len(ids)), jnp.int32),
        pixel_values=(
            jnp.asarray(pixel_values[None]) if pixel_values is not None else None
        ),
        pixel_mask=(
            jnp.ones((1, pixel_values.shape[0]), jnp.int32)
            if pixel_values is not None else None
        ),
    )
    out = greedy_generate(
        params, cfg, batch, max_new_tokens=max_new,
        eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        shift=shift, logz2="masked",
    )
    toks = [int(t) for t in np.asarray(out.tokens)[0]]
    if tk.eos_token_id in toks:
        toks = toks[: toks.index(tk.eos_token_id)]
    return toks


class TestServeEngine:
    def test_mixed_lengths_match_static_greedy(self):
        cfg, params, tk = _model("text")
        rng = np.random.default_rng(0)
        lengths = [5, 11, 17, 26, 9, 30]
        prompts = [
            rng.integers(4, 250, size=(n,)).astype(np.int32) for n in lengths
        ]
        max_new = 6

        # 3 slots < 6 requests: forces retirement + mid-flight admission
        eng = ServeEngine(
            cfg, params, num_slots=3, max_len=64,
            prefill_buckets=(8, 16, 32), decode_block=2,
        )
        for i, p in enumerate(prompts):
            eng.submit(ServeRequest(uid=i, input_ids=p, max_new_tokens=max_new))
        results = eng.run()
        assert [r.uid for r in results] == list(range(len(prompts)))

        for r, p in zip(results, prompts):
            expect = _static_greedy(cfg, params, tk, p, max_new)
            assert r.tokens == expect, (r.uid, r.tokens, expect)

    def test_images_match_static_greedy(self):
        cfg, params, tk = _model("idefics2")
        rng = np.random.default_rng(1)
        prompts, images = [], []
        for n in (7, 13):
            ids = rng.integers(4, 250, size=(n,)).astype(np.int32)
            ids[1 : 1 + cfg.image_seq_len] = cfg.image_token_id
            prompts.append(ids)
            images.append(
                rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
            )
        eng = ServeEngine(
            cfg, params, num_slots=2, max_len=48, prefill_buckets=(16,),
            decode_block=3,
        )
        for i, (p, im) in enumerate(zip(prompts, images)):
            eng.submit(
                ServeRequest(uid=i, input_ids=p, pixel_values=im, max_new_tokens=5)
            )
        results = eng.run()
        for r, p, im in zip(results, prompts, images):
            expect = _static_greedy(cfg, params, tk, p, 5, pixel_values=im)
            assert r.tokens == expect

    def test_precomputed_feats_match_pixels(self):
        """Vision-decoupled admission: a request carrying precomputed
        ``image_feats`` (encode_images output) must decode exactly like the
        same request submitted with raw pixels."""
        from mimic_tpu.models.lvlm import encode_images
        import jax.numpy as jnp

        cfg, params, tk = _model("idefics2")
        rng = np.random.default_rng(4)
        prompts, images = [], []
        for n in (7, 13, 9):
            ids = rng.integers(4, 250, size=(n,)).astype(np.int32)
            ids[1 : 1 + cfg.image_seq_len] = cfg.image_token_id
            prompts.append(ids)
            images.append(rng.normal(size=(1, 28, 28, 3)).astype(np.float32))

        base = encode_images(
            params, cfg, jnp.asarray(np.stack(images)), None
        )  # [3, S, D] shared batched base

        def run(mode):
            eng = ServeEngine(
                cfg, params, num_slots=2, max_len=48, prefill_buckets=(16,),
                decode_block=3,
            )
            for i, (p, im) in enumerate(zip(prompts, images)):
                if mode == "feats":
                    feats = encode_images(params, cfg, jnp.asarray(im[None]), None)[0]
                    req = ServeRequest(
                        uid=i, input_ids=p, image_feats=feats, max_new_tokens=5
                    )
                elif mode == "shared":
                    req = ServeRequest(
                        uid=i, input_ids=p, image_feats=(base, i), max_new_tokens=5
                    )
                else:
                    req = ServeRequest(
                        uid=i, input_ids=p, pixel_values=im, max_new_tokens=5
                    )
                eng.submit(req)
            return [r.tokens for r in eng.run()]

        assert run("feats") == run("pixels")
        assert run("shared") == run("pixels")
        # and against standalone greedy
        for toks, p, im in zip(run("shared"), prompts, images):
            assert toks == _static_greedy(cfg, params, tk, p, 5, pixel_values=im)

    def test_shift_active(self):
        cfg, params, tk = _model("text")
        enc, _ = get_preset("mimic")
        shift = init_shift_params(enc, cfg.text, jax.random.PRNGKey(3))
        shift = jax.tree.map(
            lambda x: x + 0.05 * jnp.ones_like(x), shift["shift"]
            if "shift" in shift else shift
        )
        rng = np.random.default_rng(2)
        p = rng.integers(4, 250, size=(9,)).astype(np.int32)
        eng = ServeEngine(
            cfg, params, num_slots=2, max_len=48, prefill_buckets=(16,),
            shift=shift,
        )
        eng.submit(ServeRequest(uid=0, input_ids=p, max_new_tokens=5))
        (res,) = eng.run()
        expect = _static_greedy(cfg, params, tk, p, 5, shift=shift)
        assert res.tokens == expect
        # and the shift actually changes the output vs no-shift
        plain = _static_greedy(cfg, params, tk, p, 5)
        if plain == expect:
            pytest.skip("shift too small to change argmax on this seed")

    def test_capacity_guard(self):
        cfg, params, tk = _model("text")
        eng = ServeEngine(cfg, params, num_slots=1, max_len=20, prefill_buckets=(16,))
        with pytest.raises(ValueError, match="capacity"):
            eng.submit(
                ServeRequest(
                    uid=0, input_ids=np.arange(4, 10, dtype=np.int32),
                    max_new_tokens=8,
                )
            )

    def test_engine_reuse_two_runs(self):
        """Back-to-back run() calls on ONE engine (the warm-measure pattern
        the serve bench uses) must reset claim/chunk state and keep greedy
        parity on both runs."""
        cfg, params, tk = _model("text")
        rng = np.random.default_rng(5)
        prompts = [
            rng.integers(4, 250, size=(n,)).astype(np.int32) for n in (6, 14, 23)
        ]
        eng = ServeEngine(
            cfg, params, num_slots=2, max_len=64,
            prefill_buckets=(8, 16, 32), decode_block=3,
        )
        expect = [_static_greedy(cfg, params, tk, p, 5) for p in prompts]
        for _run in range(2):
            for i, p in enumerate(prompts):
                eng.submit(ServeRequest(uid=i, input_ids=p, max_new_tokens=5))
            results = eng.run()
            assert [r.uid for r in results] == [0, 1, 2]
            for r, e in zip(results, expect):
                assert r.tokens == e, (_run, r.uid, r.tokens, e)

    def test_reclaim_frees_slots_early(self):
        """EOS-heavy model + long budgets: the reclamation reader must free
        slots at EOS instead of burning the scheduled blocks, and results must
        still match static greedy (truncation semantics unchanged)."""
        cfg, params, tk = _model("text")
        # bias the unembedding ([D, V]: scale the EOS *column*) so EOS wins
        # argmax within a few steps
        head = params["lm"]["lm_head"]
        params["lm"]["lm_head"] = head.at[:, tk.eos_token_id].set(
            head[:, tk.eos_token_id] * 12.0
        )
        rng = np.random.default_rng(7)
        prompts = [
            rng.integers(4, 250, size=(n,)).astype(np.int32)
            for n in (5, 9, 13, 7, 11, 6)
        ]
        max_new = 24  # 12 blocks of 2 — mostly reclaimable

        def run(reclaim):
            eng = ServeEngine(
                cfg, params, num_slots=2, max_len=64,
                prefill_buckets=(16,), decode_block=2, reclaim=reclaim,
            )
            for i, p in enumerate(prompts):
                eng.submit(ServeRequest(uid=i, input_ids=p, max_new_tokens=max_new))
            res = eng.run()
            return res, eng

        res_on, eng_on = run(True)
        res_off, eng_off = run(False)
        expect = [_static_greedy(cfg, params, tk, p, max_new) for p in prompts]
        for r_on, r_off, e in zip(res_on, res_off, expect):
            assert r_on.tokens == e, (r_on.uid, r_on.tokens, e)
            assert r_off.tokens == e
        # the biased head must actually produce early EOS for this test to bite
        assert any(len(e) < max_new for e in expect)
        assert eng_on.reclaimed_blocks > 0
        assert eng_on.blocks_run < eng_off.blocks_run

    def test_duplicate_submission_processed_twice(self):
        """The SAME ServeRequest object submitted twice is two queue entries;
        with one slot only one fits the first wave — the second must not be
        silently dropped (round-4 ADVICE: id()-based dedup dropped both)."""
        cfg, params, tk = _model("text")
        rng = np.random.default_rng(8)
        p = rng.integers(4, 250, size=(9,)).astype(np.int32)
        req = ServeRequest(uid=0, input_ids=p, max_new_tokens=4)
        eng = ServeEngine(
            cfg, params, num_slots=1, max_len=32, prefill_buckets=(16,),
        )
        eng.submit(req)
        eng.submit(req)
        results = eng.run()
        assert len(results) == 2
        expect = _static_greedy(cfg, params, tk, p, 4)
        for r in results:
            assert r.tokens == expect

    def test_engine_max_new_one(self):
        """max_new_tokens=1: the request needs zero decode blocks — the slot
        must free immediately and the single prefill token must round-trip."""
        cfg, params, tk = _model("text")
        rng = np.random.default_rng(6)
        prompts = [
            rng.integers(4, 250, size=(n,)).astype(np.int32) for n in (5, 9, 12)
        ]
        eng = ServeEngine(
            cfg, params, num_slots=1, max_len=40, prefill_buckets=(16,),
        )
        for i, p in enumerate(prompts):
            eng.submit(ServeRequest(uid=i, input_ids=p, max_new_tokens=1))
        results = eng.run()
        assert len(results) == 3
        for r, p in zip(results, prompts):
            expect = _static_greedy(cfg, params, tk, p, 1)
            assert r.tokens == expect
