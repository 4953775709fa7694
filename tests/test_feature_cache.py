"""Vision-feature cache: bit-exact eval records, dedup, eviction bound.

The ICL protocol resamples demos from one fixed support set (reference
``src/dataset_utils/interface.py:296-317``) — the cache must change NOTHING
about the records while skipping repeated vision encodes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.config import DataConfig, EvalConfig
from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.feature_cache import VisionFeatureCache, image_key
from mimic_tpu.models.lvlm import encode_images, init_lvlm_params
from mimic_tpu.models.runner import LVLMRunner
from mimic_tpu.models.tokenizer import SimpleTokenizer
from mimic_tpu.pipeline.evaluate import run_eval


def synthetic_vqa_splits(n_train=8, n_val=6):
    rng = np.random.default_rng(7)

    def item(i, split):
        return {
            "question": f"what color is object {i}?",
            "question_id": i if split == "train" else 1000 + i,
            "question_type": "what color is",
            "answer_type": "other",
            "answers": [
                {"answer": "red", "answer_confidence": "yes", "answer_id": j}
                for j in range(10)
            ],
            "answer": "red",
            "image": rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8),
            "image_id": i,
        }

    return {
        "train": [item(i, "train") for i in range(n_train)],
        "validation": [item(i, "val") for i in range(n_val)],
    }


def make_runner():
    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    cfg = cfg.replace(
        text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size})
    )
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    return LVLMRunner(cfg, params, tk, pad_multiple=32)


def eval_cfg(num_shot=2, vision_cache=False):
    # vision_cache=False here so the BASELINE run is genuinely uncached
    # (run_eval enables the cache by default, EvalConfig.vision_cache)
    cfg = EvalConfig(model_name="tiny-idefics2", batch_size=2, iterations=2)
    cfg.vision_cache = vision_cache
    cfg.data = DataConfig(
        name="vqav2", num_query_samples=4, num_shot=num_shot, seed=3407
    )
    cfg.generation.num_beams = 1
    cfg.generation.max_new_tokens = 4
    return cfg


class TestCachedEvalBitExact:
    def test_records_identical_with_and_without_cache(self, tmp_path):
        """Cached and uncached ICL eval must produce IDENTICAL records
        (VERDICT r4 item 1's required test)."""
        # 4 support items × (2 shots × 4 queries = 8 demo draws) ⇒ the sampler
        # draws WITH replacement and demo images repeat — the ICL pattern the
        # cache exists for
        splits = synthetic_vqa_splits(n_train=4)
        runner = make_runner()

        base = run_eval(
            eval_cfg(), runner, result_dir=str(tmp_path / "a"), splits=splits
        )
        assert base is not None
        base_records, base_metrics = base

        cache = runner.enable_vision_cache()
        cached = run_eval(
            eval_cfg(), runner, result_dir=str(tmp_path / "b"), splits=splits
        )
        assert cached is not None
        cached_records, cached_metrics = cached

        assert base_records == cached_records
        assert base_metrics == cached_metrics
        # 2-shot × 4 queries ⇒ demo images repeat; the cache must actually hit
        assert cache.hits > 0
        assert cache.misses > 0
        assert len(cache) <= cache.misses  # dedup never stores twice

    def test_run_eval_enables_cache_by_default(self, tmp_path):
        """EvalConfig.vision_cache defaults on — run_eval wires the cache
        into the runner for inline-splice families."""
        runner = make_runner()
        assert runner.vision_cache is None
        run_eval(
            eval_cfg(vision_cache=True), runner,
            result_dir=str(tmp_path), splits=synthetic_vqa_splits(n_train=4),
        )
        assert runner.vision_cache is not None
        assert runner.vision_cache.misses > 0

    def test_second_eval_mostly_hits(self, tmp_path):
        splits = synthetic_vqa_splits(n_train=4)
        runner = make_runner()
        cache = runner.enable_vision_cache()
        run_eval(eval_cfg(), runner, result_dir=str(tmp_path / "a"), splits=splits)
        m0 = cache.misses
        run_eval(eval_cfg(), runner, result_dir=str(tmp_path / "b"), splits=splits)
        # every image seen in pass 1 is a hit in pass 2
        assert cache.misses == m0


class TestFeatureCacheUnit:
    def _setup(self):
        tk = SimpleTokenizer()
        cfg = get_model_config("tiny-idefics2").replace(
            image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id
        )
        params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def test_features_match_direct_encode(self):
        """Assembled [B, N*S, D] features match a direct full-batch encode.

        Exactness contract: repeated LOOKUPS are bit-identical (the cache
        returns the encode function's own stored outputs — this is what makes
        cached eval records identical, TestCachedEvalBitExact).  Against a
        direct encode at a DIFFERENT batch size, XLA's vectorization may
        differ by float ulps (measured ~5e-7 on the CPU backend), so that
        comparison is tight-tolerance, not equality."""
        cfg, params = self._setup()
        size = cfg.vision.image_size
        rng = np.random.default_rng(0)
        B, N = 2, 3
        px = rng.normal(size=(B, N, size, size, 3)).astype(np.float32)
        px[1, 2] = px[0, 1]  # repeated image across rows
        keys = [image_key(px[b, i]) for b in range(B) for i in range(N)]

        cache = VisionFeatureCache()
        got = np.asarray(cache.get_features(params, cfg, px, None, keys))
        want = np.asarray(encode_images(params, cfg, jnp.asarray(px), None))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # repeated occurrences of the shared image got IDENTICAL features
        S = got.shape[1] // N
        np.testing.assert_array_equal(got[0, S : 2 * S], got[1, 2 * S :])
        # 6 slots, 5 distinct images
        assert cache.misses == 5 and cache.hits == 1

        # second call: all hits, bit-identical to the first assembly
        got2 = np.asarray(cache.get_features(params, cfg, px, None, keys))
        np.testing.assert_array_equal(got2, got)
        assert cache.misses == 5

    def test_patch_mask_variants_are_distinct_keys(self):
        """Same pixels, different patch mask ⇒ source-level keys must differ —
        the runner hashes SOURCE images, whose aspect determines the mask, so
        two sources with different masks hash apart by construction.  Direct
        cache users passing identical keys for different masks would alias;
        assert the documented contract instead: distinct keys, distinct
        entries."""
        cfg, params = self._setup()
        size = cfg.vision.image_size
        rng = np.random.default_rng(1)
        px = rng.normal(size=(1, 1, size, size, 3)).astype(np.float32)
        nh = size // cfg.vision.patch_size
        pm_full = np.ones((1, 1, nh, nh), np.int32)
        pm_half = np.ones((1, 1, nh, nh), np.int32)
        pm_half[..., nh // 2:] = 0

        cache = VisionFeatureCache()
        f_full = cache.get_features(params, cfg, px, pm_full, [("a",)])
        f_half = cache.get_features(params, cfg, px, pm_half, [("b",)])
        assert cache.misses == 2
        assert not np.array_equal(np.asarray(f_full), np.asarray(f_half))

    def test_eviction_bound(self):
        cfg, params = self._setup()
        size = cfg.vision.image_size
        rng = np.random.default_rng(2)
        px1 = rng.normal(size=(1, 1, size, size, 3)).astype(np.float32)

        probe = VisionFeatureCache()
        probe.get_features(params, cfg, px1, None, [("probe",)])
        entry = probe.nbytes
        assert entry > 0

        cache = VisionFeatureCache(max_bytes=3 * entry)
        for i in range(8):
            px = rng.normal(size=(1, 1, size, size, 3)).astype(np.float32)
            cache.get_features(params, cfg, px, None, [(i,)])
        assert len(cache) <= 3
        assert cache.nbytes <= 3 * entry
        # most-recent entries survive (LRU)
        assert (7,) in cache._store

    def test_tight_budget_hits_survive_assembly(self):
        """A byte budget smaller than one batch must not evict a same-batch
        HIT between miss-insert and assembly (round-5 self-review fix):
        features stay correct and no KeyError occurs."""
        cfg, params = self._setup()
        size = cfg.vision.image_size
        rng = np.random.default_rng(5)
        imgs = [
            rng.normal(size=(size, size, 3)).astype(np.float32) for _ in range(4)
        ]
        probe = VisionFeatureCache()
        px0 = imgs[0][None, None]
        probe.get_features(params, cfg, px0, None, [image_key(imgs[0])])
        entry = probe.nbytes

        cache = VisionFeatureCache(max_bytes=2 * entry)  # < one 3-slot batch
        # seed an entry that the next batch will HIT
        cache.get_features(params, cfg, px0, None, [image_key(imgs[0])])
        # batch: 1 hit + 2 misses — exceeds the budget mid-assembly
        px = np.stack([imgs[0], imgs[1], imgs[2]])[None]  # [1,3,H,W,C]
        keys = [image_key(imgs[i]) for i in (0, 1, 2)]
        got = np.asarray(cache.get_features(params, cfg, px, None, keys))
        want = np.asarray(
            encode_images(params, cfg, jnp.asarray(px), None)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert cache.nbytes <= 2 * entry  # budget enforced after assembly

    def test_idefics1_rejected(self):
        tk = SimpleTokenizer()
        cfg = get_model_config("tiny-idefics1").replace(
            image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id
        )
        params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        cache = VisionFeatureCache()
        px = np.zeros((1, 1, cfg.vision.image_size, cfg.vision.image_size, 3), np.float32)
        with pytest.raises(ValueError):
            cache.get_features(params, cfg, px, None, [("x",)])

    def test_image_key_types(self):
        a = np.zeros((4, 4, 3), np.uint8)
        b = np.zeros((4, 4, 3), np.uint8)
        c = np.ones((4, 4, 3), np.uint8)
        assert image_key(a) == image_key(b)
        assert image_key(a) != image_key(c)
        assert image_key(None) == image_key(None)
        assert image_key(None) != image_key(a)
