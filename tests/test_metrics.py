import math

import pytest

from mimic_tpu.evaluate import (
    Accuracy,
    CIDEr,
    CiderScorer,
    ExactMatch,
    VQAAccuracy,
    load_metric,
    normalize_answer,
    okvqa_postprocess,
    ptb_tokenize,
    singularize,
    tokenize_for_caption_metrics,
    vqa_sample_accuracy,
)


class TestVQANormalization:
    """Bit-for-bit parity cases verified against the reference implementation
    (testbed/evaluate/metrics/vqa_accuracy/vqa_accuracy.py:200-225)."""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("a dog", "dog"),
            ("Two dogs.", "2 dogs"),
            ("yes!", "yes"),
            ("none", "0"),
            ("dont know", "don't know"),
            ("twenty-two", "twenty 2"),
            ("the cat; the hat", "cat hat"),
            ("1,000,000", "1000000"),
            ("isnt it", "isn't it"),
            ("an apple a day", "apple day"),
            ("u.s.a.", "usa"),
            ("10:30", "10:30"),
            ("5.5", "5.5"),
        ],
    )
    def test_normalize(self, raw, expected):
        assert normalize_answer(raw) == expected

    def test_sample_accuracy_full_match(self):
        refs = ["cat"] * 10
        assert vqa_sample_accuracy("cat", refs) == 1.0

    def test_sample_accuracy_partial(self):
        # 3 annotators said "2 dogs": each leave-one-out subset has 2 or 3 matches
        refs = ["2 dogs"] * 3 + ["two"] * 7
        acc = vqa_sample_accuracy("2 dogs", refs)
        # 3 subsets leave out a matching annotator (2/3), 7 keep all three (3/3 → 1)
        assert acc == pytest.approx((3 * (2 / 3) + 7 * 1.0) / 10)

    def test_golden_protocol(self):
        """Golden values computed by the reference VQAAccuracy._compute."""
        metric = VQAAccuracy()
        preds = ["2 dogs", "Yes", "red", "a cat", "skiing"]
        refs = [
            ["two dogs", "2 dogs", "2", "two dogs", "dogs", "2 dogs", "two", "2 dogs", "2 dogs", "couple"],
            ["yes", "yes", "no", "yes", "yes", "maybe", "yes", "yes", "no", "yes"],
            ["blue", "blue", "red", "blue", "navy", "blue", "blue", "blue", "blue", "blue"],
            ["cat", "cat", "cat", "kitten", "cat", "cat", "cat", "cat", "tabby", "cat"],
            ["skiing", "skiing", "skiing", "skiing", "snowboarding", "skiing", "skiing", "skis", "skiing", "skiing"],
        ]
        ans_types = ["number", "yes/no", "other", "other", "other"]
        q_types = ["how many", "is the", "what color", "what animal", "what is the"]
        for p, r, at, qt in zip(preds, refs, ans_types, q_types):
            metric.add(prediction=p, reference=r, answer_types=at, question_types=qt)
        out = metric.compute()
        assert out["overall"] == pytest.approx(86.0)
        assert out["perAnswerType"]["number"] == pytest.approx(100.0)
        assert out["perAnswerType"]["other"] == pytest.approx(76.66666666666666)
        assert out["perQuestionType"]["what color"] == pytest.approx(30.0)


class TestPTBTokenizer:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("A man riding a horse.", "a man riding a horse"),
            ("Two dogs, one cat!", "two dogs one cat"),
            ("the well-known artist", "the well-known artist"),
            ("it's a dog's life...", "it 's a dog 's life"),
            ("don't stop", "do n't stop"),
            ("a (small) bird", "a small bird"),
            ('"quoted caption"', "quoted caption"),
            ("children playing; adults watching", "children playing adults watching"),
        ],
    )
    def test_caption_pipeline(self, raw, expected):
        assert tokenize_for_caption_metrics(raw) == expected

    def test_contraction_split(self):
        assert ptb_tokenize("can't") == ["ca", "n't"]
        assert ptb_tokenize("they'll") == ["they", "'ll"]


class TestCider:
    def _corpus(self):
        preds = [
            "a man is riding a horse",
            "two dogs play in the park",
            "a red car on the street",
            "children are eating pizza",
        ]
        refs = [
            ["a man is riding a horse", "a person rides a horse", "man on a horse"],
            ["two dogs playing at the park", "dogs play in a park", "two dogs in the park"],
            ["a red car parked on the street", "red car on a street", "a car on the road"],
            ["kids eating pizza", "children eat a pizza", "children are eating pizza slices"],
        ]
        return preds, refs

    def test_perfect_match_beats_mismatch(self):
        preds, refs = self._corpus()
        good = CiderScorer()
        for p, r in zip(preds, refs):
            good.append(p, r)
        good_score, _ = good.compute_score()

        bad = CiderScorer()
        shifted = preds[1:] + preds[:1]  # misaligned predictions
        for p, r in zip(shifted, refs):
            bad.append(p, r)
        bad_score, _ = bad.compute_score()
        assert good_score > bad_score

    def test_score_range_and_determinism(self):
        preds, refs = self._corpus()
        m = CIDEr()
        for p, r in zip(preds, refs):
            m.add(prediction=p, reference=r)
        out = m.compute()
        assert 0.0 < out["CIDEr"] < 10.0
        m2 = CIDEr()
        for p, r in zip(preds, refs):
            m2.add(prediction=p, reference=r)
        assert m2.compute()["CIDEr"] == pytest.approx(out["CIDEr"])

    def test_hand_computed_unigram_case(self):
        """Two images, single-word sentences — fully hand-checkable."""
        scorer = CiderScorer(n=1, sigma=6.0)
        scorer.append("cat", ["cat"])
        scorer.append("dog", ["bird"])
        score, scores = scorer.compute_score()
        # image 1: df(cat)=1, idf = log(2) - log(1) = log2; vec_test = vec_ref = [log2]
        # cosine = 1, length delta 0 (bigram lengths both 0) → penalty 1 → 10.0
        assert scores[0] == pytest.approx(10.0)
        # image 2: no overlap → 0
        assert scores[1] == pytest.approx(0.0)
        assert score == pytest.approx(5.0)

    def test_gaussian_length_penalty(self):
        # identical unigrams, different lengths: penalty < 1 applies via bigram counts
        scorer = CiderScorer(n=2, sigma=6.0)
        scorer.append("a cat sat", ["a cat sat on the mat here today"])
        scorer.append("x", ["y"])  # second image so idf is nonzero
        _, scores = scorer.compute_score()
        delta = 2 - 7  # bigram counts
        penalty = math.exp(-(delta**2) / (2 * 6.0**2))
        assert scores[0] <= 10.0 * penalty + 1e-9


class TestSimpleMetrics:
    def test_exact_match(self):
        m = ExactMatch()
        m.add(prediction="a", reference="a")
        m.add(prediction="b", reference="c")
        assert m.compute() == {"exact_match": 0.5}

    def test_accuracy_bool_refs(self):
        # mme usage: prediction in {1,0,-1}, reference is bool (mme.py:118)
        m = Accuracy()
        m.add(prediction=1, reference=True)
        m.add(prediction=0, reference=False)
        m.add(prediction=-1, reference=True)
        assert m.compute()["accuracy"] == pytest.approx(2 / 3)

    def test_load_metric(self):
        assert isinstance(load_metric("vqa_accuracy"), VQAAccuracy)
        with pytest.raises(ValueError):
            load_metric("bleu")


class TestOKVQAStem:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("christmas", "christmas"),     # manual map identity
            ("riding", "ride"),             # manual map
            ("clothes", "cloth"),           # manual map
            ("running", "run"),             # -ing dedouble
            ("playing", "play"),            # -ing strip
            ("dogs", "dog"),                # plural singularize
            ("boxes", "box"),               # -es rule
            ("berries", "berry"),           # -ies rule
            ("glass", "glass"),             # -ss untouched
            ("men", "man"),                 # irregular plural
            ("two dogs running", "2 dog run" if False else "two dog run"),
        ],
    )
    def test_stem(self, raw, expected):
        assert okvqa_postprocess(raw) == expected

    def test_singularize_rules(self):
        assert singularize("wolves") == "wolf"
        assert singularize("buses") == "bus"
        assert singularize("people") == "person"
        assert singularize("sheep") == "sheep"
