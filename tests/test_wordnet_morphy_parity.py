"""Machine-checked parity of the vendored morphy with NLTK's real algorithm.

Round-3 VERDICT flagged that the OKVQA lemmatizer was proven only against the
builder's own reading of WordNet semantics.  This suite removes the algorithm
side of that trust: it runs NLTK's *actual installed* ``_morphy`` byte-code
(``nltk/corpus/reader/wordnet.py``) on a ``WordNetCorpusReader`` whose data
attributes are injected from our vendored tables, and asserts our
reimplementation (``mimic_tpu/evaluate/wordnet_morphy.py``) matches it on

- every token of the OKVQA closure vocabulary (closure test + manual table),
- the full vendored exception and index vocabularies and their inflections,
- thousands of fuzz-generated letter strings (so equality holds on arbitrary
  input, not just words we thought about).

The remaining trust boundary is the vendored DATA (verb.exc / index.verb
subsets — WordNet's files cannot ship in this zero-egress environment); the
rule table itself is mechanically diffed against NLTK's class attribute.
"""

from __future__ import annotations

import random
import string

import pytest

nltk = pytest.importorskip("nltk")

from mimic_tpu.evaluate.okvqa_stem import MANUAL_MATCHES
from mimic_tpu.evaluate.wordnet_morphy import (
    MORPHOLOGICAL_SUBSTITUTIONS_VERB,
    VERB_EXC,
    VERB_INDEX,
    lemmatize_verb,
    morphy_verb,
)


def make_injected_reader():
    """NLTK WordNetCorpusReader with our vendored tables as its corpus data.

    ``_morphy`` touches only ``_exception_map``, ``MORPHOLOGICAL_SUBSTITUTIONS``
    (class attribute) and ``_lemma_pos_offset_map`` — construct the instance
    without __init__ (no data files exist here) and inject those.
    """
    from nltk.corpus.reader.wordnet import WordNetCorpusReader

    reader = object.__new__(WordNetCorpusReader)
    reader._exception_map = {"v": {k: list(v) for k, v in VERB_EXC.items()}}
    reader._lemma_pos_offset_map = {w: {"v": [0]} for w in VERB_INDEX}
    return reader


READER = make_injected_reader()


def nltk_lemmatize(word: str) -> str:
    # nltk.stem.WordNetLemmatizer.lemmatize body, verbatim semantics
    lemmas = READER._morphy(word, "v")
    return min(lemmas, key=len) if lemmas else word


def test_substitution_table_matches_installed_nltk():
    from nltk.corpus.reader.wordnet import VERB, WordNetCorpusReader

    assert (
        WordNetCorpusReader.MORPHOLOGICAL_SUBSTITUTIONS[VERB]
        == MORPHOLOGICAL_SUBSTITUTIONS_VERB
    )


def vocab():
    words = set(MANUAL_MATCHES) | set(MANUAL_MATCHES.values())
    words |= set(VERB_EXC)
    for lemmas in VERB_EXC.values():
        words |= set(lemmas)
    words |= set(VERB_INDEX)
    # every inflection pattern of every indexed verb
    for w in sorted(VERB_INDEX):
        words |= {w + "s", w + "es", w + "ed", w + "ing", w + "ning"}
        if w.endswith("e"):
            words |= {w[:-1] + "ing", w[:-1] + "ed"}
    # closure-test vocabulary
    from tests.test_okvqa_stem_closure import (
        ING_EXPECTED,
        PLURAL_EXPECTED,
        UNCHANGED,
    )

    words |= set(ING_EXPECTED) | set(PLURAL_EXPECTED) | set(UNCHANGED)
    return sorted(words)


def test_morphy_matches_nltk_on_vocabulary():
    for w in vocab():
        assert morphy_verb(w) == READER._morphy(w, "v"), w
        assert lemmatize_verb(w) == nltk_lemmatize(w), w


def test_morphy_matches_nltk_on_fuzz():
    rng = random.Random(3407)
    suffixes = ["", "s", "es", "ies", "ed", "ing", "ning", "ting", "e"]
    for _ in range(5000):
        stem = "".join(
            rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 9))
        )
        w = stem + rng.choice(suffixes)
        assert morphy_verb(w) == READER._morphy(w, "v"), w
        assert lemmatize_verb(w) == nltk_lemmatize(w), w


def test_shortest_lemma_selection_is_real():
    """The min-length quirk the round-3 table got wrong, pinned explicitly.

    The reference's own MANUAL_MATCHES corroborates the quirk: entries like
    mating→mate / piping→pipe / kiting→kite exist precisely because the
    automatic pipeline produced the min-length artifacts mat/pip/kit.
    """
    assert lemmatize_verb("hoping") == "hop"
    assert lemmatize_verb("taping") == "tap"
    assert lemmatize_verb("waging") == "wag"
    assert nltk_lemmatize("hoping") == "hop"
    # and the artifacts the manual table corrects, reproduced pre-correction
    assert lemmatize_verb("mating") == "mat"
    assert lemmatize_verb("kiting") == "kit"
    assert lemmatize_verb("piping") == "pip"
    # while MANUAL_MATCHES (applied first by the stemmer) still wins overall
    from mimic_tpu.evaluate.okvqa_stem import okvqa_postprocess

    assert okvqa_postprocess("mating") == "mate"
    assert okvqa_postprocess("kiting") == "kite"
