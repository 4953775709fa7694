"""Native C++ PTB tokenizer vs the pure-Python oracle (fuzz + fixed cases)."""

import random
import string

import pytest

from mimic_tpu.evaluate.ptb_tokenizer import ptb_tokenize_py
from mimic_tpu.native import native_available, ptb_tokenize_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable or native build failed"
)

FIXED = [
    "A man riding a horse.",
    "Two dogs, one cat!",
    "the well-known artist",
    "it's a dog's life...",
    "don't stop, they'll win; we've lost",
    "a (small) bird [on] {a} branch",
    '"quoted caption" -- with dashes',
    "price: $3.50, 1,000 items @ 5%",
    "2nd place & 3rd base",
    "o'clock 'tis rockin'",
    "CAN'T SHOUT",
    "",
    "   spaces   everywhere   ",
    "multi\nline\ncaption",
]


@pytest.mark.parametrize("line", FIXED)
def test_fixed_cases_match_python(line):
    assert ptb_tokenize_native(line) == ptb_tokenize_py(line)


def test_fuzz_matches_python():
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + " .,;:!?'\"-()[]{}@#$%&/\\<>"
    for _ in range(300):
        n = rng.randint(0, 60)
        line = "".join(rng.choice(alphabet) for _ in range(n))
        assert ptb_tokenize_native(line) == ptb_tokenize_py(line), repr(line)


def test_long_line_reallocation():
    line = "word " * 5000
    out = ptb_tokenize_native(line)
    assert out == ["word"] * 5000
