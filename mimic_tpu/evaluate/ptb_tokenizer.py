"""Pure-Python Penn-Treebank-style tokenizer for caption scoring.

Replaces the reference's Java subprocess
(``testbed/evaluate/metrics/CIDEr/CIDEr.py:59-120`` shells out to Stanford-CoreNLP's
``edu.stanford.nlp.process.PTBTokenizer -preserveLines -lowerCase`` then removes a
fixed punctuation list).  This implementation reproduces the PTB tokenization rules
that matter for lowercase English captions:

- terminal/clause punctuation split off (``.`` ``,`` ``?`` ``!`` ``;`` ``:``)
- ellipsis ``...`` kept as one token
- brackets mapped to ``-LRB-``/``-RRB-``/``-LCB-``/``-RCB-``/``-LSB-``/``-RSB-``
- quotes mapped to `` `` ``/``''`` (opening/closing)
- contractions split: ``n't`` ``'s`` ``'m`` ``'re`` ``'ve`` ``'ll`` ``'d``
- hyphenated words kept whole (PTB keeps ``well-known`` as one token)

Since the caption pipeline then *deletes* all punctuation tokens anyway
(the PUNCTUATIONS list), only word-boundary behavior affects scores.
"""

from __future__ import annotations

import re
from typing import List

# punctuation tokens removed after tokenization, mirroring the reference list
PUNCTUATIONS = frozenset(
    ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
     ".", "?", "!", ",", ":", "-", "--", "...", ";"]
)

_BRACKETS = {
    "(": "-LRB-", ")": "-RRB-",
    "{": "-LCB-", "}": "-RCB-",
    "[": "-LSB-", "]": "-RSB-",
}

_CONTRACTION_RE = re.compile(
    r"(?i)(?:(?<=\w)(n't)$)|(?:(?<=\w)('s|'m|'re|'ve|'ll|'d)$)"
)

_TOKEN_RE = re.compile(
    r"""
      \.\.\.            # ellipsis
    | --+               # dashes
    | [,;:@\#$%&]       # clause punctuation / symbols
    | \d+(?:[.,]\d+)*   # numbers with internal separators
    | [^\s\w]           # any other single non-word char (punct, quotes, brackets)
    | \w+(?:[-'’]\w+)*'?  # words incl. hyphen/apostrophe internals, trailing '
    """,
    re.VERBOSE,
)


def _split_contractions(token: str) -> List[str]:
    m = _CONTRACTION_RE.search(token)
    if m is None:
        return [token]
    start = m.start()
    head, tail = token[:start], token[start:]
    if not head:
        return [token]
    return _split_contractions(head) + [tail]


def ptb_tokenize(line: str, lowercase: bool = True) -> List[str]:
    """Tokenize one caption line; returns the token list including punctuation.

    Dispatches to the C++ implementation (``mimic_tpu.native``) when available —
    the Python path below is the behavioral oracle and fallback.
    """
    from ..native import ptb_tokenize_native

    native = ptb_tokenize_native(line, lowercase)
    if native is not None:
        return native
    return ptb_tokenize_py(line, lowercase)


def ptb_tokenize_py(line: str, lowercase: bool = True) -> List[str]:
    """Pure-Python reference implementation."""
    if lowercase:
        line = line.lower()
    line = line.replace("\n", " ")
    tokens: List[str] = []
    for raw in _TOKEN_RE.findall(line):
        if raw in _BRACKETS:
            tokens.append(_BRACKETS[raw])
            continue
        if raw in ('"',):
            # PTB distinguishes opening/closing quotes; both forms are stripped later
            tokens.append("''")
            continue
        tokens.extend(_split_contractions(raw))
    return tokens


def tokenize_for_caption_metrics(line: str) -> str:
    """Full caption pipeline: PTB tokenize, lowercase, drop punctuation tokens."""
    return " ".join(t for t in ptb_tokenize(line) if t not in PUNCTUATIONS)
