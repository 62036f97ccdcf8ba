"""Lucene-style English analysis chain.

Reproduces the behavior of Anserini's ``DefaultEnglishAnalyzer`` (used via JNI in
/root/reference/capreolus/tokenizer/anserini.py:16-42) as a host-side pipeline:

    StandardTokenizer (UAX#29 word-break approximation)
    -> EnglishPossessiveFilter -> LowerCaseFilter
    -> StopFilter (Lucene English stopword set) -> PorterStemFilter

Term-statistics parity with Lucene is what makes BM25 effectiveness parity possible
(SURVEY.md §7 hard part #1). The analyzer is a pure function of (stemmer, keepstops),
so analyzed output is cacheable by config.
"""

from __future__ import annotations

import re
from typing import List

from capreolus_tpu.analysis.porter import porter_stem

# Lucene's EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words)
LUCENE_ENGLISH_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such that
    the their then there these they this to was will with""".split()
)

_APOSTROPHES = "'’＇"

# UAX#29-approximate word tokens: runs of unicode letters/digits, allowing
# single ' . , : between alphanumerics (MidLetter / MidNum / MidNumLet rules),
# which keeps "don't", "3.14", "U.S.A" and "1,000" single tokens like Lucene does.
_TOKEN_RE = re.compile(
    r"[^\W_]+(?:[{ap}.,:][^\W_]+)*".format(ap=_APOSTROPHES),
    re.UNICODE,
)

_MAX_TOKEN_LENGTH = 255  # StandardTokenizer default


def standard_tokenize(text: str) -> List[str]:
    """Approximate Lucene StandardTokenizer (UAX#29 word break) output."""
    return [t for t in _TOKEN_RE.findall(text) if len(t) <= _MAX_TOKEN_LENGTH]


def strip_possessive(token: str) -> str:
    """Lucene EnglishPossessiveFilter: remove a trailing 's (any apostrophe form)."""
    if len(token) >= 2 and token[-1] in ("s", "S") and token[-2] in _APOSTROPHES:
        return token[:-2]
    return token


class EnglishAnalyzer:
    """Configurable English analyzer matching Anserini's options.

    Args:
        stemmer: "porter", "krovetz" (dictionary-less inflectional approximation), or "none"
        keep_stopwords: if True, skip stopword removal (Anserini's ``keepStopwords``)
    """

    def __init__(self, stemmer: str = "porter", keep_stopwords: bool = False):
        if stemmer not in ("porter", "krovetz", "none"):
            raise ValueError(f"unsupported stemmer {stemmer!r}; expected 'porter', 'krovetz', or 'none'")
        self.stemmer = stemmer
        self.keep_stopwords = keep_stopwords

    def analyze(self, text: str) -> List[str]:
        # the native C++ path handles ASCII text (the overwhelming majority of TREC
        # corpora); unicode and the krovetz stemmer fall through to pure Python
        if text.isascii() and self.stemmer != "krovetz":
            from capreolus_tpu.native import native_analyze

            result = native_analyze(text, self.stemmer == "porter", self.keep_stopwords)
            if result is not None:
                return result
        if self.stemmer == "porter":
            stem = porter_stem
        elif self.stemmer == "krovetz":
            from capreolus_tpu.analysis.kstem import kstem

            stem = kstem
        else:
            stem = None
        tokens = []
        for raw in standard_tokenize(text):
            tok = strip_possessive(raw).lower()
            if not tok:
                continue
            if not self.keep_stopwords and tok in LUCENE_ENGLISH_STOPWORDS:
                continue
            if stem is not None:
                tok = stem(tok)
            tokens.append(tok)
        return tokens

    def __call__(self, text: str) -> List[str]:
        return self.analyze(text)

    def cache_key(self) -> str:
        return f"english_stem-{self.stemmer}_keepstops-{self.keep_stopwords}"


class WhitespaceAnalyzer:
    """Trivial analyzer: lowercase + whitespace split (useful for tests/fixtures)."""

    def analyze(self, text: str) -> List[str]:
        return text.lower().split()

    __call__ = analyze

    def cache_key(self) -> str:
        return "whitespace"


def get_analyzer(stemmer: str = "porter", keep_stopwords: bool = False):
    if stemmer is None:
        stemmer = "none"
    if stemmer == "whitespace":
        return WhitespaceAnalyzer()
    return EnglishAnalyzer(stemmer=stemmer, keep_stopwords=keep_stopwords)
