"""Native C++ analyzer must match the pure-Python implementation exactly."""

import numpy as np
import pytest

from capreolus_tpu.analysis import EnglishAnalyzer, porter_stem, standard_tokenize, strip_possessive
from capreolus_tpu.analysis.analyzer import LUCENE_ENGLISH_STOPWORDS
from capreolus_tpu.native import get_analyzer_lib, native_analyze, native_porter_stem

pytestmark = pytest.mark.skipif(get_analyzer_lib() is None, reason="native toolchain unavailable")

TEXTS = [
    "The quick brown fox jumps over the lazy dog's back!",
    "it's a 3.14 U.S.A test with 1,000 items",
    "Nationalization proceedings energized traditional RELATIONAL databases.",
    "foo-bar baz_qux x86 processors; O'Brien's 2nd attempt...",
    "",
    "a the of",
    "hello",
]


def _python_analyze(text, use_porter, keep_stops):
    tokens = []
    for raw in standard_tokenize(text):
        tok = strip_possessive(raw).lower()
        if not tok:
            continue
        if not keep_stops and tok in LUCENE_ENGLISH_STOPWORDS:
            continue
        if use_porter:
            tok = porter_stem(tok)
        tokens.append(tok)
    return tokens


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("use_porter", [True, False])
@pytest.mark.parametrize("keep_stops", [True, False])
def test_native_matches_python(text, use_porter, keep_stops):
    assert native_analyze(text, use_porter, keep_stops) == _python_analyze(text, use_porter, keep_stops)


def test_native_porter_vectors():
    rng = np.random.Generator(np.random.PCG64(0))
    words = ("caresses ponies ties cats feed agreed plastered motoring sing conflated sized hopping "
             "falling hissing failing filing happy sky relational conditional rational hesitanci "
             "digitizer differentli vileli analogousli vietnamization predication operator feudalism "
             "decisiveness hopefulness formaliti sensitiviti sensibiliti triplicate formative formalize "
             "electriciti hopeful goodness revival allowance inference airliner gyroscopic adjustable "
             "defensible irritant replacement adjustment dependent adoption communism activate "
             "angulariti homologous effective bowdlerize probate rate cease controll roll archaeology").split()
    # plus random letter strings for edge coverage
    for _ in range(200):
        length = int(rng.integers(1, 12))
        words.append("".join(chr(97 + int(c)) for c in rng.integers(0, 26, length)))
    for w in words:
        assert native_porter_stem(w) == porter_stem(w), w


def test_analyzer_uses_native_transparently():
    a = EnglishAnalyzer(stemmer="porter")
    assert a.analyze("The programmer's tests are running") == ["programm", "test", "run"]


def test_native_trec_parser_matches_python(tmp_path):
    from capreolus_tpu.native import native_parse_trec
    from capreolus_tpu.utils.trec import TREC_CONTENT_TAGS, iterate_trec_docs

    rng = np.random.Generator(np.random.PCG64(0))
    words = "alpha beta gamma delta epsilon zeta".split()
    blocks = []
    for i in range(25):
        text = " ".join(rng.choice(words, size=int(rng.integers(3, 30))))
        head = " ".join(rng.choice(words, size=3))
        blocks.append(f"""<DOC>
<DOCNO> NT{i:03d} </DOCNO>
<SECTION>
<P>
ignored section
</P>
</SECTION>
<HEADLINE>
<P>
{head}
</P>
</HEADLINE>
<TEXT>
<P>
{text}
</P>
</TEXT>
</DOC>
""")
    fn = tmp_path / "docs.trectxt"
    fn.write_text("".join(blocks))

    native = native_parse_trec(fn.read_bytes())
    if native is None:
        pytest.skip("native toolchain unavailable")

    # force the pure-Python parser: a list is never `is` the default tuple
    python = list(iterate_trec_docs(fn, content_tags=list(TREC_CONTENT_TAGS)))
    assert native == python
    assert len(native) == 25
    assert native[0][0] == "NT000"
    assert "ignored section" not in native[0][1]


def test_native_ascii_fuzz():
    """Random ASCII (punctuation runs, controls, digits, possessives): the native
    C++ path must match the pure-python implementation token-for-token."""
    import random

    pools = ["abcdefgh ", "THE and of ", "a.b,c'd-e ", "\t\n\x01 ", "123a456 ",
             "o'brien's ", "-x_y-- ", "U.S.A. 3.14 "]
    rng = random.Random(7)
    for _ in range(400):
        text = "".join(rng.choice(pools)[rng.randrange(0, 3):] for _ in range(rng.randrange(1, 12)))
        for use_porter in (True, False):
            assert native_analyze(text, use_porter, False) == _python_analyze(text, use_porter, False), repr(text)


def test_analyzer_unicode_falls_back_to_python():
    """Non-ASCII text routes around the ASCII-only native library (analyzer.py
    isascii() guard) instead of crashing; results equal the pure-python path."""
    analyzer = EnglishAnalyzer(stemmer="porter", keep_stopwords=False)
    for text in ["café naïve Zürich", "中文漢字 mixed words", "emoji 🙂 test", "𝔘nicode"]:
        assert analyzer.analyze(text) == _python_analyze(text, True, False)
