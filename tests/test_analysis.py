import pytest

from capreolus_tpu.analysis import EnglishAnalyzer, get_analyzer, porter_stem, standard_tokenize, strip_possessive

# classic vectors from Porter's paper + departures used by Lucene's implementation
PORTER_VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"), ("caress", "caress"),
    ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
    ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"), ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"), ("revival", "reviv"), ("allowance", "allow"),
    ("inference", "infer"), ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"), ("probate", "probat"), ("rate", "rate"),
    ("cease", "ceas"), ("controll", "control"), ("roll", "roll"),
    # Lucene departures: bli->ble, logi->log
    ("conformabli", "conform"), ("archaeology", "archaeolog"), ("geologi", "geologi"),
]


@pytest.mark.parametrize("word,expected", PORTER_VECTORS)
def test_porter_vectors(word, expected):
    assert porter_stem(word) == expected


def test_porter_matches_nltk_martin_extensions():
    nltk = pytest.importorskip("nltk")
    from nltk.stem.porter import PorterStemmer

    ref = PorterStemmer(mode=PorterStemmer.MARTIN_EXTENSIONS)
    words = (
        "the quick brown foxes jumped over seventeen lazy dogs while nationalization "
        "proceedings energized traditional relational databases running hopelessly "
        "controlled experiments analogously sized generalizations dying lying tying "
        "agreement disagreement university universities probabilistic retrieval"
    ).split()
    for w in words:
        assert porter_stem(w) == ref.stem(w), w


def test_standard_tokenize():
    assert standard_tokenize("Hello, World!") == ["Hello", "World"]
    assert standard_tokenize("it's a 3.14 U.S.A test") == ["it's", "a", "3.14", "U.S.A", "test"]
    assert standard_tokenize("foo-bar baz_qux") == ["foo", "bar", "baz", "qux"]
    assert standard_tokenize("1,000 items") == ["1,000", "items"]


def test_possessive():
    assert strip_possessive("John's") == "John"
    assert strip_possessive("its") == "its"
    assert strip_possessive("dog’s") == "dog"
    assert strip_possessive("DOG'S") == "DOG"


def test_analyzer_pipeline():
    a = EnglishAnalyzer(stemmer="porter")
    # stopwords removed, possessive stripped, stemmed
    assert a.analyze("The programmer's tests are running") == ["programm", "test", "run"]
    assert a.analyze("") == []

    keep = EnglishAnalyzer(stemmer="porter", keep_stopwords=True)
    assert "the" in keep.analyze("The tests")

    nostem = get_analyzer(stemmer="none")
    assert nostem.analyze("Running tests") == ["running", "tests"]


def test_kstem_inflectional():
    from capreolus_tpu.analysis.kstem import kstem

    cases = {
        "cities": "city", "carried": "carry", "hopped": "hop", "hopping": "hop",
        "created": "create", "creating": "create", "dogs": "dog", "churches": "church",
        "boxes": "box", "knives": "knife", "children": "child", "news": "news",
        "analysis": "analysis", "running": "run", "engineering": "engineer",
        # derivational suffixes preserved (the point of krovetz vs porter)
        "nationalization": "nationalization", "hopefulness": "hopefulness",
    }
    for word, expected in cases.items():
        assert kstem(word) == expected, word


def test_krovetz_analyzer():
    a = get_analyzer(stemmer="krovetz")
    assert a.analyze("The dogs were running through cities") == ["dogs"[:3], "were", "run", "through", "city"]


# ------------------------------------------------------- content-span chunker
def test_content_spans_question_frames():
    """The chunker drops question frames and keeps topical spans — the offline
    approximation of scispacy entity extraction in the udel expander
    (reference utils/common.py:582-589)."""
    from capreolus_tpu.analysis.chunker import content_spans, content_terms

    # (standard_tokenize splits on the hyphen, like the Lucene analyzer would)
    assert content_spans("what is known about the origin of COVID-19") == \
        [["origin"], ["COVID", "19"]]
    assert content_spans("seeking information about coronavirus transmission "
                         "in health care settings") == \
        [["information"], ["coronavirus", "transmission"],
         ["health", "care", "settings"]]
    # multi-token biomedical spans survive intact, frame verbs split them
    assert content_spans("how does the coronavirus respond to changes in the weather") == \
        [["coronavirus", "respond"], ["changes"], ["weather"]]
    assert content_terms("what drugs have been tried") == ["drugs", "tried"]


def test_content_spans_preserves_deverbal_nouns():
    """Ambiguous verb/noun forms that carry retrieval content are NOT removed
    (the FRAME_VERBS list is conservative by design)."""
    from capreolus_tpu.analysis.chunker import content_terms

    terms = content_terms("studies of the spread and effects of quarantine use")
    for keep in ("studies", "spread", "effects", "quarantine", "use"):
        assert keep in terms, terms


def test_udel_expand_uses_chunker_offline():
    """udel_expand folds the question's content spans into the title offline
    (reference covid.py:170-173 semantics without the scispacy download)."""
    from capreolus_tpu.utils import udel
    from capreolus_tpu.utils.udel import udel_expand

    if udel._scispacy_nlp() is not None:  # pragma: no cover - env-dependent
        pytest.skip("scispacy installed: fallback path not taken")
    out = udel_expand("coronavirus origin", "what is known about the origin of COVID-19")
    assert out == "coronavirus origin covid 19"  # 'origin' deduped, frame dropped


def test_content_spans_scispacy_parity():
    """Referee vs real scispacy when its model is installed (skip otherwise),
    mirroring the WordPiece-vs-transformers referee pattern."""
    try:
        import spacy

        nlp = spacy.load("en_core_sci_sm")
    except Exception:
        pytest.skip("scispacy model not installed")
    from capreolus_tpu.analysis.chunker import content_terms

    for q in ["what is known about the origin of COVID-19",
              "seeking information about coronavirus transmission"]:
        ents = {t.lower() for ent in nlp(q).ents for t in ent.text.split()}
        ours = {t.lower() for t in content_terms(q)}
        # chunker must cover every scispacy entity token (it may keep extras)
        assert ents <= ours, (ents, ours)
