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
