"""UDel query expansion for TREC-COVID topics.

Capability parity with the reference's udel expander
(/root/reference/capreolus/utils/common.py:160-591), which combines the query with
salient keywords from the question/narrative fields. The reference relies on
scispacy biomedical entity extraction; when scispacy is unavailable this falls back
to stopword-filtered keyword union (covered terms deduplicated, query order kept).
"""

from __future__ import annotations

from capreolus_tpu.analysis import LUCENE_ENGLISH_STOPWORDS, standard_tokenize
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

# question-style words the udel method strips from the question field
_QUESTION_WORDS = frozenset(
    "what which how why does do can could should would is are was were will "
    "there any anything looking look known".split()
)


def _keywords(text: str):
    out = []
    for tok in standard_tokenize(text):
        low = tok.lower()
        if low in LUCENE_ENGLISH_STOPWORDS or low in _QUESTION_WORDS:
            continue
        out.append(low)
    return out


def _scispacy_entities(text: str):
    try:
        import spacy

        nlp = spacy.load("en_core_sci_sm")
    except Exception:
        return None
    return [ent.text.lower() for ent in nlp(text).ents]


def udel_expand(query: str, question: str = "", narrative: str = "") -> str:
    """Expand a query with salient keywords from the question field."""
    base = _keywords(query)
    extra_src = question or narrative
    entities = _scispacy_entities(extra_src) if extra_src else None
    if entities is None:
        extra = _keywords(extra_src) if extra_src else []
    else:
        extra = [t for ent in entities for t in ent.split()]
    seen = set()
    combined = []
    for tok in base + extra:
        if tok not in seen:
            seen.add(tok)
            combined.append(tok)
    return " ".join(combined)
