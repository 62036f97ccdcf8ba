"""End-to-end BM25 correctness: the full pipeline (analyzer -> index -> device
engine -> run files) must match an independent brute-force implementation on a
generated text corpus — the offline stand-in for Lucene-parity validation
(SURVEY.md hard part #1)."""

import math
from collections import Counter

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.analysis import EnglishAnalyzer
from capreolus_tpu.collection import Collection
from capreolus_tpu.core import ConfigOption
from capreolus_tpu.index.smallfloat import byte4_to_int, int_to_byte4
from capreolus_tpu.searcher import Searcher

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike "
         "november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee "
         "zulu ocean galaxy telescope whale gravity running jumped computes").split()


@Collection.register
class SyntheticTextCollection(Collection):
    """Deterministic random-text corpus for brute-force comparison."""

    module_name = "synthetic_text"
    collection_type = "tsv"
    config_spec = Collection.config_spec + [ConfigOption("numdocs", 300, "corpus size")]

    def get_path(self):
        import tempfile
        from pathlib import Path

        cache = self.get_cache_path() / "corpus"
        fn = cache / "docs.tsv"
        if not fn.exists():
            cache.mkdir(parents=True, exist_ok=True)
            rng = np.random.Generator(np.random.PCG64(99))
            with open(fn, "wt", encoding="utf-8") as f:
                for i in range(self.config["numdocs"]):
                    length = int(rng.integers(10, 120))
                    words = rng.choice(WORDS, size=length, p=_zipf_probs(len(WORDS)))
                    f.write(f"SD{i:04d}\t{' '.join(words)}\n")
        return cache


def _zipf_probs(n):
    p = 1.0 / np.arange(1, n + 1)
    return p / p.sum()


def brute_force_bm25(docs_tokens, query_terms, k1, b, quantize=True):
    """Independent BM25: dict-based stats, Lucene idf + quantized doclens."""
    n = len(docs_tokens)
    df = Counter()
    for toks in docs_tokens.values():
        for t in set(toks):
            df[t] += 1
    doclens = {d: len(toks) for d, toks in docs_tokens.items()}
    avgdl = sum(doclens.values()) / n
    scores = {}
    qtf = Counter(query_terms)
    for docid, toks in docs_tokens.items():
        tf = Counter(toks)
        dl = byte4_to_int(int_to_byte4(doclens[docid])) if quantize else doclens[docid]
        s = 0.0
        for term, qw in qtf.items():
            if tf[term] == 0 or df[term] == 0:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += qw * idf * tf[term] / (tf[term] + k1 * (1 - b + b * dl / avgdl))
        if s > 0:
            scores[docid] = s
    return scores


@pytest.mark.parametrize("exact", [True, False])
def test_pipeline_matches_bruteforce(tmpdir_as_cache, tmp_path, exact):
    searcher = Searcher.create("BM25", {"k1": [1.2], "b": [0.75],
                                        "index": {"collection": {"name": "synthetic_text"}}})
    searcher.index.create_index()
    analyzer = EnglishAnalyzer(stemmer="porter")

    # independent tokenization of the corpus for the brute-force side
    corpus_fn = searcher.index.collection.get_path() / "docs.tsv"
    docs_tokens = {}
    for line in open(corpus_fn, encoding="utf-8"):
        docid, text = line.rstrip("\n").split("\t", 1)
        docs_tokens[docid] = analyzer.analyze(text)

    queries = {"q1": "galaxy telescope", "q2": "whale ocean gravity", "q3": "running zulu zulu"}
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("".join(f"{qid}\t{text}\n" for qid, text in queries.items()))
    outdir = tmp_path / ("exact" if exact else "compact")

    # force the chosen top-k path through the engine
    engine = searcher.get_engine()
    orig_search = engine.search
    engine.search = lambda *a, **kw: orig_search(*a, **{**kw, "exact_topk": exact})
    searcher.query_from_file(topicsfn, outdir)

    from capreolus_tpu.utils.trec import load_trec_run

    run = load_trec_run(next(f for f in outdir.iterdir() if f.name != "done"))
    for qid, text in queries.items():
        expected = brute_force_bm25(docs_tokens, analyzer.analyze(text), k1=1.2, b=0.75)
        got = run[qid]
        assert set(got) == set(expected), f"{qid}: candidate sets differ"
        for docid, score in expected.items():
            assert got[docid] == pytest.approx(score, rel=1e-4), (qid, docid)
