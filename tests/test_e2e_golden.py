"""End-to-end offline effectiveness golden (VERDICT r3 next-step #5).

Every pipeline link has a unit referee, but only a COMPOSED run catches
composition/ordering/tie-break bugs: this module builds a deterministic 50k-doc
synthetic TREC collection with graded qrels, runs the real ``rank.searcheval``
task (TREC parse -> C++ analyzer -> index build -> device search -> run files
-> cross-validated trec_eval metrics) for BM25, QLD, BM25RM3, SDM, and fusion,
and pins the resulting MAP / nDCG@20:

1. BM25 and QLD metrics must match a from-scratch brute-force referee — pure
   python/numpy inverted index over the analyzer's tokens, float64 scoring,
   independent AP/nDCG implementations (trec_eval semantics: linear gains,
   log2(rank+1) discounts).
2. All five searchers' metrics are pinned to recorded golden values
   (PARITY.md) so any ordering regression anywhere in the stack fails loudly.

Mirrors the reference's quickstart contract (/root/reference/docs/quick.md:24-29
pins NFCorpus BM25 MAP/nDCG@10 to 4 decimals; the corpus there needs a network).
"""

import math
from collections import Counter

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.benchmark import Benchmark
from capreolus_tpu.collection import Collection
from capreolus_tpu.core import Dependency, constants
from capreolus_tpu.index import Index
from capreolus_tpu.task import Task
from capreolus_tpu.utils.trec import load_trec_run

NUM_DOCS = 50_000
NUM_TOPICS = 25
BG_VOCAB = 1500
SEED = 20260819

_CONSONANTS = list("bdfgklmnprstvz")
_VOWELS = list("aeiou")


def _word(rng):
    return "".join(rng.choice(_CONSONANTS) + rng.choice(_VOWELS) for _ in range(3))


def _build_corpus():
    """Deterministic synthetic corpus: Zipfian background words plus per-topic
    concept words injected at graded intensities (grade 2: 4-6 concept words,
    grade 1: 2-3, judged non-relevant: exactly 1)."""
    rng = np.random.Generator(np.random.PCG64(SEED))
    vocab = []
    seen = set()
    while len(vocab) < BG_VOCAB:
        w = _word(rng)
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    concept = {t: [f"{_word(rng)}{t:02d}x{j}" for j in range(6)] for t in range(NUM_TOPICS)}

    # Zipfian background draw
    ranks = np.arange(1, BG_VOCAB + 1, dtype=np.float64)
    probs = (1.0 / ranks**1.1)
    probs /= probs.sum()
    vocab_arr = np.asarray(vocab)

    doc_words = []
    for _ in range(NUM_DOCS):
        length = int(rng.integers(25, 60))
        doc_words.append(list(vocab_arr[rng.choice(BG_VOCAB, size=length, p=probs)]))

    qrels = {str(100 + t): {} for t in range(NUM_TOPICS)}
    pool = rng.permutation(NUM_DOCS)
    pos = 0
    for t in range(NUM_TOPICS):
        qid = str(100 + t)
        for grade, count, lo, hi in ((2, 30, 4, 7), (1, 50, 2, 4), (0, 40, 1, 2)):
            for _ in range(count):
                d = int(pool[pos]); pos += 1
                k = int(rng.integers(lo, hi))
                words = list(rng.choice(concept[t], size=k, replace=False))
                insert_at = rng.integers(0, len(doc_words[d]), size=k)
                for w, i in zip(words, insert_at):
                    doc_words[d].insert(int(i), w)
                qrels[qid][f"G{d:05d}"] = grade

    topics = {str(100 + t): " ".join(concept[t][:3]) for t in range(NUM_TOPICS)}
    # a few queries carry a common background word too (scoring noise + ties)
    for t in (0, 7, 19):
        topics[str(100 + t)] += f" {vocab[t]}"
    docs = [(f"G{i:05d}", " ".join(w)) for i, w in enumerate(doc_words)]
    return docs, topics, qrels


_STATE = {}


@pytest.fixture(scope="module")
def golden_env(tmp_path_factory):
    """Module-scoped corpus + cache dirs (the corpus build and index builds are
    shared by every searcher in this module)."""
    base = tmp_path_factory.mktemp("golden")
    docs, topics, qrels = _build_corpus()

    corpus_dir = base / "corpus"
    corpus_dir.mkdir()
    per_file = NUM_DOCS // 4
    for f in range(4):
        with open(corpus_dir / f"part{f}.trec", "wt", encoding="utf-8") as fh:
            for docid, text in docs[f * per_file:(f + 1) * per_file]:
                fh.write(f"<DOC>\n<DOCNO>{docid}</DOCNO>\n<TEXT>\n{text}\n</TEXT>\n</DOC>\n")
    qrel_fn = base / "qrels.txt"
    with open(qrel_fn, "wt", encoding="utf-8") as fh:
        for qid in sorted(qrels):
            for docid, rel in sorted(qrels[qid].items()):
                fh.write(f"{qid} 0 {docid} {rel}\n")
    topic_fn = base / "topics.tsv"
    with open(topic_fn, "wt", encoding="utf-8") as fh:
        for qid in sorted(topics):
            fh.write(f"{qid}\t{topics[qid]}\n")

    _STATE["corpus_dir"] = corpus_dir
    _STATE["qrel_fn"] = qrel_fn
    _STATE["topic_fn"] = topic_fn
    old_cache = constants["CACHE_BASE_PATH"]
    old_results = constants["RESULTS_BASE_PATH"]
    constants["CACHE_BASE_PATH"] = base / "cache"
    constants["RESULTS_BASE_PATH"] = base / "results"
    try:
        yield {"docs": docs, "topics": topics, "qrels": qrels}
    finally:
        constants["CACHE_BASE_PATH"] = old_cache
        constants["RESULTS_BASE_PATH"] = old_results


@Collection.register
class GoldenCollection(Collection):
    module_name = "e2e_golden"
    collection_type = "trec"

    def get_path(self):
        return _STATE["corpus_dir"]


@Benchmark.register
class GoldenBenchmark(Benchmark):
    module_name = "e2e_golden"
    dependencies = [Dependency(key="collection", module="collection", name="e2e_golden")]
    query_type = "title"
    topic_format = "tsv"

    @property
    def qrel_file(self):
        return _STATE["qrel_fn"]

    @property
    def topic_file(self):
        return _STATE["topic_fn"]

    @property
    def folds(self):
        qids = [str(100 + t) for t in range(NUM_TOPICS)]
        return {"s1": {"train_qids": qids, "predict": {"dev": qids, "test": qids}}}


# ------------------------------------------------------------------ referee
def _referee_tokens(golden_env):
    """Analyzer tokens per doc (tokenization parity is pinned elsewhere —
    tests/test_native.py; this module referees scoring + composition)."""
    if "tokens" not in _STATE:
        index = Index.create("tpu", {"collection": {"name": "e2e_golden"}})
        analyzer = index._analyzer()
        _STATE["analyzer"] = analyzer
        _STATE["tokens"] = [analyzer.analyze(text) for _, text in golden_env["docs"]]
    return _STATE["tokens"]


def _referee_postings(golden_env):
    if "inv" not in _STATE:
        tokens = _referee_tokens(golden_env)
        inv = {}
        doclens = np.zeros(NUM_DOCS, dtype=np.int64)
        for d, toks in enumerate(tokens):
            doclens[d] = len(toks)
            for term, tf in Counter(toks).items():
                inv.setdefault(term, []).append((d, tf))
        _STATE["inv"] = inv
        _STATE["doclens"] = doclens
    return _STATE["inv"], _STATE["doclens"]


def _referee_run(golden_env, model="bm25", hits=1000, k1=0.9, b=0.4, mu=1000.0):
    """Brute-force float64 scoring with the engine's exact formulas
    (scoring.py _bm25/_qld docstrings cite the Lucene similarities)."""
    from capreolus_tpu.index.smallfloat import quantize_lengths

    inv, doclens = _referee_postings(golden_env)
    analyzer = _STATE["analyzer"]
    N = NUM_DOCS
    avgdl = doclens.sum() / N
    total_terms = float(doclens.sum())
    dl_norm = quantize_lengths(doclens).astype(np.float64)
    run = {}
    for qid, qtext in golden_env["topics"].items():
        scores = np.zeros(N, dtype=np.float64)
        for term, qtf in Counter(analyzer.analyze(qtext)).items():
            postings = inv.get(term)
            if not postings:
                continue
            d = np.fromiter((p[0] for p in postings), dtype=np.int64, count=len(postings))
            tf = np.fromiter((p[1] for p in postings), dtype=np.float64, count=len(postings))
            if model == "bm25":
                idf = math.log(1.0 + (N - len(postings) + 0.5) / (len(postings) + 0.5))
                scores[d] += qtf * idf * tf / (tf + k1 * (1 - b + b * dl_norm[d] / avgdl))
            else:  # qld: Lucene LMDirichletSimilarity, per-term floor at 0
                cf = sum(p[1] for p in postings) / total_terms
                scores[d] += qtf * np.maximum(np.log1p(tf / (mu * cf))
                                              + np.log(mu / (doclens[d] + mu)), 0.0)
        order = np.lexsort((np.arange(N), -scores))[:hits]  # score desc, ordinal asc
        run[qid] = [(f"G{int(o):05d}", float(scores[o])) for o in order if scores[o] > 0]
    return run


def _ap(ranked, qrels_q, rel_level=1):
    R = sum(1 for rel in qrels_q.values() if rel >= rel_level)
    hits, total = 0, 0.0
    for i, docid in enumerate(ranked, start=1):
        if qrels_q.get(docid, 0) >= rel_level:
            hits += 1
            total += hits / i
    return total / R if R else 0.0


def _ndcg_cut(ranked, qrels_q, k=20):
    dcg = sum(qrels_q.get(d, 0) / math.log2(i + 1) for i, d in enumerate(ranked[:k], start=1))
    ideal = sorted(qrels_q.values(), reverse=True)[:k]
    idcg = sum(rel / math.log2(i + 1) for i, rel in enumerate(ideal, start=1))
    return dcg / idcg if idcg else 0.0


def _referee_metrics(run, qrels):
    aps, ndcgs = [], []
    for qid, ranked in run.items():
        docids = [d for d, _ in ranked]
        aps.append(_ap(docids, qrels.get(qid, {})))
        ndcgs.append(_ndcg_cut(docids, qrels.get(qid, {})))
    return {"map": float(np.mean(aps)), "ndcg_cut_20": float(np.mean(ndcgs))}


def _searcheval(searcher_cfg, **task_cfg):
    task = Task.create("rank", {"benchmark": {"name": "e2e_golden"},
                                "searcher": searcher_cfg, **task_cfg})
    return task.searcheval()["score"]


# ------------------------------------------------------------------- goldens
# Recorded from the first green run (see PARITY.md "e2e golden"); any ordering
# or composition regression anywhere in the stack moves these.
GOLDEN = {
    "BM25": {"map": 0.8736, "ndcg_cut_20": 0.9287},
    "QLDirichlet": {"map": 0.8745, "ndcg_cut_20": 0.9348},
    "BM25RM3": {"map": 0.9753, "ndcg_cut_20": 0.9689},
    "SDM": {"map": 0.8731, "ndcg_cut_20": 0.9326},
    "fusion": {"map": 0.8741, "ndcg_cut_20": 0.9316},
}
TOL = 2e-3  # f32 device sums vs f64 referee: rare adjacent same-grade swaps


def test_bm25_end_to_end_matches_brute_force_referee(golden_env):
    score = _searcheval({"name": "BM25", "index": {"collection": {"name": "e2e_golden"}}})
    ref = _referee_metrics(_referee_run(golden_env, "bm25"), golden_env["qrels"])
    assert score["map"] == pytest.approx(ref["map"], abs=TOL)
    assert score["ndcg_cut_20"] == pytest.approx(ref["ndcg_cut_20"], abs=TOL)
    assert score["map"] == pytest.approx(GOLDEN["BM25"]["map"], abs=TOL)
    assert score["ndcg_cut_20"] == pytest.approx(GOLDEN["BM25"]["ndcg_cut_20"], abs=TOL)
    # the composed run FILE itself honors (score desc, docid asc) ordering
    results_dir = Task.create("rank", {"benchmark": {"name": "e2e_golden"},
                                       "searcher": {"name": "BM25", "index": {
                                           "collection": {"name": "e2e_golden"}}}}).search()
    run_files = [p for p in results_dir.iterdir() if p.name.startswith("searcher_")]
    run = load_trec_run(run_files[0])
    ref_run = _referee_run(golden_env, "bm25")
    for qid in list(ref_run)[:5]:
        got = sorted(run[qid].items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        want = ref_run[qid][:50]
        assert [d for d, _ in got] == [d for d, _ in want], f"top-50 order differs for {qid}"


def test_qld_end_to_end_matches_brute_force_referee(golden_env):
    score = _searcheval({"name": "QLDirichlet", "index": {"collection": {"name": "e2e_golden"}}})
    ref = _referee_metrics(_referee_run(golden_env, "qld"), golden_env["qrels"])
    assert score["map"] == pytest.approx(ref["map"], abs=TOL)
    assert score["ndcg_cut_20"] == pytest.approx(ref["ndcg_cut_20"], abs=TOL)
    assert score["map"] == pytest.approx(GOLDEN["QLDirichlet"]["map"], abs=TOL)


@pytest.mark.parametrize("name", ["BM25RM3", "SDM", "fusion"])
def test_composed_searchers_pinned(golden_env, name):
    cfg = {"name": name, "index": {"collection": {"name": "e2e_golden"}}}
    if name == "fusion":
        cfg = {"name": "fusion",
               "searcher1": {"name": "BM25", "index": {"collection": {"name": "e2e_golden"}}},
               "searcher2": {"name": "QLDirichlet",
                             "index": {"collection": {"name": "e2e_golden"}}}}
    score = _searcheval(cfg)
    assert score["map"] == pytest.approx(GOLDEN[name]["map"], abs=TOL), score
    assert score["ndcg_cut_20"] == pytest.approx(GOLDEN[name]["ndcg_cut_20"], abs=TOL), score
