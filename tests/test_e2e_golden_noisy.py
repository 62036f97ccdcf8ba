"""Noisy-graded e2e effectiveness golden at NON-saturated MAP (VERDICT r4 #8).

tests/test_e2e_golden.py pins the composed rank pipeline in a saturated regime
(MAP 0.87-0.98): relevant docs sit far above everything, so a subtly wrong idf
or length norm can reorder scores without moving the pins. This module builds a
corpus that lands mid-range (MAP ~0.3-0.6) where ranking-quality changes DO
move the metric:

- distractor docs share query terms with the relevant docs at overlapping
  term-frequency intensity (a judged-non-relevant pool 5x the relevant pool,
  plus unjudged noise docs carrying query terms);
- graded labels carry deterministic injected noise (a slice of the relevant
  pool is down/up-graded), keeping the eval regime honest;
- a built-in sensitivity proof: scoring the SAME corpus with a perturbed idf
  (df+25) must drop referee MAP by a pinned margin — evidence that these pins
  sit on a slope, not a plateau.

BM25 and QLD are equality-checked against the float64 brute-force referee (same
independent AP/nDCG implementations as the saturated golden), and pinned.
Recapture pins with ``pytest tests/test_e2e_golden_noisy.py -s`` after
intentional scoring changes. Mirrors /root/reference/docs/quick.md:24-29's
real-corpus pins (NFCorpus BM25 MAP 0.1520 — also a mid-range regime).
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

NUM_DOCS = 12_000
NUM_TOPICS = 20
BG_VOCAB = 1200
SEED = 20260820

_CONSONANTS = list("bdfgklmnprstvz")
_VOWELS = list("aeiou")


def _word(rng):
    return "".join(rng.choice(_CONSONANTS) + rng.choice(_VOWELS) for _ in range(3))


def _build_corpus():
    rng = np.random.Generator(np.random.PCG64(SEED))
    vocab, seen = [], set()
    while len(vocab) < BG_VOCAB:
        w = _word(rng)
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    # two query words per topic with deliberately DIFFERENT document
    # frequencies (one also appears in background noise docs), so their idf
    # balance decides many relevant-vs-distractor orderings
    concept = {t: [f"{_word(rng)}n{t:02d}a", f"{_word(rng)}n{t:02d}b"]
               for t in range(NUM_TOPICS)}

    ranks = np.arange(1, BG_VOCAB + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    vocab_arr = np.asarray(vocab)

    doc_words = []
    for _ in range(NUM_DOCS):
        length = int(rng.integers(20, 80))  # wide length spread: b-norm matters
        doc_words.append(list(vocab_arr[rng.choice(BG_VOCAB, size=length, p=probs)]))

    def inject(d, words):
        at = rng.integers(0, len(doc_words[d]) + 1, size=len(words))
        for w, i in zip(words, at):
            doc_words[d].insert(int(i), w)

    qrels = {str(500 + t): {} for t in range(NUM_TOPICS)}
    pool = rng.permutation(NUM_DOCS)
    pos = 0
    for t in range(NUM_TOPICS):
        qid = str(500 + t)
        a, b = concept[t]
        # relevant pool: ONE query word (90% the rare term a), tf 1-2 — the
        # same intensity band as the distractors, so relevant-vs-distractor
        # ordering rides the idf BALANCE between the two query terms plus the
        # length norm (continuous band overlap, knob-swept to MAP ~0.45)
        for j in range(12):
            d = int(pool[pos]); pos += 1
            term = a if rng.random() < 0.9 else b
            inject(d, [term] * int(rng.integers(1, 3)))
            # graded-label noise: a deterministic slice of the relevant pool is
            # down-graded to 1; two docs are mislabeled 0 entirely (pool noise)
            grade = 2 if j < 6 else 1
            if j >= 10:
                grade = 0
            qrels[qid][f"N{d:05d}"] = grade
        # judged distractors: one query word tf 1-2, biased toward the common
        # term b — b-tf2 docs interleave with a-tf1 relevant docs, and where
        # they land depends on idf_a/idf_b
        for _ in range(20):
            d = int(pool[pos]); pos += 1
            inject(d, [a if rng.random() < 0.3 else b] * int(rng.integers(1, 3)))
            qrels[qid][f"N{d:05d}"] = 0

    # unjudged noise docs drive the two terms' document frequencies apart
    # (a stays rare, b goes common): the idf gap IS the ranking signal the
    # sensitivity proof perturbs
    for t in range(NUM_TOPICS):
        a, b = concept[t]
        for _ in range(4):
            d = int(pool[pos]); pos += 1
            inject(d, [a])
        for _ in range(25):
            d = int(pool[pos]); pos += 1
            inject(d, [b])

    topics = {str(500 + t): " ".join(concept[t]) for t in range(NUM_TOPICS)}
    docs = [(f"N{i:05d}", " ".join(w)) for i, w in enumerate(doc_words)]
    return docs, topics, qrels


_STATE = {}


@pytest.fixture(scope="module")
def noisy_env(tmp_path_factory):
    base = tmp_path_factory.mktemp("golden_noisy")
    docs, topics, qrels = _build_corpus()
    corpus_dir = base / "corpus"
    corpus_dir.mkdir()
    with open(corpus_dir / "docs.trec", "wt", encoding="utf-8") as fh:
        for docid, text in docs:
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
class NoisyGoldenCollection(Collection):
    module_name = "e2e_golden_noisy"
    collection_type = "trec"

    def get_path(self):
        return _STATE["corpus_dir"]


@Benchmark.register
class NoisyGoldenBenchmark(Benchmark):
    module_name = "e2e_golden_noisy"
    dependencies = [Dependency(key="collection", module="collection", name="e2e_golden_noisy")]
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
        qids = [str(500 + t) for t in range(NUM_TOPICS)]
        return {"s1": {"train_qids": qids, "predict": {"dev": qids, "test": qids}}}


# ------------------------------------------------------------------ referee
def _referee_run(noisy_env, model="bm25", hits=1000, k1=0.9, b=0.4, mu=1000.0,
                 df_perturb=0):
    """Float64 brute-force scoring (engine formulas, independent code);
    df_perturb shifts every term's document frequency for the sensitivity
    proof — 0 is the faithful referee."""
    from capreolus_tpu.index.smallfloat import quantize_lengths

    if "inv" not in _STATE:
        index = Index.create("tpu", {"collection": {"name": "e2e_golden_noisy"}})
        analyzer = index._analyzer()
        tokens = [analyzer.analyze(text) for _, text in noisy_env["docs"]]
        inv, doclens = {}, np.zeros(NUM_DOCS, dtype=np.int64)
        for d, toks in enumerate(tokens):
            doclens[d] = len(toks)
            for term, tf in Counter(toks).items():
                inv.setdefault(term, []).append((d, tf))
        _STATE.update(analyzer=analyzer, inv=inv, doclens=doclens)
    inv, doclens, analyzer = _STATE["inv"], _STATE["doclens"], _STATE["analyzer"]
    N = NUM_DOCS
    avgdl = doclens.sum() / N
    total_terms = float(doclens.sum())
    dl_norm = quantize_lengths(doclens).astype(np.float64)
    run = {}
    for qid, qtext in noisy_env["topics"].items():
        scores = np.zeros(N, dtype=np.float64)
        for term, qtf in Counter(analyzer.analyze(qtext)).items():
            postings = inv.get(term)
            if not postings:
                continue
            d = np.fromiter((p[0] for p in postings), dtype=np.int64, count=len(postings))
            tf = np.fromiter((p[1] for p in postings), dtype=np.float64, count=len(postings))
            df = max(1, len(postings) + df_perturb)
            if model == "bm25":
                idf = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
                scores[d] += qtf * idf * tf / (tf + k1 * (1 - b + b * dl_norm[d] / avgdl))
            else:  # Lucene LMDirichletSimilarity, per-term floor at 0
                cf = sum(p[1] for p in postings) / total_terms
                scores[d] += qtf * np.maximum(np.log1p(tf / (mu * cf))
                                              + np.log(mu / (doclens[d] + mu)), 0.0)
        order = np.lexsort((np.arange(N), -scores))[:hits]
        run[qid] = [(f"N{int(o):05d}", float(scores[o])) for o in order if scores[o] > 0]
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


def _searcheval(searcher_cfg):
    task = Task.create("rank", {"benchmark": {"name": "e2e_golden_noisy"},
                                "searcher": searcher_cfg})
    return task.searcheval()["score"]


# ------------------------------------------------------------------- goldens
# Recorded from the first green run; recapture with pytest -s after
# intentional scoring changes (tests print the score dicts).
GOLDEN = {
    "BM25": {"map": 0.4730, "ndcg_cut_20": 0.5506},
    "QLDirichlet": {"map": 0.5135, "ndcg_cut_20": 0.5879},
}
# wider than the saturated golden's 2e-3: this regime is DESIGNED so adjacent
# docs sit close in score, which also amplifies f32-device-vs-f64-referee
# swaps (measured 2.1e-3 on BM25). Still 12x below the 4.9e-2 sensitivity
# delta the slope test pins.
TOL = 4e-3


def test_noisy_bm25_matches_referee_and_sits_midrange(noisy_env):
    score = _searcheval({"name": "BM25", "index": {"collection": {"name": "e2e_golden_noisy"}}})
    ref = _referee_metrics(_referee_run(noisy_env, "bm25"), noisy_env["qrels"])
    print("noisy BM25:", score, "referee:", ref)
    assert score["map"] == pytest.approx(ref["map"], abs=TOL)
    assert score["ndcg_cut_20"] == pytest.approx(ref["ndcg_cut_20"], abs=TOL)
    assert score["map"] == pytest.approx(GOLDEN["BM25"]["map"], abs=TOL)
    assert score["ndcg_cut_20"] == pytest.approx(GOLDEN["BM25"]["ndcg_cut_20"], abs=TOL)
    # the regime is mid-range by construction — saturation voids the proof
    assert 0.25 < score["map"] < 0.65, score


def test_noisy_qld_matches_referee(noisy_env):
    score = _searcheval({"name": "QLDirichlet", "index": {"collection": {"name": "e2e_golden_noisy"}}})
    ref = _referee_metrics(_referee_run(noisy_env, "qld"), noisy_env["qrels"])
    print("noisy QLD:", score, "referee:", ref)
    assert score["map"] == pytest.approx(ref["map"], abs=TOL)
    assert score["map"] == pytest.approx(GOLDEN["QLDirichlet"]["map"], abs=TOL)
    assert score["ndcg_cut_20"] == pytest.approx(GOLDEN["QLDirichlet"]["ndcg_cut_20"], abs=TOL)
    assert 0.25 < score["map"] < 0.65, score


def test_noisy_pins_sit_on_a_slope(noisy_env):
    """Sensitivity proof: a subtly wrong idf (every df shifted by +25, ~0.1-0.3
    nats on these terms) must move referee MAP by MORE than the pin tolerance —
    i.e. the class of regression the saturated golden can absorb is visible
    here. If this margin collapses, the corpus has drifted saturated and the
    pins are decorative again."""
    faithful = _referee_metrics(_referee_run(noisy_env, "bm25"), noisy_env["qrels"])
    perturbed = _referee_metrics(_referee_run(noisy_env, "bm25", df_perturb=25),
                                 noisy_env["qrels"])
    delta = abs(faithful["map"] - perturbed["map"])
    print(f"sensitivity: faithful map={faithful['map']:.4f} "
          f"perturbed map={perturbed['map']:.4f} delta={delta:.4f}")
    assert delta > 10 * TOL, (faithful, perturbed)
