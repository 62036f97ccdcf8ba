"""Impact-ordered early termination (max_postings_per_term).

Postings are impact-sorted at index build (index/tpu.py lexsort by -tf), so a
per-term prefix keeps each term's highest-impact postings. The capped search is
APPROXIMATE: scores are partial sums (never exceed exact) and recall degrades
gracefully. These tests pin: cap >= df is bit-identical to exact, capped scores
are bounded by exact scores, and top-k overlap stays high on a synthetic corpus.
"""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine


@pytest.fixture(scope="module")
def synth():
    from capreolus_tpu.index.smallfloat import quantize_lengths
    from capreolus_tpu.index.tpu import IndexData

    rng = np.random.Generator(np.random.PCG64(3))
    num_docs, num_terms, nnz = 5000, 400, 120_000
    term_ids = rng.zipf(1.4, size=nnz * 2)
    term_ids = term_ids[term_ids <= num_terms][:nnz] - 1
    doc_ords = rng.integers(0, num_docs, size=len(term_ids))
    key, counts = np.unique(term_ids * num_docs + doc_ords, return_counts=True)
    term_ids, doc_ords = key // num_docs, key % num_docs
    tfs = np.minimum(counts + rng.integers(0, 4, size=len(key)), 32)

    order = np.lexsort((doc_ords, -tfs, term_ids))
    term_ids, doc_ords, tfs = term_ids[order], doc_ords[order], tfs[order]
    offsets = np.zeros(num_terms + 1, dtype=np.int64)
    np.cumsum(np.bincount(term_ids, minlength=num_terms), out=offsets[1:])
    doclens = np.maximum(np.bincount(doc_ords, weights=tfs, minlength=num_docs), 1).astype(np.int32)
    data = IndexData(term_offsets=offsets, doc_ids=doc_ords.astype(np.int32), tfs=tfs.astype(np.int32),
                     doclens=doclens, norm_doclens=quantize_lengths(doclens).astype(np.int32),
                     docid_strings=None, vocab=None)
    engine = ScoringEngine(DeviceIndex(data))
    queries = [[(int(t), 1.0) for t in rng.choice(np.where(np.diff(offsets) > 20)[0], 4, replace=False)]
               for _ in range(16)]
    return engine, queries


def _run(engine, queries, cap, topk=100):
    scores, ords = engine.search(queries, model="bm25", params={"k1": 0.9, "b": 0.4},
                                 topk=topk, max_postings_per_term=cap)
    return np.asarray(scores), np.asarray(ords)


def test_cap_above_df_is_exact(synth):
    engine, queries = synth
    exact_s, exact_o = _run(engine, queries, cap=0)
    capped_s, capped_o = _run(engine, queries, cap=10**9)
    np.testing.assert_array_equal(exact_o, capped_o)
    np.testing.assert_array_equal(exact_s, capped_s)


def test_capped_scores_bounded_and_overlap(synth):
    engine, queries = synth
    exact_s, exact_o = _run(engine, queries, cap=0)
    capped_s, capped_o = _run(engine, queries, cap=200)

    overlaps = []
    for qi in range(len(queries)):
        exact_run = dict(zip(exact_o[qi].tolist(), exact_s[qi].tolist()))
        for doc, score in zip(capped_o[qi].tolist(), capped_s[qi].tolist()):
            if doc in exact_run:  # partial sums never exceed the exact score
                assert score <= exact_run[doc] + 1e-4
        overlaps.append(len(set(exact_o[qi][:10].tolist()) & set(capped_o[qi][:10].tolist())) / 10)
    # high-impact prefixes keep nearly all of the true top-10
    assert np.mean(overlaps) >= 0.8, f"mean top-10 overlap {np.mean(overlaps):.2f}"


def test_cap_shrinks_device_work(synth):
    engine, queries = synth
    packed_exact, *_ = engine._build_tiered(queries, "bm25", max_postings=0)
    packed_capped, *_ = engine._build_tiered(queries, "bm25", max_postings=100)
    assert packed_capped.shape[-1] < packed_exact.shape[-1]


def test_searcher_maxpostings_config(tmpdir_as_cache, tmp_path):
    from capreolus_tpu.searcher import Searcher

    searcher = Searcher.create("BM25", {"maxpostings": 1, "index": {"collection": {"name": "dummy"}}})
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("1\ttelescope\n")
    searcher.index.create_index()
    searcher.query_from_file(topicsfn, tmp_path / "out")
    run = Searcher.load_trec_run(next(f for f in (tmp_path / "out").iterdir() if f.name != "done"))
    # telescope appears in D001 (tf 2) and D002 (tf 1): cap=1 keeps only the
    # highest-impact posting
    assert list(run["1"]) == ["D001"]
