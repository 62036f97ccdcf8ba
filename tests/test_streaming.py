"""Host-streaming postings path (VERDICT round 2 next-step #1: the HBM wall).

Lucene's inverted index is disk-resident and handles corpora far larger than
RAM (/root/reference/capreolus/index/anserini.py:22-71 builds GOV2-scale
indexes); the TPU engine's equivalent keeps postings tiles in host memory when
they exceed an HBM budget and streams each batch's working set (the unique
tiles its work units touch) to the device as bucketed jit-argument buffers.
These tests pin the contract: streaming results are bit-identical to the
HBM-resident engine on a corpus 4x over the configured budget, for exhaustive,
block-max-pruned, capped, and QL scoring.
"""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine
from tests.test_block_max import _make_corpus

PARAMS = {"k1": 0.9, "b": 0.4}


@pytest.fixture(scope="module")
def engines():
    data, rng = _make_corpus(seed=11, num_docs=30000, nnz=600_000)
    resident = ScoringEngine(DeviceIndex(data))
    budget = resident.dindex.tile_bytes / 4  # corpus is 4x over the budget
    streaming = ScoringEngine(DeviceIndex(data, hbm_budget=budget))
    assert streaming.dindex.streaming and not resident.dindex.streaming
    df = np.diff(data.term_offsets)
    cands = np.where(df > 30)[0]
    queries = [[(int(t), 1.0) for t in rng.choice(cands, size=4, replace=False)]
               for _ in range(24)]
    return resident, streaming, queries


@pytest.mark.parametrize("topk", [10, 1000])
def test_streaming_bit_identical(engines, topk):
    resident, streaming, queries = engines
    es, eo = resident.search(queries, model="bm25", params=PARAMS, topk=topk, exact_topk=False)
    ss, so = streaming.search(queries, model="bm25", params=PARAMS, topk=topk)
    np.testing.assert_array_equal(eo, so)
    np.testing.assert_array_equal(es, ss)
    st = streaming.last_stream_stats
    assert 0 < st["tiles_uploaded"] < st["total_tiles"]  # a working SET, not the corpus


def test_streaming_with_pruning_and_caps(engines):
    resident, streaming, queries = engines
    es, eo = resident.search(queries, model="bm25", params=PARAMS, topk=10, exact_topk=False)
    ps, po = streaming.search_pruned(queries, model="bm25", params=PARAMS, topk=10)
    np.testing.assert_array_equal(np.asarray(eo), np.asarray(po))
    np.testing.assert_array_equal(np.asarray(es), np.asarray(ps))
    # approximate caps stream the same capped span set
    cs, co = resident.search(queries, model="bm25", params=PARAMS, topk=10, max_postings_per_term=64)
    ts, to = streaming.search(queries, model="bm25", params=PARAMS, topk=10, max_postings_per_term=64)
    np.testing.assert_array_equal(np.asarray(co), np.asarray(to))
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(ts))


def test_streaming_ql_family(engines):
    """Non-BM25 models stream the lazily-materialized exact-dl payload."""
    resident, streaming, queries = engines
    rs, ro = resident.search(queries, model="qld", params={"mu": 1000.0}, topk=10, exact_topk=False)
    qs, qo = streaming.search(queries, model="qld", params={"mu": 1000.0}, topk=10)
    np.testing.assert_array_equal(np.asarray(ro), np.asarray(qo))
    np.testing.assert_array_equal(np.asarray(rs), np.asarray(qs))


def test_searcher_hbmbudget_config(tmpdir_as_cache, tmp_path):
    """searcher.hbmbudget selects streaming mode transparently; run files match
    the resident default, and the option stays out of the cache path."""
    from capreolus_tpu.searcher import Searcher

    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("1\ttelescope galaxies\n2\twhales ocean\n")
    resident = Searcher.create("BM25", {"index": {"collection": {"name": "dummy"}}})
    run_r = Searcher.load_trec_run(next(f for f in resident.query_from_file(topicsfn, tmp_path / "r").iterdir()
                                        if f.name != "done"))
    tiny = Searcher.create("BM25", {"hbmbudget": 1e-6, "index": {"collection": {"name": "dummy"}}})
    run_s = Searcher.load_trec_run(next(f for f in tiny.query_from_file(topicsfn, tmp_path / "s").iterdir()
                                        if f.name != "done"))
    assert tiny.get_engine().dindex.streaming
    assert run_r == run_s
    assert resident.get_cache_path() == tiny.get_cache_path()
