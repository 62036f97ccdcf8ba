import math

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.collection import Collection
from capreolus_tpu.index import Index
from capreolus_tpu.index.smallfloat import byte4_to_int, int_to_byte4, quantize_lengths
from capreolus_tpu.searcher import Searcher


@pytest.fixture
def dummy_index(tmpdir_as_cache):
    index = Index.create("tpu", {"collection": {"name": "dummy"}})
    index.create_index()
    return index


def test_create_index_idempotent(tmpdir_as_cache):
    index = Index.create("tpu", {"collection": {"name": "dummy"}})
    assert not index.exists()
    index.create_index()
    assert index.exists()
    index.create_index()  # no-op
    assert index.exists()


def test_get_docs(dummy_index):
    doc = dummy_index.get_doc("D001")
    assert doc == "January Orbital telescope launched The telescope observed distant galaxies from orbit."
    docs = dummy_index.get_docs(["D002", "D003"])
    assert docs[0].startswith("Ocean expedition Marine biologists")
    assert docs[1].startswith("Galaxies collide")
    assert dummy_index.get_doc("NOPE") is None


def test_df_idf(dummy_index):
    # 'telescope' -> 'telescop' appears in D001 (x2) and D002
    assert dummy_index.get_df("telescop") == 2
    assert dummy_index.get_df("galaxi") == 2
    assert dummy_index.get_df("whale") == 1
    assert dummy_index.get_df("notaterm") == 0
    # Lucene BM25 idf = ln(1 + (N - df + 0.5)/(df + 0.5)) with N=3, df=2
    assert dummy_index.get_idf("telescop") == pytest.approx(math.log(1.6))
    assert dummy_index.get_idf("notaterm") == 0.0


def test_doclens_and_stats(dummy_index):
    data = dummy_index.data
    assert data.num_docs == 3
    # analyzed lengths: D001=10, D002=11, D003=10 ('from'/'them' are not Lucene stopwords)
    assert sorted(data.doclens.tolist()) == [10, 10, 11]
    assert data.avgdl == pytest.approx(31 / 3)
    # postings are impact-sorted within each term: telescop tf2 (D001) before tf1 (D002)
    tid = data.vocab["telescop"]
    docs, tfs = data.postings(tid)
    assert tfs.tolist() == [2, 1]


def test_smallfloat():
    # exact through 39, quantized beyond
    for v in [0, 1, 23, 24, 39, 40]:
        assert byte4_to_int(int_to_byte4(v)) == v
    assert byte4_to_int(int_to_byte4(41)) == 40
    assert byte4_to_int(int_to_byte4(100)) == 96
    # 1000: (1000-24)=976 keeps top 4 bits -> 960, +24 = 984
    assert quantize_lengths(np.array([5, 41, 1000])).tolist() == [5, 40, 984]
    # quantization only drops bits below the top 4 significant bits
    for v in [55, 123, 1023, 65537]:
        q = byte4_to_int(int_to_byte4(v))
        assert q <= v < 2 * q


def _search(searcher, topics, tmp_path):
    tmp_path.mkdir(parents=True, exist_ok=True)
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("".join(f"{qid}\t{q}\n" for qid, q in topics))
    outdir = tmp_path / "results"
    searcher.query_from_file(topicsfn, outdir)
    runs = {}
    for fn in sorted(outdir.iterdir()):
        if fn.name != "done":
            runs[fn.name] = Searcher.load_trec_run(fn)
    return runs


def test_bm25_exact_scores(tmpdir_as_cache, tmp_path):
    searcher = Searcher.create("BM25", {"index": {"collection": {"name": "dummy"}}})
    runs = _search(searcher, [("1", "telescope")], tmp_path)
    assert len(runs) == 1
    run = next(iter(runs.values()))["1"]
    idf = math.log(1.6)
    # D001: tf=2, dl=10; D002: tf=1, dl=11; avgdl=31/3, k1=0.9, b=0.4
    avgdl = 31 / 3
    exp_d1 = idf * 2 / (2 + 0.9 * (1 - 0.4 + 0.4 * 10 / avgdl))
    exp_d2 = idf * 1 / (1 + 0.9 * (1 - 0.4 + 0.4 * 11 / avgdl))
    assert run["D001"] == pytest.approx(exp_d1, rel=1e-5)
    assert run["D002"] == pytest.approx(exp_d2, rel=1e-5)
    assert "D003" not in run


def test_bm25_multi_term_and_qtf(tmpdir_as_cache, tmp_path):
    searcher = Searcher.create("BM25", {"index": {"collection": {"name": "dummy"}}})
    runs = _search(searcher, [("1", "distant galaxies"), ("2", "galaxies galaxies")], tmp_path)
    run = next(iter(runs.values()))
    # qtf weighting: duplicated term doubles the score
    single = _search(searcher, [("3", "galaxies")], tmp_path / "x")
    sg = next(iter(single.values()))["3"]
    assert run["2"]["D003"] == pytest.approx(2 * sg["D003"], rel=1e-5)
    # multi-term sums both contributions
    assert run["1"]["D001"] > sg["D001"]


def test_bm25_grid_search(tmpdir_as_cache, tmp_path):
    searcher = Searcher.create("BM25", {"k1": "0.9,1.2", "b": "0.4,0.8", "index": {"collection": {"name": "dummy"}}})
    runs = _search(searcher, [("1", "telescope")], tmp_path)
    assert len(runs) == 4
    # each combo produces the correct parameterized scores
    idf = math.log(1.6)
    for tag, run in runs.items():
        params = dict(p.split("-", 1) for p in tag.split("_")[2:])
        k1, b = float(params["k1"]), float(params["b"])
        exp = idf * 2 / (2 + k1 * (1 - b + b * 10 / (31 / 3)))
        assert run["1"]["D001"] == pytest.approx(exp, rel=1e-5), tag


@pytest.mark.parametrize("name", ["QLDirichlet", "QLJM", "INL2", "SPL", "F2Exp", "F2Log", "BM25Grid", "BM25RM3"])
def test_other_searchers_run(tmpdir_as_cache, tmp_path, name):
    config = {"index": {"collection": {"name": "dummy"}}}
    if name == "BM25Grid":
        config.update({"k1max": 0.3, "bmax": 0.3, "k1min": 0.1, "bmin": 0.1, "step": 0.1})
    searcher = Searcher.create(name, config)
    runs = _search(searcher, [("1", "telescope galaxies"), ("2", "whales ocean")], tmp_path)
    assert len(runs) >= 1
    for run in runs.values():
        assert run["1"], f"{name} returned no docs"
        # D003 has galaxies; D001+D002 have telescope
        assert set(run["1"]) <= {"D001", "D002", "D003"}


def test_qld_exact(tmpdir_as_cache, tmp_path):
    searcher = Searcher.create("QLDirichlet", {"mu": [1000], "index": {"collection": {"name": "dummy"}}})
    runs = _search(searcher, [("1", "whales")], tmp_path)
    run = next(iter(runs.values()))["1"]
    # Lucene LMDirichlet: log(1 + tf/(mu*P(t|C))) + log(mu/(dl+mu)); whale: cf=1, total=31
    mu, ptc, dl = 1000.0, 1 / 31, 11.0
    exp = math.log(1 + 1 / (mu * ptc)) + math.log(mu / (dl + mu))
    assert run["D002"] == pytest.approx(max(0.0, exp), rel=1e-4)


def test_searcher_interactive_query(tmpdir_as_cache):
    searcher = Searcher.create("BM25", {"index": {"collection": {"name": "dummy"}}})
    results = searcher.query("galaxies collide")
    assert results["D003"] > results["D001"]


def test_rm3_expands(tmpdir_as_cache, tmp_path):
    searcher = Searcher.create(
        "BM25RM3",
        {"fbDocs": [2], "fbTerms": [5], "index": {"collection": {"name": "dummy"}}},
    )
    runs = _search(searcher, [("1", "telescope")], tmp_path)
    run = next(iter(runs.values()))["1"]
    # expansion terms from D001/D002 should now retrieve D003 (shares 'galaxi')
    assert "D001" in run and "D002" in run


def test_sdm_ordered_window_adjacency():
    """#od1 counts only adjacent pairs (diff == 1), matching Indri/Anserini."""
    import numpy as np

    from capreolus_tpu.searcher.feedback import _window_counts

    tokens = np.array([5, 7, 9, 5, 9, 7], dtype=np.int64)
    # t1=5 at positions 0,3; t2=7 at positions 1,5
    od, uw = _window_counts(tokens, 5, 7, ordered_gap=1, unordered_window=8)
    assert od == 1  # only (0 -> 1) is adjacent; (3 -> 5) has a gap
    od2, _ = _window_counts(tokens, 5, 7, ordered_gap=2, unordered_window=8)
    assert od2 == 2


def test_scoring_engine_accumulator_overflow_guard():
    import numpy as np
    import pytest as _pytest

    from capreolus_tpu.searcher.scoring import ScoringEngine

    class FakeDindex:
        num_docs = 2**26

    eng = ScoringEngine.__new__(ScoringEngine)
    eng.dindex = FakeDindex()
    with _pytest.raises(ValueError, match="overflows"):
        eng._check_accumulator_bounds(64)
    eng._check_accumulator_bounds(16)  # under the limit: fine


def test_sdm_bm25_window_semantics(tmpdir_as_cache, tmp_path):
    """SDM defaults to Anserini/Lucene semantics: BM25 unigrams (k1/b grid) with
    BM25-scored window pseudo-terms; unigram=qld selects the Indri formulation."""
    searcher = Searcher.create("SDM", {"k1": "0.9,1.2", "b": [0.4],
                                       "index": {"storepositions": True, "collection": {"name": "dummy"}}})
    runs = _search(searcher, [("1", "distant galaxies")], tmp_path)
    assert len(runs) == 2  # k1 grid
    for tag, run in runs.items():
        assert "k1-" in tag and "b-" in tag
        assert run["1"]
        # window pseudo-terms only ADD for docs containing the ordered bigram;
        # every score must be >= tw * plain-BM25 contribution (positive here)
        assert all(v > 0 for v in run["1"].values())

    qld = Searcher.create("SDM", {"unigram": "qld", "mu": [500],
                                  "index": {"storepositions": True, "collection": {"name": "dummy"}}})
    runs_qld = _search(qld, [("1", "distant galaxies")], tmp_path / "qld")
    assert any("mu-" in tag for tag in runs_qld)


def test_postings_mmap_disk_resident(tmpdir_as_cache):
    """Postings arrays are memory-mapped by default (disk-resident index like
    Lucene's); mmap=False loads them to RAM with identical content, and the
    option does not change the cache path (results-invariant)."""
    import numpy as np

    from capreolus_tpu.index import Index

    idx = Index.create("tpu", {"collection": {"name": "dummy"}})
    idx.create_index()
    assert isinstance(idx.data.doc_ids, np.memmap)
    assert isinstance(idx.data.tfs, np.memmap)

    ram = Index.create("tpu", {"mmap": False, "collection": {"name": "dummy"}})
    assert not isinstance(ram.data.doc_ids, np.memmap)
    np.testing.assert_array_equal(np.asarray(idx.data.doc_ids), ram.data.doc_ids)
    np.testing.assert_array_equal(np.asarray(idx.data.tfs), ram.data.tfs)
    assert idx.get_index_path() == ram.get_index_path()


def test_engine_explain_matches_search(tmpdir_as_cache):
    """Lucene-Explanation analog: explain()'s per-term contributions sum to
    the engine's retrieved score (bm25 and qld), and absent terms contribute
    exactly 0."""
    import pytest as _pytest

    from capreolus_tpu.index import Index
    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    index = Index.create("tpu", {"collection": {"name": "dummy"}})
    index.create_index()
    data = index.data
    engine = ScoringEngine(DeviceIndex(data))
    term_list = [(data.vocab["telescop"], 1.0), (data.vocab["galaxi"], 1.0)]

    for model, params in (("bm25", {"k1": 0.9, "b": 0.4}), ("qld", {"mu": 1000.0})):
        scores, ords = engine.search([term_list], model=model, params=params, topk=3)
        for s, o in zip(scores[0], ords[0]):
            if int(o) >= data.num_docs:
                continue
            exp = engine.explain(term_list, int(o), model=model, params=params)
            assert exp["total"] == _pytest.approx(float(s), rel=1e-5, abs=1e-5), (model, int(o))
            for row in exp["terms"]:
                # absent terms contribute exactly 0 (present terms may too:
                # qld floors per-term scores at 0, scoring.py _qld)
                if row["tf"] == 0.0:
                    assert row["contribution"] == 0.0

    # out-of-vocabulary term ids explain as zero, never crash
    exp = engine.explain([(10**6, 1.0)], 0, model="bm25")
    assert exp["total"] == 0.0


def test_disk_tile_cache(tmpdir_as_cache):
    """With index.mmap (default), the scoring engine's tile payloads are ALSO
    disk-resident: built once into <index>/tiles/, memory-mapped on every
    DeviceIndex construction, and equal to the in-RAM (mmap=False) payloads —
    otherwise the padded tile arrays would silently re-materialize O(postings)
    in host RAM and defeat the disk-resident index."""
    import numpy as np

    from capreolus_tpu.index import Index
    from capreolus_tpu.searcher.scoring import DeviceIndex

    idx = Index.create("tpu", {"collection": {"name": "dummy"}})
    idx.create_index()
    assert idx.data.tile_dir is not None
    d1 = DeviceIndex(idx.data)
    tiles_dir = idx.get_index_path() / "tiles"
    assert (tiles_dir / "done").exists()
    assert (tiles_dir / "doc_ids.npy").exists()
    meta_mtime = (tiles_dir / "meta.npz").stat().st_mtime_ns

    # second construction reuses the cache (no rebuild)
    d2 = DeviceIndex(idx.data)
    assert (tiles_dir / "meta.npz").stat().st_mtime_ns == meta_mtime

    ram = Index.create("tpu", {"mmap": False, "collection": {"name": "dummy"}})
    assert ram.data.tile_dir is None
    d3 = DeviceIndex(ram.data)
    np.testing.assert_array_equal(np.asarray(d1.doc_tiles), np.asarray(d3.doc_tiles))
    np.testing.assert_array_equal(
        np.asarray(d1.tf_tiles, dtype=np.float32), np.asarray(d3.tf_tiles, dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(d1.norm_dl_tiles, dtype=np.float32),
        np.asarray(d3.norm_dl_tiles, dtype=np.float32))
    # the QL-family exact-dl payload is disk-cached too
    np.testing.assert_array_equal(np.asarray(d2.exact_dl_tiles_np), np.asarray(d3.exact_dl_tiles_np))
    assert (tiles_dir / "exact_dl.npy").exists()

    # streaming mode over the mmapped cache: payload views are memmap-backed
    d4 = DeviceIndex(idx.data, hbm_budget=1)
    assert d4.streaming
    assert isinstance(d4.doc_tiles_np, np.memmap) or d4.doc_tiles_np.base is not None
