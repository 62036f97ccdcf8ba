"""Incremental indexing: Lucene IndexWriter-style add/delete + generation merges.

The reference inherits append/delete/merge from Lucene via Anserini
(/root/reference/capreolus/index/anserini.py builds through Lucene's
IndexWriter). These tests pin the capability's core contract: an index grown
by add_documents / delete_documents is EXACTLY the index a from-scratch build
over the same surviving corpus would produce — bit-identical run files, doc
stats, prune tables, forward index — so every engine downstream is oblivious.
"""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.collection import Collection
from capreolus_tpu.core import ConfigError, ConfigOption
from capreolus_tpu.index import Index
from capreolus_tpu.searcher import Searcher

WORDS = [
    "ocean", "galaxy", "telescope", "whale", "comet", "reef", "orbit", "plankton",
    "nebula", "current", "tide", "star", "coral", "probe", "sonar", "lens",
]


def _make_docs(n, seed=7):
    rng = np.random.Generator(np.random.PCG64(seed))
    docs = []
    for i in range(n):
        length = int(rng.integers(5, 40))
        words = rng.choice(WORDS, size=length)
        docs.append((f"D{i:04d}", " ".join(words.tolist())))
    return docs


ALL_DOCS = _make_docs(60)
_SLICE = {"first": None}  # docids the registered collection yields


@Collection.register
class SliceableCollection(Collection):
    """Yields a configurable prefix of ALL_DOCS (so a fresh build over any
    prefix can referee the incrementally grown index)."""

    module_name = "incr_sliceable"
    collection_type = "tsv"
    config_spec = Collection.config_spec + [ConfigOption("take", 40, "docs to yield")]

    def get_path(self):
        cache = self.get_cache_path() / "corpus"
        fn = cache / "docs.tsv"
        if not fn.exists():
            cache.mkdir(parents=True, exist_ok=True)
            with open(fn, "wt", encoding="utf-8") as f:
                for docid, text in ALL_DOCS[: self.config["take"]]:
                    f.write(f"{docid}\t{text}\n")
        return cache


def _fresh_index(take, tmp_extra=None, **index_cfg):
    cfg = {"collection": {"name": "incr_sliceable", "take": take}}
    cfg.update(index_cfg)
    index = Index.create("tpu", cfg)
    index.create_index()
    return index


def _search_bm25(index_cfg, hits=20):
    searcher = Searcher.create("BM25", {"hits": hits, "index": index_cfg})
    engine = searcher.get_engine()
    runs = {}
    for qid, text in [("q1", "galaxy telescope orbit"), ("q2", "whale ocean reef"),
                      ("q3", "comet star nebula probe")]:
        weights = searcher.query_weights(text, engine)
        scores, ords = engine.search([weights], model="bm25",
                                     params={"k1": 0.9, "b": 0.4},
                                     topk=min(hits, engine.dindex.num_docs))
        scores, ords = scores[0], ords[0]
        docids = engine.dindex.host.docid_strings
        runs[qid] = [(docids[int(o)], float(s)) for s, o in zip(scores, ords) if int(o) >= 0]
    return runs


def test_add_documents_matches_fresh_build(tmpdir_as_cache):
    base = _fresh_index(40)
    base.add_documents(ALL_DOCS[40:60])
    assert base.refresh() == 1
    fresh = _fresh_index(60)

    gd, fd = base.data, fresh.data
    assert gd.num_docs == fd.num_docs == 60
    assert gd.docid_strings == fd.docid_strings
    np.testing.assert_array_equal(gd.doclens, fd.doclens)
    np.testing.assert_array_equal(gd.norm_doclens, fd.norm_doclens)
    np.testing.assert_array_equal(gd.term_offsets, fd.term_offsets)
    np.testing.assert_array_equal(np.asarray(gd.doc_ids), np.asarray(fd.doc_ids))
    np.testing.assert_array_equal(np.asarray(gd.tfs), np.asarray(fd.tfs))
    np.testing.assert_array_equal(np.asarray(gd.fwd_term_ids), np.asarray(fd.fwd_term_ids))
    for key in gd.prune_tables:
        np.testing.assert_array_equal(gd.prune_tables[key], fd.prune_tables[key])
    # vocab assignment order matches the fresh first-encounter order too
    assert gd.vocab == fd.vocab

    grown_runs = _search_bm25({"collection": {"name": "incr_sliceable", "take": 40}})
    fresh_runs = _search_bm25({"collection": {"name": "incr_sliceable", "take": 60}})
    assert grown_runs == fresh_runs  # bit-identical scores AND tie order


def test_delete_then_matches_fresh_build_over_survivors(tmpdir_as_cache):
    grown = _fresh_index(40)
    grown.add_documents(ALL_DOCS[40:50])
    deleted = ["D0003", "D0017", "D0042", "D0049"]
    grown.delete_documents(deleted)
    grown.refresh()

    surviving = [d for d in ALL_DOCS[:50] if d[0] not in deleted]
    gd = grown.data
    assert gd.docid_strings == [docid for docid, _ in surviving]
    # stats referee: df/idf reflect only surviving docs
    fresh_df = {}
    analyzer = grown._analyzer()
    for _, text in surviving:
        for t in set(analyzer.analyze(text)):
            fresh_df[t] = fresh_df.get(t, 0) + 1
    for term in ["galaxi", "whale", "telescop"]:
        assert grown.get_df(term) == fresh_df.get(term, 0)
    assert gd.avgdl == pytest.approx(
        sum(len(analyzer.analyze(t)) for _, t in surviving) / len(surviving))
    # doc store: deleted docs vanish, added docs fetch correctly
    assert grown.get_doc("D0003") is None
    assert grown.get_doc("D0045") == dict(ALL_DOCS)["D0045"]


def test_nrt_semantics_and_engine_invalidation(tmpdir_as_cache):
    index_cfg = {"collection": {"name": "incr_sliceable", "take": 40}}
    searcher = Searcher.create("BM25", {"index": index_cfg})
    engine0 = searcher.get_engine()
    assert engine0.dindex.num_docs == 40
    # buffered add becomes visible without an explicit refresh() call:
    # the next engine access merges pending ops and rebuilds (NRT reopen)
    searcher.index.add_documents(ALL_DOCS[40:60])
    engine1 = searcher.get_engine()
    assert engine1 is not engine0
    assert engine1.dindex.num_docs == 60
    assert searcher.index.generation == 1
    # no pending ops -> engine is stable
    assert searcher.get_engine() is engine1


def test_multiple_pending_ops_replay_in_order(tmpdir_as_cache):
    index = _fresh_index(40)
    index.add_documents(ALL_DOCS[40:45])
    index.delete_documents(["D0041"])  # delete a doc added by a PENDING op
    index.add_documents([("D0041", "galaxy reborn telescope")])  # re-add after delete
    index.refresh()
    assert index.get_doc("D0041") == "galaxy reborn telescope"
    # re-added docid sits at its re-add position (fresh-build order of survivors)
    assert index.data.docid_strings[-1] == "D0041"
    assert index.data.num_docs == 45


def test_add_rejects_duplicates_and_validates_deletes(tmpdir_as_cache):
    index = _fresh_index(10)
    with pytest.raises(ValueError, match="already exists"):
        index.add_documents([("D0003", "dup")])
    index.add_documents([("X1", "coral reef")])
    with pytest.raises(ValueError, match="already exists"):
        index.add_documents([("X1", "dup of pending add")])
    with pytest.raises(ValueError, match="not in the index"):
        index.delete_documents(["NOPE"])
    with pytest.raises(ValueError, match="every document"):
        index.delete_documents([d for d, _ in ALL_DOCS[:10]] + ["X1"])
    with pytest.raises(ValueError, match="no documents"):
        index.add_documents([])


def test_incremental_requires_no_docreorder(tmpdir_as_cache):
    index = _fresh_index(10, docreorder="terms")
    with pytest.raises(ConfigError, match="docreorder"):
        index.add_documents([("X1", "coral reef")])


def test_positions_forward_index_survives_merge(tmpdir_as_cache):
    index = _fresh_index(20, storepositions=True)
    index.add_documents([("X1", "galaxy telescope galaxy")])
    index.refresh()
    data = index.data
    ord_ = data.docid_strings.index("X1")
    seq = index.get_doc_term_ids(ord_)
    terms = {i: t for t, i in data.vocab.items()}
    assert [terms[i] for i in seq] == ["galaxi", "telescop", "galaxi"]
    # base docs' positional sequences still resolve after the merge
    seq0 = index.get_doc_term_ids(0)
    assert len(seq0) == data.doclens[0]


def test_serving_refresh_nrt(tmpdir_as_cache):
    """A live RetrievalService picks up added/deleted docs via refresh()
    (Lucene SearcherManager.maybeRefresh), and the HTTP layer exposes it."""
    import json
    import threading
    import urllib.request

    from capreolus_tpu.serving import RetrievalService
    from capreolus_tpu.serving_http import make_server

    svc = RetrievalService.from_config(collection="dummy")
    assert svc.refresh() is False  # nothing pending
    before = svc.search(["zebra stampede savanna"], k=5)[0]
    assert before == []
    svc.index.add_documents([("NEW1", "zebra stampede across the savanna"),
                             ("NEW2", "savanna grass in the dry season")])

    server = make_server(svc, port=0)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{host}:{port}"
    try:
        req = urllib.request.Request(f"{base}/refresh", method="POST", data=b"")
        resp = json.load(urllib.request.urlopen(req))
        assert resp["refreshed"] is True
        assert resp["generation"] == 1
        assert resp["corpus_size"] == 5
        hits = svc.search(["zebra stampede savanna"], k=5)[0]
        assert hits and hits[0][0] == "NEW1"
        # second refresh with nothing pending is a no-op
        resp = json.load(urllib.request.urlopen(
            urllib.request.Request(f"{base}/refresh", method="POST", data=b"")))
        assert resp["refreshed"] is False
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()

    svc.index.delete_documents(["NEW1"])
    assert svc.refresh() is True
    hits = svc.search(["zebra stampede savanna"], k=5)[0]
    assert [d for d, _ in hits] == ["NEW2"]
    assert svc.get_document("NEW1") is None


def test_writer_lock_contention_and_stale_break(tmpdir_as_cache):
    """Lucene write.lock semantics: a live foreign writer blocks; a stale lock
    (dead pid) is broken and the write proceeds."""
    index = _fresh_index(10)
    lock = index.get_index_path() / "write.lock"
    lock.write_text("1")  # pid 1 is always alive (and not ours)
    with pytest.raises(IOError, match="write.lock"):
        index.add_documents([("X1", "coral reef")])
    # a READER hitting a foreign lock serves the stale generation, no raise
    assert index.data.num_docs == 10
    lock.write_text("999999999")  # certainly-dead pid -> stale, broken
    index.add_documents([("X1", "coral reef")])
    assert not lock.exists()  # released after the write
    # reader-triggered merge skips gracefully while a foreign writer is live
    lock.write_text("1")
    index._dirty = True
    assert index.data.num_docs == 10  # stale view, not an exception
    lock.unlink()
    index.refresh()
    assert index.get_doc("X1") == "coral reef"
    assert index.data.num_docs == 11


def test_add_after_merge_is_not_dropped(tmpdir_as_cache):
    """Op sequence numbers must stay monotonic across merges: merged op dirs
    are rmtree'd, so a naive dir scan would reuse a name in consumed_ops.json
    and pending_ops would silently drop the new op (ADVICE r3, high)."""
    index = _fresh_index(40)
    index.add_documents(ALL_DOCS[40:50])
    assert index.refresh() == 1
    index.add_documents(ALL_DOCS[50:60])
    assert index.refresh() == 2  # a dropped op would leave generation at 1
    assert index.data.num_docs == 60
    assert index.get_doc("D0055") == dict(ALL_DOCS)["D0055"]
    index.delete_documents(["D0055"])
    assert index.refresh() == 3
    assert index.get_doc("D0055") is None
    # and the grown index's ordinals match a fresh build over the survivors
    survivors = [d for d in ALL_DOCS[:60] if d[0] != "D0055"]
    assert index.data.docid_strings == [d for d, _ in survivors]


def test_failed_merge_does_not_grow_doc_stores(tmpdir_as_cache):
    """A merge attempt that dies after appending to docs.bin leaves orphan
    bytes; the merge journal truncates them on retry (ADVICE r3, low)."""
    from capreolus_tpu.index import segments

    index = _fresh_index(40)
    docs_bin = index.get_index_path() / "docs.bin"
    size0 = docs_bin.stat().st_size
    index.add_documents(ALL_DOCS[40:50])
    seg_bytes = sum((op / "docs.bin").stat().st_size
                    for op in segments.pending_ops(index.get_index_path()))

    def boom(*a, **k):
        raise RuntimeError("simulated crash mid-merge")

    for _ in range(3):  # three failed attempts, each appending before dying
        with pytest.raises(RuntimeError, match="simulated"):
            segments.merge_pending(index.get_index_path(), boom,
                                   index.config["storepositions"])
    assert docs_bin.stat().st_size == size0 + seg_bytes  # grew once, pending
    index.refresh()
    # the successful merge truncated the failed attempts' bytes first
    assert docs_bin.stat().st_size == size0 + seg_bytes
    assert index.data.num_docs == 50
    assert index.get_doc("D0045") == dict(ALL_DOCS)["D0045"]


def test_previous_generation_survives_one_commit(tmpdir_as_cache):
    """Deferred deletion: gen N-1 outlives the commit of gen N by one merge,
    so in-flight readers (incl. lazy tile materialization) survive a refresh."""
    index = _fresh_index(40)
    root = index.get_index_path()
    index.add_documents(ALL_DOCS[40:45])
    index.refresh()
    index.add_documents(ALL_DOCS[45:50])
    index.refresh()
    assert (root / "gen-1").is_dir()  # previous generation kept
    assert (root / "gen-2").is_dir()
    index.add_documents(ALL_DOCS[50:55])
    index.refresh()
    assert not (root / "gen-1").exists()  # N-2 reclaimed
    assert (root / "gen-2").is_dir()
    assert (root / "gen-3").is_dir()


def test_compact_doc_stores(tmpdir_as_cache):
    """Offline compaction reclaims deleted docs' bytes; search results and doc
    fetches are unchanged, and later add/merge cycles keep working against the
    versioned store."""
    index = _fresh_index(40, storepositions=True)
    index.add_documents(ALL_DOCS[40:60])
    index.delete_documents([f"D{i:04d}" for i in range(0, 30)])
    index.refresh()
    cfg = {"collection": {"name": "incr_sliceable", "take": 40}, "storepositions": True}
    before_runs = _search_bm25(cfg)
    root = index.get_index_path()
    size_before = (root / "docs.bin").stat().st_size

    reclaimed = index.compact_doc_stores()
    assert reclaimed > 0
    assert not (root / "docs.bin").exists()
    store = root / "store-1"
    assert (store / "docs.bin").exists() and (store / "docterms.bin").exists()
    assert (store / "docs.bin").stat().st_size < size_before
    assert _search_bm25(cfg) == before_runs  # bit-identical post-compaction
    assert index.get_doc("D0035") == dict(ALL_DOCS)["D0035"]
    assert index.get_doc("D0005") is None
    ord_ = index.data.docid_strings.index("D0035")
    assert len(index.get_doc_term_ids(ord_)) == index.data.doclens[ord_]

    # the store pointer carries forward through subsequent merges
    index.add_documents([("Y1", "comet probe sonar")])
    index.refresh()
    assert index.get_doc("Y1") == "comet probe sonar"
    assert index.get_doc("D0035") == dict(ALL_DOCS)["D0035"]
    # and a second compaction rolls the store version
    index.delete_documents(["D0030"])
    index.refresh()
    index.compact_doc_stores()
    assert (root / "store-2").is_dir() and not (root / "store-1").exists()
    assert index.get_doc("Y1") == "comet probe sonar"


def test_generation_survives_process_restart(tmpdir_as_cache):
    index = _fresh_index(40)
    index.add_documents(ALL_DOCS[40:60])
    # a "new process": a fresh module instance over the same cache dir sees
    # the pending segment and merges it on first data access
    reopened = Index.create("tpu", {"collection": {"name": "incr_sliceable", "take": 40}})
    assert reopened.data.num_docs == 60
    assert reopened.generation == 1
    assert reopened.get_doc("D0059") == dict(ALL_DOCS)["D0059"]
