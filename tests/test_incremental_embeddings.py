"""Incremental indexing for the embedding/impact retrieval families
(VERDICT r3 next-step #6).

The reference's Lucene index serves every family it has and appends in place;
round 3 gave the sparse TpuIndex Lucene-style segment merges, but dense,
ColBERT, and impact artifacts were derived caches that went stale after a
merge. These tests pin the round-4 contract (searcher/embedding_cache.py):

- after add/delete + merge, each family's derived artifact EQUALS a fresh
  build over the surviving corpus (encoders are deterministic per doc);
- only the ADDED documents are encoded — survivors' rows are remapped from
  the previous generation's cache (deletions encode nothing);
- the serving layer's refresh() is NRT across all families.
"""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.collection import Collection
from capreolus_tpu.core import ConfigOption
from capreolus_tpu.searcher import Searcher

WORDS = ["ocean", "galaxy", "telescope", "whale", "comet", "reef", "orbit",
         "plankton", "nebula", "tide", "star", "coral", "probe", "sonar"]


def _make_docs(n, seed=11):
    rng = np.random.Generator(np.random.PCG64(seed))
    return [(f"E{i:04d}", " ".join(rng.choice(WORDS, size=int(rng.integers(6, 20))).tolist()))
            for i in range(n)]


ALL_DOCS = _make_docs(20)


@Collection.register
class EmbSliceableCollection(Collection):
    module_name = "incr_emb_sliceable"
    collection_type = "tsv"
    config_spec = Collection.config_spec + [ConfigOption("take", 12, "docs to yield")]

    def get_path(self):
        cache = self.get_cache_path() / "corpus"
        fn = cache / "docs.tsv"
        if not fn.exists():
            cache.mkdir(parents=True, exist_ok=True)
            with open(fn, "wt", encoding="utf-8") as f:
                for docid, text in ALL_DOCS[: self.config["take"]]:
                    f.write(f"{docid}\t{text}\n")
        return cache


def _index_cfg(take):
    return {"collection": {"name": "incr_emb_sliceable", "take": take}}


def _count_encodes(monkeypatch, searcher, method_name):
    counter = {"docs": 0}
    orig = getattr(searcher, method_name)

    def wrapped(texts, *a, **kw):
        counter["docs"] += len(texts)
        return orig(texts, *a, **kw)

    monkeypatch.setattr(searcher, method_name, wrapped)
    return counter


def test_dense_incremental_matches_fresh_and_encodes_only_new(tmpdir_as_cache, monkeypatch):
    grown = Searcher.create("dense", {"pretrained": "tiny", "allowrandominit": True,
                                      "maxdoclen": 32, "maxqlen": 8, "batch": 128,
                                      "index": _index_cfg(12)})
    base = np.asarray(grown._doc_matrix(), np.float32)
    assert base.shape[0] == 12

    grown.index.add_documents(ALL_DOCS[12:16])
    grown.index.delete_documents(["E0003", "E0007"])
    grown.index.refresh()
    counter = _count_encodes(monkeypatch, grown, "_embed_texts")
    inc = np.asarray(grown._doc_matrix(), np.float32)
    assert counter["docs"] == 4  # only the added docs were encoded

    fresh = Searcher.create("dense", {"pretrained": "tiny", "allowrandominit": True,
                                      "maxdoclen": 32, "maxqlen": 8, "batch": 128,
                                      "index": _index_cfg(16)})
    fresh.index.create_index()
    fresh.index.delete_documents(["E0003", "E0007"])
    fresh.index.refresh()
    # fresh searcher over the SAME surviving corpus encodes everything fresh
    ref = np.asarray(fresh._doc_matrix(), np.float32)
    assert grown.index.data.docid_strings == fresh.index.data.docid_strings
    np.testing.assert_array_equal(inc, ref)
    # derived readers follow the generation-tagged cache, not the gen-0 base
    assert "gen" in str(grown._current_doc_cache_file())


def test_colbert_incremental_matches_fresh(tmpdir_as_cache, monkeypatch):
    cfg = {"dim": 8, "maxdoclen": 16, "maxqlen": 8, "batch": 4,
           "allowrandominit": True}
    grown = Searcher.create("colbert", {**cfg, "index": _index_cfg(12)})
    emb0, mask0, _ = grown._doc_tensors()
    assert np.asarray(emb0).shape[0] == 12

    grown.index.add_documents(ALL_DOCS[12:15])
    grown.index.delete_documents(["E0001"])
    grown.index.refresh()
    encoded = {"docs": 0}
    orig = grown._encode_doc_batches

    def wrapped(docids, maxlen):
        encoded["docs"] += len(docids)
        return orig(docids, maxlen)

    monkeypatch.setattr(grown, "_encode_doc_batches", wrapped)
    emb1, mask1, _ = grown._doc_tensors()
    assert encoded["docs"] == 3

    fresh = Searcher.create("colbert", {**cfg, "index": _index_cfg(15)})
    fresh.index.create_index()
    fresh.index.delete_documents(["E0001"])
    fresh.index.refresh()
    fe, fm, _ = fresh._doc_tensors()
    np.testing.assert_array_equal(np.asarray(emb1, np.float32), np.asarray(fe, np.float32))
    np.testing.assert_array_equal(np.asarray(mask1), np.asarray(fm))


def test_impact_incremental_matches_fresh(tmpdir_as_cache, monkeypatch):
    cfg = {"pretrained": "tiny", "allowrandominit": True, "maxdoclen": 32, "batch": 8}
    grown = Searcher.create("impact", {**cfg, "index": _index_cfg(12)})
    engine0, docids0, scale0 = grown._impact_index()
    assert len(docids0) == 12

    grown.index.add_documents(ALL_DOCS[12:16])
    grown.index.delete_documents(["E0002"])
    grown.index.refresh()
    counter = _count_encodes(monkeypatch, grown, "_doc_term_weights")
    engine1, docids1, scale1 = grown._impact_index()
    assert counter["docs"] == 4  # survivors' raw impacts were remapped, not re-encoded

    fresh = Searcher.create("impact", {**cfg, "index": _index_cfg(16)})
    fresh.index.create_index()
    fresh.index.delete_documents(["E0002"])
    fresh.index.refresh()
    engine2, docids2, scale2 = fresh._impact_index()
    assert docids1 == docids2
    assert scale1 == pytest.approx(scale2)
    d1, d2 = engine1.dindex, engine2.dindex
    np.testing.assert_array_equal(d1.term_offsets, d2.term_offsets)
    np.testing.assert_array_equal(np.asarray(d1.host.doc_ids), np.asarray(d2.host.doc_ids))
    np.testing.assert_array_equal(np.asarray(d1.host_tfs), np.asarray(d2.host_tfs))


def test_dense_ivf_refresh_not_stale(tmpdir_as_cache):
    """The IVF engine memo must invalidate on a new index generation: it
    permutes the corpus cluster-major, so serving a pre-merge engine after a
    delete+merge would return the WRONG documents' docids for every ordinal
    (round-4 review finding). nprobe=clusters keeps results exact."""
    from capreolus_tpu.serving import DenseRetrievalService

    svc = DenseRetrievalService.from_config(
        collection="incr_emb_sliceable", pretrained="tiny", allowrandominit=True,
        maxdoclen=32, maxqlen=8, batch=4, clusters=2, nprobe=2)
    n0 = svc._n
    svc.searcher.index.add_documents([("NEWIVF", "zebra stampede savanna dusk")])
    assert svc.refresh() is True
    assert svc._n == n0 + 1
    hits = svc.search(["zebra stampede savanna dusk"], k=3)[0]
    assert any(d == "NEWIVF" for d, _ in hits)
    # deletion shifts every later ordinal: a stale engine surfaces wrong docids
    svc.searcher.index.delete_documents(["E0000", "E0005"])
    assert svc.refresh() is True
    docids = [d for d, _ in svc.search(["zebra stampede savanna dusk"], k=5)[0]]
    assert "NEWIVF" in docids
    assert "E0000" not in docids and "E0005" not in docids


def test_cache_gc_and_identity_hardlink(tmpdir_as_cache):
    """Old generations' corpus-sized caches are reclaimed (keep current +
    previous, mirroring index gen deletion), and an identity merge (same rows,
    e.g. after compact_doc_stores) hardlinks instead of copying."""
    import os

    from capreolus_tpu.searcher import embedding_cache as ec

    searcher = Searcher.create("dense", {"pretrained": "tiny", "allowrandominit": True,
                                         "maxdoclen": 32, "maxqlen": 8, "batch": 128,
                                         "index": _index_cfg(12)})
    searcher._doc_matrix()
    base = searcher._doc_cache_file()
    for i in range(3):  # three merges -> generations 1..3
        searcher.index.add_documents([ALL_DOCS[12 + i]])
        searcher.index.refresh()
        searcher._doc_matrix()
    assert ec.generation_path(base, 3).exists()
    assert ec.generation_path(base, 2).exists()  # previous kept (deferred)
    assert not ec.generation_path(base, 1).exists()  # reclaimed
    assert not base.exists()  # gen-0 family reclaimed too

    # identity merge: doc-store compaction bumps the generation, rows unchanged
    searcher.index.delete_documents([ALL_DOCS[12][0]])
    searcher.index.refresh()
    searcher._doc_matrix()  # gen 4: real remap (one row dropped)
    searcher.index.compact_doc_stores()  # gen 5: identical rows
    searcher._doc_matrix()
    g4, g5 = ec.generation_path(base, 4), ec.generation_path(base, 5)
    assert g5.exists()
    assert os.stat(g4).st_ino == os.stat(g5).st_ino  # hardlinked, not copied


def test_embedding_service_refresh_nrt(tmpdir_as_cache):
    """DenseRetrievalService.refresh() — the embedding-family analog of the
    sparse service's NRT reopen (tests/test_incremental.py)."""
    from capreolus_tpu.serving import DenseRetrievalService

    svc = DenseRetrievalService.from_config(
        collection="incr_emb_sliceable", pretrained="tiny", allowrandominit=True,
        maxdoclen=32, maxqlen=8, batch=4)
    assert svc.refresh() is False  # nothing pending
    n0 = svc._n
    svc.searcher.index.add_documents([("NEWDOC", "zebra stampede savanna dawn")])
    assert svc.refresh() is True
    assert svc._n == n0 + 1
    hits = svc.search(["zebra stampede savanna dawn"], k=3)[0]
    assert any(d == "NEWDOC" for d, _ in hits)
    assert svc.get_document("NEWDOC") == "zebra stampede savanna dawn"
    svc.searcher.index.delete_documents(["NEWDOC"])
    assert svc.refresh() is True
    assert all(d != "NEWDOC" for d, _ in svc.search(["zebra stampede savanna"], k=3)[0])


def test_impact_service_refresh_nrt(tmpdir_as_cache):
    """ImpactRetrievalService.refresh() — the learned-sparse analog of the
    sparse/dense services' NRT reopen: pending add/delete ops merge, the
    quantized CSR re-derives from the incrementally-maintained raw cache,
    and the served engine swaps in one reference assignment."""
    from capreolus_tpu.serving import ImpactRetrievalService

    svc = ImpactRetrievalService.from_config(
        collection="incr_emb_sliceable", pretrained="tiny", allowrandominit=True,
        maxdoclen=32, maxqlen=8, batch=8)
    assert svc.refresh() is False  # nothing pending
    n0 = len(svc._docids)
    svc.searcher.index.add_documents([("NEWIMP", "zebra stampede savanna dawn")])
    assert svc.refresh() is True
    assert len(svc._docids) == n0 + 1
    hits = svc.search(["zebra stampede savanna dawn"], k=n0 + 1)[0]
    assert any(d == "NEWIMP" for d, _ in hits)
    assert svc.get_document("NEWIMP") == "zebra stampede savanna dawn"
    svc.searcher.index.delete_documents(["NEWIMP"])
    assert svc.refresh() is True
    assert len(svc._docids) == n0
    assert all(d != "NEWIMP" for d, _ in
               svc.search(["zebra stampede savanna dawn"], k=n0)[0])
