"""Registry sweep: EVERY registered searcher runs end-to-end on the dummy index
(mirrors the reference's searcher/tests/test_searcher.py:12-50 pattern with an
explicit skip set for searchers that need external downloads or config files)."""

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.core import module_registry
from capreolus_tpu.searcher import Searcher

# need official MS MARCO files or a network download; their error paths are
# covered in tests/test_misc_paths.py
SKIP = {
    "msmarcopsg": "needs official qidpidtriples/top1000 files",
    "msmarcopsgbm25": "needs the MS MARCO passage corpus",
    "static_tct_colbert": "needs a dense-run download",
    "msptop200": "needs a download",
    "bm25staticrob04yang19": "run file not distributed inside the reference package",
    "bm25staticrob04yang19desc": "run file not distributed inside the reference package",
    "bm25staticrob04huston14title": "run file not distributed inside the reference package",
    "bm25staticrob04huston14desc": "run file not distributed inside the reference package",
    "bm25staticgov2": "run file not distributed inside the reference package",
    "bm25staticgov2desc": "run file not distributed inside the reference package",
}

# searchers whose defaults need shrinking to run on the 3-doc dummy collection
CONFIG_OVERRIDES = {
    "BM25Grid": {"k1max": 0.3, "bmax": 0.3, "k1min": 0.1, "bmin": 0.1, "step": 0.1},
    "BM25PRF": {"fbDocs": [2], "fbTerms": [3]},
    "axiomatic": {"r": [2], "n": [2]},
    "SDM": {"index": {"storepositions": True, "collection": {"name": "dummy"}}},
    "fusion": {"searcher1": {"index": {"collection": {"name": "dummy"}}},
               "searcher2": {"maxdoclen": 32, "maxqlen": 8, "batch": 4,
                             "index": {"collection": {"name": "dummy"}}}},
}

STATIC = {"bm25staticcds", "bm25staticgenomics", "rm3staticcore18title",
          "rm3staticcore18desc", "qdelstaticcovidabstract"}


@pytest.mark.parametrize("name", sorted(module_registry.get_module_names("searcher")))
def test_searcher_end_to_end(tmpdir_as_cache, tmp_path, name):
    if name in SKIP:
        pytest.skip(SKIP[name])
    config = dict(CONFIG_OVERRIDES.get(name, {}))
    cls = Searcher.lookup(name)
    if any(dep.key == "index" for dep in cls.dependencies):
        config.setdefault("index", {"collection": {"name": "dummy"}})
    searcher = Searcher.create(name, config)

    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("301\ttelescope galaxies\n302\twhales ocean\n")
    outdir = tmp_path / "results"
    if hasattr(searcher, "index"):
        searcher.index.create_index()
    searcher.query_from_file(topicsfn, outdir)

    # composite searchers (fusion) nest their sub-searchers' output dirs
    runs = [fn for fn in sorted(outdir.iterdir()) if fn.name != "done" and fn.is_file()]
    assert runs, f"{name} produced no run files"
    run = Searcher.load_trec_run(runs[0])
    assert len(run) >= 1
    if name not in STATIC:  # static runs carry their own (real) qids
        for qid, docs in run.items():
            assert set(docs) <= {"D001", "D002", "D003"}, f"{name} qid {qid}"
