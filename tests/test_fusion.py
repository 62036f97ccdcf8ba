"""Hybrid first-stage fusion (searcher/fusion.py): RRF + interpolation math
referees and the end-to-end sparse+dense fused searcher on the dummy corpus.
A capability beyond the reference (its only score mixing is the rerank task's
test-time interpolation, reference capreolus/task/rerank.py:219-237)."""

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.searcher import Searcher
from capreolus_tpu.searcher.fusion import interp_fuse, rrf_fuse


def test_rrf_math():
    """Closed-form referee: score = sum over runs of 1/(k + rank)."""
    r1 = {"1": {"A": 10.0, "B": 5.0, "C": 1.0}}
    r2 = {"1": {"B": 0.9, "D": 0.8}}
    fused = rrf_fuse([r1, r2], k=60, hits=10)["1"]
    assert fused["A"] == pytest.approx(1 / 61)
    assert fused["B"] == pytest.approx(1 / 62 + 1 / 61)  # rank 2 in r1, rank 1 in r2
    assert fused["C"] == pytest.approx(1 / 63)
    assert fused["D"] == pytest.approx(1 / 62)
    assert max(fused, key=fused.get) == "B"  # retrieved highly by BOTH wins
    # hits cap keeps only the top
    assert list(rrf_fuse([r1, r2], k=60, hits=2)["1"]) == ["B", "A"]


def test_rrf_tie_break_deterministic():
    """Equal scores rank by docid, so fusion is deterministic across runs."""
    r = {"1": {"A": 1.0, "B": 1.0}}
    f1 = rrf_fuse([r], k=60, hits=10)["1"]
    assert f1["A"] == pytest.approx(1 / 61) and f1["B"] == pytest.approx(1 / 62)


def test_interp_math():
    """Min-max normalization per query, then alpha-convex mix; docs missing
    from one run contribute 0 from it."""
    r1 = {"1": {"A": 10.0, "B": 5.0, "C": 1.0}}
    r2 = {"1": {"B": 0.9, "D": 0.8}}
    fused = interp_fuse(r1, r2, alpha=0.5, hits=10)["1"]
    assert fused["A"] == pytest.approx(0.5 * 1.0)            # r1 max, absent in r2
    assert fused["B"] == pytest.approx(0.5 * (4 / 9) + 0.5)  # r2 max
    assert fused["C"] == pytest.approx(0.0)                  # r1 min, absent in r2
    # alpha=1 reduces to normalized run1
    only1 = interp_fuse(r1, r2, alpha=1.0, hits=10)["1"]
    assert only1["A"] == pytest.approx(1.0) and only1["D"] == pytest.approx(0.0)
    # constant-score run: every doc counts fully rather than dividing by 0
    const = interp_fuse({"1": {"A": 2.0, "B": 2.0}}, {}, alpha=1.0, hits=10)["1"]
    assert const == {"A": 1.0, "B": 1.0}


def _make(overrides=None):
    coll = {"index": {"collection": {"name": "dummy"}}}
    return Searcher.create("fusion", {
        "searcher1": dict(coll),
        "searcher2": {"pretrained": "tiny", "maxdoclen": 32, "maxqlen": 8, "batch": 4, **coll},
        **(overrides or {})})


def test_fusion_searcher_end_to_end(tmpdir_as_cache, tmp_path):
    """BM25 + dense fused over the dummy corpus: the run contains the union of
    both searchers' hits with RRF scores, and the interactive query() works
    without an own index."""
    searcher = _make()
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("301\tdistant galaxies collide\n302\twhales ocean\n")
    out = searcher.query_from_file(topicsfn, tmp_path / "out")
    runfn = next(p for p in out.iterdir() if p.name.startswith("searcher_fusion"))
    run = Searcher.load_trec_run(runfn)
    assert set(run) == {"301", "302"}

    run1 = Searcher.load_trec_run(next(p for p in (out / "searcher1").iterdir() if p.name != "done"))
    run2 = Searcher.load_trec_run(next(p for p in (out / "searcher2").iterdir() if p.name != "done"))
    expected = rrf_fuse([run1, run2], k=60, hits=1000)
    for qid in expected:
        for d, s in expected[qid].items():
            assert run[qid][d] == pytest.approx(s, abs=1e-5)

    # second call is a done-file cache hit
    assert searcher.query_from_file(topicsfn, tmp_path / "out") == out
    # interactive single-query API (no own index on the fusion searcher)
    hits = searcher.query("galaxies collide")
    assert hits and isinstance(next(iter(hits.values())), float)


def test_fusion_interp_mode(tmpdir_as_cache, tmp_path):
    searcher = _make({"method": "interp", "alpha": 0.7})
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("301\tdistant galaxies collide\n")
    out = searcher.query_from_file(topicsfn, tmp_path / "out")
    run = Searcher.load_trec_run(next(p for p in out.iterdir()
                                      if p.name.startswith("searcher_fusion")))
    assert run["301"]
    assert all(0.0 <= s <= 1.0 for s in run["301"].values())


def test_fusion_grid_cross_product(tmpdir_as_cache, tmp_path):
    """A grid-searched sub-searcher fuses EVERY parameter combination (cross
    product), not just min(len1, len2) positional pairs — a k1 sweep under
    fusion must evaluate all grid points downstream."""
    searcher = _make({"searcher1": {"k1": [0.9, 1.2, 1.5], "b": [0.4],
                                    "index": {"collection": {"name": "dummy"}}}})
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("301\tdistant galaxies collide\n")
    out = searcher.query_from_file(topicsfn, tmp_path / "out")
    fused = sorted(p.name for p in out.iterdir() if p.name.startswith("searcher_fusion"))
    assert len(fused) == 3  # 3 BM25 grid points x 1 dense run
    assert all("_" in f.rsplit("-", 1)[-1] or "x" in f for f in fused)

    # and the rank task's qrel filter must skip the nested sub-run dirs
    from capreolus_tpu.task import Task

    task = Task.create("rank", {"filter": True, "benchmark": {"name": "dummy"},
                                "searcher": {"name": "fusion", "searcher2": {
                                    "pretrained": "tiny", "maxdoclen": 32, "maxqlen": 8,
                                    "batch": 4, "index": {"collection": {"name": "dummy"}}}}})
    task.search()  # raises IsADirectoryError without the dir guard


def test_fusion_config_validation():
    from capreolus_tpu.core import ConfigError

    with pytest.raises(ConfigError):
        _make({"method": "zzz"})
