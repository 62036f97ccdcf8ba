"""Coverage for remaining option paths: rank filter, postprocess dedup, partial
fastforward resume, amp training."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.task import Task
from capreolus_tpu.utils.trec import load_trec_run


def test_rank_filter_removes_qrel_docs(tmpdir_as_cache):
    task = Task.create("rank", {"filter": True, "benchmark": {"name": "dummy"}})
    results_dir = task.search()
    run = load_trec_run(next(f for f in results_dir.iterdir() if f.name != "done"))
    # all judged docs for 301 (D001-D003) must be filtered from its run
    assert "D001" not in run.get("301", {})
    assert "D002" not in run.get("301", {})


def test_bm25postprocess_dedup(tmpdir_as_cache, tmp_path):
    """Passage ids docid.N max-pool into docids."""
    from capreolus_tpu.searcher.feedback import BM25Postprocess

    searcher = BM25Postprocess.create("BM25Postprocess",
                                      {"dedup": True, "topn": 5, "index": {"collection": {"name": "dummy"}}})
    # simulate passage-style run through the postprocess writer
    run = {"1": {"D1.0": 1.0, "D1.1": 3.0, "D2.0": 2.0}}
    out = tmp_path / "run"
    searcher._write_run(run, out)
    pooled = load_trec_run(out)
    assert pooled["1"] == {"D1": 3.0, "D2": 2.0}


def test_fastforward_partial_resume(tmpdir_as_cache, tmp_path):
    """Resume after deleting the last iteration's checkpoint: retrains only that part."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.reranker import Reranker
    from capreolus_tpu.sampler import Sampler
    from capreolus_tpu.trainer import Trainer

    def make(niters):
        return Reranker.create(
            "KNRM",
            {"extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                           "index": {"collection": {"name": "dummy"}}},
             "trainer": {"niters": niters, "itersize": 8, "batch": 4, "fastforward": True}},
        )

    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}, "302": {"D002": 2.0, "D001": 1.0}}

    r1 = make(2)
    r1.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                            benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, r1.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, r1.extractor)
    r1.trainer.train(r1, sampler, tmp_path / "t", dev, tmp_path / "d", benchmark.qrels, metric="map")

    # truncate: remove iteration-1 checkpoint and its loss line
    losses = Trainer.load_loss_file(tmp_path / "t" / "info" / "loss.txt")
    (tmp_path / "t" / "weights" / "1.done").unlink()
    Trainer.write_to_loss_file(tmp_path / "t" / "info" / "loss.txt", losses)

    r2 = make(3)  # continue to 3 iterations
    r2.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                            benchmark.topics[benchmark.query_type])
    s2 = Sampler.create("triplet")
    s2.prepare(run, benchmark.qrels, r2.extractor)
    r2.trainer.train(r2, s2, tmp_path / "t", dev, tmp_path / "d", benchmark.qrels, metric="map")
    final = Trainer.load_loss_file(tmp_path / "t" / "info" / "loss.txt")
    assert len(final) == 3
    assert final[0] == losses[0]  # iteration 0 was resumed, not retrained


def test_amp_training(tmpdir_as_cache, tmp_path):
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.reranker import Reranker
    from capreolus_tpu.sampler import Sampler

    reranker = Reranker.create(
        "KNRM",
        {"extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                       "index": {"collection": {"name": "dummy"}}},
         "trainer": {"niters": 1, "itersize": 8, "batch": 4, "amp": True}},
    )
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5}, "302": {"D002": 2.0, "D001": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    assert np.isfinite(metrics["map"])


def test_shipped_static_runs_offline(tmpdir_as_cache, tmp_path):
    """The 5 run files the reference distributes in-package are shipped here too:
    their StaticRun searchers work fully offline (parity: searcher/anserini.py:255-345)."""
    import capreolus_tpu

    capreolus_tpu.load_all_modules()
    from capreolus_tpu.searcher import Searcher, load_trec_run

    for name, nqueries in [("bm25staticcds", 30), ("bm25staticgenomics", 26),
                           ("rm3staticcore18title", 25), ("rm3staticcore18desc", 25),
                           ("qdelstaticcovidabstract", 50)]:
        searcher = Searcher.create(name)
        out = searcher.query_from_file(None, tmp_path / name)
        runs = load_trec_run(next(out.glob("static_run")))
        assert len(runs) >= nqueries, f"{name}: {len(runs)} queries"
