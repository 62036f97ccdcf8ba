"""Serving API tests: retrieval + retrieve-then-rerank over the dummy index."""

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()


def test_retrieval_service(tmpdir_as_cache):
    from capreolus_tpu.serving import RetrievalService

    svc = RetrievalService.from_config(collection="dummy")
    results = svc.search(["galaxies collide", "whales in the ocean"], k=2)
    assert len(results) == 2
    assert results[0][0][0] == "D003"  # galaxies collide -> D003
    assert results[1][0][0] == "D002"  # whales -> D002
    assert svc.get_document("D003").startswith("Galaxies collide")
    # unknown-vocabulary query returns empty hits, not an error
    assert svc.search(["zzzzqqqq"], k=5) == [[]]


def test_reranking_service(tmpdir_as_cache, tmp_path):
    import jax

    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.reranker import Reranker
    from capreolus_tpu.sampler import Sampler
    from capreolus_tpu.serving import RerankingService

    reranker = Reranker.create(
        "KNRM",
        {"extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                       "index": {"collection": {"name": "dummy"}}},
         "trainer": {"niters": 1, "itersize": 8, "batch": 4}},
    )
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}, "302": {"D002": 2.0, "D001": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                           benchmark.qrels, metric="map")

    svc = RerankingService(reranker.extractor.index, reranker, tmp_path / "t" / "dev.best", topn=3)
    results = svc.search(["distant galaxies telescope"], k=3)
    assert len(results) == 1 and len(results[0]) >= 1
    docids = [d for d, _ in results[0]]
    assert set(docids) <= {"D001", "D002", "D003"}


def test_reranking_service_int8(tmpdir_as_cache, tmp_path):
    """Serving with quantize=int8 calibrates on the first batch (prepare_inference
    is invoked against the restored weights) and returns ranked hits."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.sampler import Sampler
    from capreolus_tpu.serving import RerankingService
    from tests.test_bert_rerankers import make_reranker, prepared

    reranker = make_reranker("BERTMaxP", reranker_overrides={"quantize": "int8"})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                           benchmark.qrels, metric="map")

    svc = RerankingService(reranker.extractor.index, reranker, tmp_path / "t" / "dev.best", topn=3)
    results = svc.search(["distant galaxies telescope"], k=3)
    assert len(results) == 1 and len(results[0]) >= 1
    assert reranker._quant_stats is not None, "serving must calibrate the int8 scales"
