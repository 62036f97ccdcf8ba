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

    # two-stage dispatch/collect split: two dispatches in flight before either
    # collects (what the pipelined batcher does) equal the sync path
    c1 = svc.search_async(["distant galaxies telescope"], k=3)
    c2 = svc.search_async(["whales in the ocean"], k=3)
    assert c1() == results
    assert c2() == svc.search(["whales in the ocean"], k=3)


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


def test_dense_retrieval_service(tmpdir_as_cache):
    """Dense serving reuses the searcher's engine dispatch warm across calls
    and must agree with the batch searcher's results."""
    from capreolus_tpu.serving import DenseRetrievalService

    svc = DenseRetrievalService.from_config(collection="dummy", pretrained="tiny",
                                            maxdoclen=32, maxqlen=8, batch=4)
    results = svc.search(["distant galaxies collide", "whales ocean"], k=2)
    assert len(results) == 2
    assert all(len(hits) == 2 for hits in results)
    assert all(s1 >= s2 for (_, s1), (_, s2) in
               (hits for hits in results))  # descending
    # second call reuses the compiled engine (no rebuild) and stays consistent
    again = svc.search(["distant galaxies collide"], k=2)
    assert again[0] == results[0]
    assert svc.get_document(results[0][0][0])


def test_dense_retrieval_service_ivf(tmpdir_as_cache):
    """The serving layer composes with the IVF engine (clusters config)."""
    from capreolus_tpu.serving import DenseRetrievalService

    exact = DenseRetrievalService.from_config(collection="dummy", pretrained="tiny",
                                              maxdoclen=32, maxqlen=8, batch=4)
    ivf = DenseRetrievalService.from_config(collection="dummy", pretrained="tiny",
                                            maxdoclen=32, maxqlen=8, batch=4,
                                            clusters=2, nprobe=2)  # full probe == exact
    q = ["distant galaxies collide"]
    assert [d for d, _ in ivf.search(q, k=3)[0]] == [d for d, _ in exact.search(q, k=3)[0]]


def test_micro_batcher_coalesces(tmpdir_as_cache):
    """Submitted single-query requests ride ONE engine call: results match
    direct search. Deterministic setup: max_batch equals the submission count
    and the window is generous, so the worker drains all three together."""
    from capreolus_tpu.serving import RetrievalService
    from capreolus_tpu.serving_http import MicroBatcher

    svc = RetrievalService.from_config(collection="dummy")
    queries = ["galaxies collide", "whales in the ocean", "telescope orbit"]
    direct = svc.search(queries, k=2)

    batcher = MicroBatcher(svc, window_ms=5000.0, max_batch=3)
    slots = [batcher.submit(q, k=2) for q in queries]
    out = [batcher.result(s) for s in slots]
    batcher.close()
    assert out == direct
    assert batcher.batches_run == 1, "requests must coalesce into one engine call"


def test_micro_batcher_length_mismatch_fails_loudly(tmpdir_as_cache):
    """A service returning the wrong number of result lists must error every
    waiter, never leave one hanging."""
    from capreolus_tpu.serving_http import MicroBatcher

    class Short:
        batch_size = 4

        def search(self, queries, k=10):
            return [[("D1", 1.0)]][: max(0, len(queries) - 1)]  # always one short

    batcher = MicroBatcher(Short(), window_ms=1.0)
    with pytest.raises(RuntimeError, match="result lists"):
        batcher.search("q", k=1)
    batcher.close()


def test_micro_batcher_propagates_errors(tmpdir_as_cache):
    from capreolus_tpu.serving_http import MicroBatcher

    class Boom:
        batch_size = 4

        def search(self, queries, k=10):
            raise RuntimeError("engine down")

    batcher = MicroBatcher(Boom(), window_ms=1.0)
    with pytest.raises(RuntimeError, match="engine down"):
        batcher.search("q", k=1)
    batcher.close()


def test_http_server_roundtrip(tmpdir_as_cache):
    """Full HTTP round trip on a loopback ephemeral port: /health, /search,
    /document, and error paths."""
    import json
    import threading
    import urllib.request

    from capreolus_tpu.serving import RetrievalService
    from capreolus_tpu.serving_http import make_server

    svc = RetrievalService.from_config(collection="dummy")
    server = make_server(svc, port=0)
    host, port = server.server_address
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{host}:{port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/health"))
        assert health["ok"] and health["corpus_size"] > 0

        req = urllib.request.Request(
            f"{base}/search", method="POST",
            data=json.dumps({"queries": ["galaxies collide"], "k": 2}).encode())
        resp = json.load(urllib.request.urlopen(req))
        assert resp["results"][0][0][0] == "D003"

        doc = json.load(urllib.request.urlopen(f"{base}/document?docid=D003"))
        assert doc["text"].startswith("Galaxies collide")

        # null k falls back to the default rather than crashing the handler
        nullk = urllib.request.Request(
            f"{base}/search", method="POST",
            data=b'{"queries": ["galaxies collide"], "k": null}')
        assert json.load(urllib.request.urlopen(nullk))["results"][0]

        for body in (b"{}",          # missing 'queries'
                     b"[1]",         # valid JSON, not an object (TypeError path)
                     b'{"queries": "x"}'):              # wrong type
            bad = urllib.request.Request(f"{base}/search", method="POST", data=body)
            try:
                urllib.request.urlopen(bad)
                assert False, f"body {body!r} must be a 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400, body
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()


def test_colbert_retrieval_service(tmpdir_as_cache):
    """ColBERT MaxSim serving agrees with itself across calls and composes with
    the two-stage prefilter engine."""
    from capreolus_tpu.serving import ColbertRetrievalService

    svc = ColbertRetrievalService.from_config(
        collection="dummy", allowrandominit=True, dim=8,
        maxdoclen=32, maxqlen=8, batch=4, chunk=2)
    results = svc.search(["distant galaxies collide", "whales ocean"], k=2)
    assert len(results) == 2 and all(len(hits) == 2 for hits in results)
    assert svc.search(["distant galaxies collide"], k=2)[0] == results[0]

    two_stage = ColbertRetrievalService.from_config(
        collection="dummy", allowrandominit=True, dim=8,
        maxdoclen=32, maxqlen=8, batch=4, chunk=2, prefilter=3)  # all docs pass
    assert [d for d, _ in two_stage.search(["distant galaxies collide"], k=2)[0]] == \
        [d for d, _ in results[0]]


def test_http_stats_endpoint(tmpdir_as_cache):
    """/stats reports query/batch counters and recent latency percentiles."""
    import json
    import threading
    import urllib.request

    from capreolus_tpu.serving import RetrievalService
    from capreolus_tpu.serving_http import make_server

    svc = RetrievalService.from_config(collection="dummy")
    server = make_server(svc, port=0)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{host}:{port}"
    try:
        for _ in range(3):
            req = urllib.request.Request(
                f"{base}/search", method="POST",
                data=json.dumps({"queries": ["galaxies collide"], "k": 1}).encode())
            urllib.request.urlopen(req)
        stats = json.load(urllib.request.urlopen(f"{base}/stats"))
        assert stats["queries"] >= 3 and stats["batches"] >= 1
        assert stats["errors"] == 0
        assert stats["batch_latency_ms"]["p50"] > 0
        assert stats["batch_latency_ms"]["p99"] >= stats["batch_latency_ms"]["p50"]
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()


def test_reranking_service_fresh_process(tmpdir_as_cache, tmp_path):
    """Serving from a FRESH process (no training pipeline ran): the service
    preprocesses the extractor over the corpus itself, restores the trained
    checkpoint, and serves retrieve-then-rerank."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.reranker import Reranker
    from capreolus_tpu.sampler import Sampler
    from capreolus_tpu.serving import RerankingService

    cfg = {"extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                         "index": {"collection": {"name": "dummy"}}},
           "trainer": {"niters": 1, "itersize": 8, "batch": 4}}
    reranker = Reranker.create("KNRM", cfg)
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

    # a brand-new reranker instance = new-process simulation (no preprocess ran)
    fresh = Reranker.create("KNRM", cfg)
    assert not getattr(fresh.extractor, "_preprocessed", False)
    svc = RerankingService(fresh.extractor.index, fresh, tmp_path / "t" / "dev.best", topn=3)
    results = svc.search(["distant galaxies telescope"], k=3)
    assert len(results) == 1 and len(results[0]) >= 1
    assert {d for d, _ in results[0]} <= {"D001", "D002", "D003"}


def test_reranking_service_extractor_state_handoff(tmpdir_as_cache, tmp_path):
    """A model with TRAINED vocabulary-sized params (finetune=True embedding
    table) cannot deserialize against a fresh process's corpus-wide vocab: the
    service must fail with an actionable error, and extractor_state_path must
    restore the training-time state and serve correctly."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.reranker import Reranker
    from capreolus_tpu.sampler import Sampler
    from capreolus_tpu.serving import RerankingService

    cfg = {"finetune": True,
           "extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                         "index": {"collection": {"name": "dummy"}}},
           "trainer": {"niters": 1, "itersize": 8, "batch": 4}}
    reranker = Reranker.create("KNRM", cfg)
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5}}  # vocab != corpus-wide vocab
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                           benchmark.qrels, metric="map")
    state_fn = tmp_path / "extractor.state.pkl"
    reranker.extractor.save_state(state_fn)

    fresh = Reranker.create("KNRM", cfg)
    svc = RerankingService(fresh.extractor.index, fresh, tmp_path / "t" / "dev.best", topn=3)
    with pytest.raises(RuntimeError, match="extractor_state_path"):
        svc.search(["distant galaxies telescope"], k=3)

    fresh2 = Reranker.create("KNRM", cfg)
    svc2 = RerankingService(fresh2.extractor.index, fresh2, tmp_path / "t" / "dev.best",
                            topn=3, extractor_state_path=state_fn)
    results = svc2.search(["distant galaxies telescope"], k=3)
    assert len(results) == 1 and len(results[0]) >= 1


def test_reranking_service_live_query_idf(tmpdir_as_cache, tmp_path):
    """Live-query terms get their idf fetched from the warm index (training
    preprocess never saw them, so the dict would otherwise serve 0.0 and
    silently zero the query_idf feature of idf-gated models)."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.reranker import Reranker
    from capreolus_tpu.sampler import Sampler
    from capreolus_tpu.serving import RerankingService

    cfg = {"extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                         "index": {"collection": {"name": "dummy"}}},
           "trainer": {"niters": 1, "itersize": 8, "batch": 4}}
    reranker = Reranker.create("KNRM", cfg)
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                           benchmark.qrels, metric="map")

    fresh = Reranker.create("KNRM", cfg)
    svc = RerankingService(fresh.extractor.index, fresh, tmp_path / "t" / "dev.best", topn=3)
    svc.search(["whales ocean"], k=3)
    ext = fresh.extractor
    toks = [t for t in ext.tokenizer.tokenize("whales ocean") if t in ext.stoi or t in ext.idf]
    assert toks, "query terms must be in the corpus vocab"
    for tok in ext.tokenizer.tokenize("whales ocean"):
        assert ext.idf.get(tok, 0.0) == pytest.approx(svc.index.get_idf(tok))
        if svc.index.get_df(tok) > 0:
            assert ext.idf[tok] > 0.0


def test_hybrid_retrieval_service(tmpdir_as_cache):
    """Serving-level sparse+dense fusion matches the fusion searcher's math on
    the same hit lists."""
    from capreolus_tpu.searcher.fusion import rrf_fuse
    from capreolus_tpu.serving import (DenseRetrievalService, HybridRetrievalService,
                                       RetrievalService)

    sparse = RetrievalService.from_config(collection="dummy")
    dense = DenseRetrievalService.from_config(collection="dummy", pretrained="tiny",
                                              maxdoclen=32, maxqlen=8, batch=4)
    hybrid = HybridRetrievalService(sparse, dense, depth=3)
    queries = ["galaxies collide", "whales ocean"]
    fused = hybrid.search(queries, k=3)

    r1 = {str(i): dict(h) for i, h in enumerate(sparse.search(queries, k=3))}
    r2 = {str(i): dict(h) for i, h in enumerate(dense.search(queries, k=3))}
    expected = rrf_fuse([r1, r2], k=60, hits=3)
    for i in range(2):
        assert dict(fused[i]) == pytest.approx(expected[str(i)])
    assert hybrid.get_document(fused[0][0][0])

    from capreolus_tpu.core import ConfigError

    with pytest.raises(ConfigError):
        HybridRetrievalService(sparse, dense, method="zzz")

    # a depth beyond the embedding service's compiled max_k is clamped on BOTH
    # legs (symmetric fusion depths), never silently asymmetric
    deep = HybridRetrievalService(sparse, dense, depth=50)
    assert deep.depth == dense.max_k


def test_impact_retrieval_service(tmpdir_as_cache):
    """ImpactRetrievalService: learned-sparse serving returns the searcher's
    own dequantized dot products under the standard (docid, score) contract,
    and composes with the MicroBatcher like every other service."""
    import numpy as np

    from capreolus_tpu.serving import ImpactRetrievalService
    from capreolus_tpu.serving_http import MicroBatcher

    svc = ImpactRetrievalService.from_config(
        collection="dummy", pretrained="tiny", maxdoclen=32, maxqlen=8, batch=4)
    queries = ["distant galaxies collide", "whales ocean"]
    results = svc.search(queries, k=3)
    assert len(results) == 2

    engine, docids, scale = svc.searcher._impact_index()
    host = engine.dindex.host
    for q, hits in zip(queries, results):
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
        # expected score: dequantized impact dot product over the CSR
        expected = np.zeros(len(docids))
        for t, w in svc.searcher.query_weights(q):
            if t < host.num_terms:
                docs_t, tfs_t = host.postings(t)
                expected[docs_t] += (w / scale) * tfs_t
        for docid, score in hits:
            assert score == pytest.approx(expected[docids.index(docid)], rel=1e-5)

    batcher = MicroBatcher(svc, window_ms=1.0)
    try:
        assert batcher.search(queries[0], k=3) == results[0]
    finally:
        batcher.close()


def test_micro_batcher_pipelines_async_services():
    """A service exposing search_async (serving.py contract) is PIPELINED:
    batch N+1 is dispatched before batch N is collected (the device-link
    overlap that pays through a high-RTT tunnel), while results still land
    with the right waiters in submission order."""
    from capreolus_tpu.serving_http import MicroBatcher

    events = []

    class Async:
        batch_size = 2

        def search_async(self, queries, k=10):
            qs = list(queries)
            events.append(("dispatch", tuple(qs)))

            def collect():
                events.append(("collect", tuple(qs)))
                return [[(q.upper(), float(k))] for q in qs]

            return collect

        def search(self, queries, k=10):
            return self.search_async(queries, k)()

    batcher = MicroBatcher(Async(), window_ms=200.0, max_batch=2, pipeline_depth=2)
    slots = [batcher.submit(f"q{i}", k=1) for i in range(6)]
    out = [batcher.result(s) for s in slots]
    batcher.close()

    assert out == [[(f"Q{i}", 1.0)] for i in range(6)]
    dispatches = [i for i, (kind, _) in enumerate(events) if kind == "dispatch"]
    collects = [i for i, (kind, _) in enumerate(events) if kind == "collect"]
    assert len(dispatches) == len(collects) == 3
    # the overlap contract: the second dispatch precedes the first collect
    assert dispatches[1] < collects[0], f"no pipelining observed: {events}"


def test_micro_batcher_async_collect_error_isolated():
    """A collect() failure errors ONLY its own batch's waiters; batches
    before and after it still succeed (the pipeline keeps flowing)."""
    import pytest

    from capreolus_tpu.serving_http import MicroBatcher

    class Async:
        batch_size = 1

        def search_async(self, queries, k=10):
            qs = list(queries)

            def collect():
                if "boom" in qs:
                    raise RuntimeError("collect failed")
                return [[(q, 1.0)] for q in qs]

            return collect

        def search(self, queries, k=10):
            return self.search_async(queries, k)()

    batcher = MicroBatcher(Async(), window_ms=1.0, max_batch=1, pipeline_depth=2)
    s1 = batcher.submit("ok1", k=1)
    s2 = batcher.submit("boom", k=1)
    s3 = batcher.submit("ok2", k=1)
    assert batcher.result(s1) == [("ok1", 1.0)]
    with pytest.raises(RuntimeError, match="collect failed"):
        batcher.result(s2)
    assert batcher.result(s3) == [("ok2", 1.0)]
    batcher.close()


def test_micro_batcher_sync_fallback_when_search_async_is_none():
    """A service may publish search_async=None to opt out of pipelining
    (e.g. one whose stages can't split); the batcher must fall back to the
    sync search path at depth 1."""
    from capreolus_tpu.serving_http import MicroBatcher

    class Sync:
        search_async = None  # multi-stage service: no dispatch/collect split
        batch_size = 4

        def search(self, queries, k=10):
            return [[(q, 1.0)] for q in queries]

    batcher = MicroBatcher(Sync(), window_ms=1.0)
    assert batcher.pipeline_depth == 1
    assert batcher.search("x", k=1) == [("x", 1.0)]
    batcher.close()


def test_retrieval_service_search_async_interleaved(tmpdir_as_cache):
    """Two dispatches may be in flight before either collects (what the
    pipelined batcher does); results equal the synchronous path."""
    from capreolus_tpu.serving import RetrievalService

    svc = RetrievalService.from_config(collection="dummy")
    q1, q2 = ["galaxies collide"], ["whales in the ocean"]
    direct = svc.search(q1 + q2, k=3)
    c1 = svc.search_async(q1, k=3)
    c2 = svc.search_async(q2, k=3)  # dispatched before c1 collects
    assert c1() + c2() == direct


def test_micro_batcher_close_drains_inflight():
    """close() with dispatched-but-uncollected batches still delivers every
    waiter's result before the worker exits."""
    import time

    from capreolus_tpu.serving_http import MicroBatcher

    class Slow:
        batch_size = 1

        def search_async(self, queries, k=10):
            qs = list(queries)

            def collect():
                time.sleep(0.05)  # results "in flight" when close() lands
                return [[(q, 1.0)] for q in qs]

            return collect

        def search(self, queries, k=10):
            return self.search_async(queries, k)()

    batcher = MicroBatcher(Slow(), window_ms=1.0, max_batch=1, pipeline_depth=4)
    slots = [batcher.submit(f"q{i}", k=1) for i in range(4)]
    batcher.close()  # worker must drain inflight + pending before exiting
    assert [batcher.result(s) for s in slots] == [[(f"q{i}", 1.0)] for i in range(4)]


def test_sharded_retrieval_service(tmpdir_as_cache):
    """Multi-chip serving: shards=N doc-partitions the postings over a 'shard'
    mesh with an ICI allgather top-k merge; hit lists must equal the
    single-device service's, and NRT refresh() must rebuild the sharded view
    (the two round-5 dryrun legs, as a suite test)."""
    import jax

    from capreolus_tpu.serving import RetrievalService

    n = min(4, len(jax.devices()))
    sharded = RetrievalService.from_config(collection="dummy", shards=n)
    single = RetrievalService.from_config(collection="dummy")
    queries = ["galaxies collide", "whales in the ocean", "orbit telescope launch"]
    sh, si = sharded.search(queries, k=3), single.search(queries, k=3)
    for a, b in zip(sh, si):
        assert [d for d, _ in a] == [d for d, _ in b], (sh, si)
        for (_, sa), (_, sb) in zip(a, b):
            assert sa == pytest.approx(sb, rel=1e-5)

    # NRT reopen through the sharded engine
    sharded.index.add_documents([("NEWDOC1", "zebra stampede across the savanna")])
    assert sharded.refresh() is True
    hits = sharded.search(["zebra stampede"], k=3)
    assert hits[0] and hits[0][0][0] == "NEWDOC1"
    sharded.index.delete_documents(["NEWDOC1"])
    assert sharded.refresh() is True
    gone = sharded.search(["zebra stampede"], k=3)
    assert not gone[0] or gone[0][0][0] != "NEWDOC1"


def test_micro_batcher_hedges_stalled_collect():
    """Tail-latency hedging (VERDICT r4 next-step #6): a collect that exceeds
    the deadline (hedge_factor x rolling p50, floored) triggers ONE
    re-dispatch of the same batch; the first finisher's results are
    delivered, the hedge counter moves, and the stalled loser is discarded
    without corrupting later batches."""
    import threading as _threading
    import time as _time

    from capreolus_tpu.serving_http import MicroBatcher

    stall = _threading.Event()
    dispatches = []

    class Stalls:
        batch_size = 4

        def search_async(self, queries, k=10):
            qs = list(queries)
            n = len(dispatches)
            dispatches.append(tuple(qs))

            def collect():
                # every 4th dispatch models a transport stall: it hangs until
                # released, far beyond the hedge deadline
                if n % 4 == 0 and n > 0:
                    stall.wait(10.0)
                return [[(q.upper(), float(k))] for q in qs]

            return collect

    batcher = MicroBatcher(Stalls(), window_ms=0.0, max_batch=1, pipeline_depth=1,
                           hedge_factor=3.0, hedge_floor_ms=30.0)
    # build rolling-p50 history with fast batches (min_samples=8)
    for i in range(8):
        assert batcher.search(f"warm{i}", k=1) == [(f"WARM{i}", 1.0)]
    assert batcher.stats.hedges == 0

    # dispatch 8 stalls (n=8 % 4 == 0): primary hangs, the hedge re-dispatch
    # (n=9) serves the same query fast and must win
    t0 = _time.monotonic()
    out = batcher.search("stalled", k=1)
    elapsed = _time.monotonic() - t0
    assert out == [("STALLED", 1.0)]
    assert elapsed < 5.0, f"hedge did not rescue the stalled batch ({elapsed:.1f}s)"
    assert batcher.stats.hedges == 1 and batcher.stats.hedge_wins == 1
    assert dispatches[-2:] == [("stalled",), ("stalled",)]  # same batch re-dispatched

    # later batches are unaffected by the still-stalled loser
    assert batcher.search("after", k=1) == [("AFTER", 1.0)]
    snap = batcher.stats.snapshot()
    assert snap["hedges"] == 1 and snap["hedge_wins"] == 1
    stall.set()
    batcher.close()


def test_micro_batcher_hedge_prefers_successful_result():
    """A fast-FAILING backup must not fail the batch while the primary is
    still in flight: the hedged collect waits (bounded) for the other leg and
    delivers the successful result."""
    import threading as _threading

    from capreolus_tpu.serving_http import MicroBatcher

    release_primary = _threading.Event()
    dispatches = []

    class StallThenSucceed:
        batch_size = 1

        def search_async(self, queries, k=10):
            qs = list(queries)
            n = len(dispatches)
            dispatches.append(tuple(qs))

            def collect():
                if n >= 8 and n % 2 == 0:
                    # primary of the hedged pair: stalls until released, then
                    # succeeds
                    release_primary.wait(10.0)
                    return [[(q.upper(), float(k))] for q in qs]
                if n >= 8:
                    # the hedge re-dispatch: fails fast
                    raise RuntimeError("transient transport error")
                return [[(q.upper(), float(k))] for q in qs]

            return collect

    batcher = MicroBatcher(StallThenSucceed(), window_ms=0.0, max_batch=1,
                           pipeline_depth=1, hedge_factor=3.0, hedge_floor_ms=30.0)
    for i in range(8):  # build p50 history
        assert batcher.search(f"w{i}", k=1) == [(f"W{i}", 1.0)]

    # dispatch 8 stalls -> hedge (dispatch 9) fails fast -> the batcher must
    # keep waiting for the primary, which we release shortly after
    _threading.Timer(0.3, release_primary.set).start()
    out = batcher.search("rescued", k=1)
    assert out == [("RESCUED", 1.0)]
    assert batcher.stats.hedges == 1
    assert batcher.stats.errors == 0  # nothing failed from the client's view
    batcher.close()
