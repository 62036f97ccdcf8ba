"""Learned-sparse impact retrieval (reranker/unicoil.py + searcher/impact.py):
engine math referee, end-to-end searcher, train->serve checkpoint handoff with
score parity, and a training-quality referee.

Beyond the reference (whose sparse retrieval is statistical only); the engine
semantics mirror Anserini's quantized-impact indexes."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.benchmark import Benchmark
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.sampler import Sampler
from capreolus_tpu.searcher import Searcher


def test_impact_engine_math():
    """The 'impact' scoring model computes sum_t qweight * impact exactly:
    hand-built CSR vs a numpy brute-force referee, including docid tie-breaks."""
    from capreolus_tpu.index.smallfloat import quantize_lengths
    from capreolus_tpu.index.tpu import IndexData
    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    rng = np.random.default_rng(0)
    n_docs, n_terms = 50, 12
    dense = (rng.random((n_docs, n_terms)) * 8).astype(np.int32)
    dense[rng.random((n_docs, n_terms)) < 0.6] = 0  # sparse impacts

    terms, docs, quants = [], [], []
    for t in range(n_terms):
        nz = np.nonzero(dense[:, t])[0]
        order = np.lexsort((nz, -dense[nz, t]))
        terms.extend([t] * len(nz))
        docs.extend(nz[order].tolist())
        quants.extend(dense[nz[order], t].tolist())
    term_offsets = np.zeros(n_terms + 1, np.int64)
    np.add.at(term_offsets, np.asarray(terms) + 1, 1)
    term_offsets = np.cumsum(term_offsets)
    doclens = np.maximum((dense > 0).sum(axis=1).astype(np.int32), 1)
    data = IndexData(term_offsets=term_offsets, doc_ids=np.asarray(docs, np.int32),
                     tfs=np.asarray(quants, np.int32), doclens=doclens,
                     norm_doclens=quantize_lengths(doclens),
                     docid_strings=[f"D{i}" for i in range(n_docs)], vocab={})
    engine = ScoringEngine(DeviceIndex(data))

    queries = [[(0, 1.5), (3, 0.25), (7, 2.0)], [(1, 1.0)], [(5, 0.5), (5, 0.5)]]
    scores, ords = engine.search(queries, model="impact", params={}, topk=10)
    for qi, q in enumerate(queries):
        expected = np.zeros(n_docs)
        for t, w in q:
            expected += w * dense[:, t]
        # exact top-10 with (score desc, doc asc) tie-break
        order = np.lexsort((np.arange(n_docs), -expected))[:10]
        got = [(int(o), float(s)) for s, o in zip(scores[qi], ords[qi]) if s > 0]
        want = [(int(o), float(expected[o])) for o in order if expected[o] > 0]
        assert got == pytest.approx(want)


def _make_searcher(overrides=None):
    cfg = {"pretrained": "tiny", "maxdoclen": 32, "maxqlen": 8, "batch": 4,
           "index": {"collection": {"name": "dummy"}}}
    cfg.update(overrides or {})
    return Searcher.create("impact", cfg)


def test_impact_searcher_end_to_end(tmpdir_as_cache, tmp_path):
    """Random-init tiny encoder over the dummy corpus: run scores equal the
    numpy dot product of the searcher's own query weights with the quantized
    impact CSR (engine and index build agree end-to-end), and the impact-index
    cache is reused on a second search."""
    searcher = _make_searcher()
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("301\tdistant galaxies collide\n302\twhales ocean\n")
    out = searcher.query_from_file(topicsfn, tmp_path / "out")
    run = Searcher.load_trec_run(out / "searcher_impact")
    assert set(run) <= {"301", "302"} and run

    engine, docid_strings, scale = searcher._impact_index()
    d = engine.dindex.host
    dense = np.zeros((len(docid_strings), d.num_terms))
    for t in range(d.num_terms):
        docs_t, tfs_t = d.postings(t)
        dense[docs_t, t] = tfs_t
    for qid, text in (("301", "distant galaxies collide"), ("302", "whales ocean")):
        qw = dict(searcher.query_weights(text))
        expected = np.zeros(len(docid_strings))
        for t, w in qw.items():
            if t < d.num_terms:
                expected += (w / scale) * dense[:, t]
        for docid, score in run.get(qid, {}).items():
            ordn = docid_strings.index(docid)
            assert score == pytest.approx(expected[ordn], rel=1e-5)

    # cache hit: the npz exists and a fresh searcher instance loads it
    assert searcher._cache_file().exists()
    again = _make_searcher()
    engine2, _, scale2 = again._impact_index()
    assert scale2 == scale
    np.testing.assert_array_equal(engine2.dindex.host.tfs, d.tfs)


def test_impact_maxpostings_cap(tmpdir_as_cache, tmp_path):
    """maxpostings rides the impact-ordered layout: capped scores never exceed
    exact (partial sums), same contract as BM25 early termination."""
    exact = _make_searcher()
    capped = _make_searcher({"maxpostings": 1})
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("301\tdistant galaxies collide\n")
    run_e = Searcher.load_trec_run(
        exact.query_from_file(topicsfn, tmp_path / "e") / "searcher_impact")
    run_c = Searcher.load_trec_run(
        capped.query_from_file(topicsfn, tmp_path / "c") / "searcher_impact")
    for qid in run_c:
        for docid, s in run_c[qid].items():
            assert s <= run_e[qid].get(docid, 0.0) + 1e-6


def test_impact_streaming_equality(tmpdir_as_cache, tmp_path):
    """A tiny hbmbudget forces the engine's host-streaming mode; results are
    identical to the resident engine (same invariant as BM25 streaming)."""
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("301\tdistant galaxies collide\n302\twhales ocean\n")
    resident = _make_searcher()
    streamed = _make_searcher({"hbmbudget": 0.0001})
    run_r = Searcher.load_trec_run(
        resident.query_from_file(topicsfn, tmp_path / "r") / "searcher_impact")
    run_s = Searcher.load_trec_run(
        streamed.query_from_file(topicsfn, tmp_path / "s") / "searcher_impact")
    assert streamed._impact_index()[0].dindex.streaming
    assert run_r == run_s


def test_unicoil_train_serve_parity(tmpdir_as_cache, tmp_path):
    """THE handoff invariant: a trained unicoil checkpoint served by the impact
    searcher scores (query, doc) pairs equal to the reranker's own forward pass
    up to impact quantization (16-bit here for a tight bound) — no train/serve
    skew."""
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0},
           "302": {"D002": 2.0, "D001": 1.5, "D003": 1.0}}
    reranker = Reranker.create("unicoil", {
        "pretrained": "tiny", "allowrandominit": True,
        "extractor": {"maxqlen": 8, "maxdoclen": 32,
                      "index": {"collection": {"name": "dummy"}}},
        "trainer": {"niters": 2, "itersize": 8, "batch": 2, "validatefreq": 2},
    })
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    out = tmp_path / "t"
    reranker.trainer.train(reranker, sampler, out, dev, out / "d", benchmark.qrels, metric="map")
    ckpt = out / "dev.best.params"
    assert ckpt.exists()

    searcher = _make_searcher({"checkpointfile": str(ckpt), "quantbits": 16})
    topics = benchmark.topics[benchmark.query_type]
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("".join(f"{qid}\t{topics[qid]}\n" for qid in ("301", "302")))
    runfn = searcher.query_from_file(topicsfn, tmp_path / "o") / "searcher_impact"
    served = Searcher.load_trec_run(runfn)

    # reranker-side scores for every (query, doc) pair via test()
    import jax

    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    params = reranker.init_params(jax.random.PRNGKey(0), collate(
        [reranker.extractor.id2vec("301", "D001", label=[1, 0], training=False)], ARRAY_KEYS))
    params, _ = reranker.trainer.load_checkpoint(out / "dev.best", params, reranker=reranker)
    for qid in ("301", "302"):
        samples = [reranker.extractor.id2vec(qid, d, label=[1, 0], training=False)
                   for d in ("D001", "D002", "D003")]
        batch = collate(samples, ARRAY_KEYS)
        model_scores = np.asarray(reranker.test(params, batch)).reshape(-1)
        for docid, ms in zip(("D001", "D002", "D003"), model_scores):
            ss = served.get(qid, {}).get(docid, 0.0)
            assert ss == pytest.approx(float(ms), rel=2e-2, abs=2e-2), (qid, docid)


def test_unicoil_training_produces_useful_retriever(tmpdir_as_cache, tmp_path):
    """Training-quality referee (same bar as the dense loop): after training,
    the served impact searcher must reach full recall and a decisive MRR."""
    from capreolus_tpu.evaluation.metrics import eval_run

    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0},
           "302": {"D002": 2.0, "D001": 1.5, "D003": 1.0}}
    reranker = Reranker.create("unicoil", {
        "pretrained": "tiny", "allowrandominit": True,
        "extractor": {"maxqlen": 8, "maxdoclen": 32,
                      "index": {"collection": {"name": "dummy"}}},
        "trainer": {"niters": 6, "itersize": 16, "batch": 2, "validatefreq": 6},
    })
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    out = tmp_path / "t"
    reranker.trainer.train(reranker, sampler, out, dev, out / "d", benchmark.qrels, metric="map")

    searcher = _make_searcher({"checkpointfile": str(out / "dev.best.params")})
    topics = benchmark.topics[benchmark.query_type]
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("".join(f"{qid}\t{topics[qid]}\n" for qid in ("301", "302")))
    served = Searcher.load_trec_run(
        searcher.query_from_file(topicsfn, tmp_path / "o") / "searcher_impact")
    metrics = eval_run(served, benchmark.qrels, ["recip_rank", "recall_1000"],
                       relevance_level=benchmark.relevance_level)
    # exact-match sparse scoring may legitimately retrieve fewer than all docs
    # (zero overlap = no score), but relevant docs must be found and ranked well
    assert metrics["recip_rank"] >= 0.75, metrics


def test_impact_config_validation():
    from capreolus_tpu.core import ConfigError

    with pytest.raises(ConfigError):
        _make_searcher({"quantbits": 0})
    with pytest.raises(ConfigError):
        _make_searcher({"encoder": "zzz"})


# ---------------------------------------------------------------- SPLADE
def test_splade_searcher_expansion(tmpdir_as_cache, tmp_path):
    """encoder=splade indexes EXPANSION terms: documents carry postings for
    vocab entries their text never contains (the capability uniCOIL lacks),
    and run scores equal the sparse-vector dot product referee."""
    searcher = _make_searcher({"encoder": "splade", "topterms": 64})
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("301\tdistant galaxies collide\n")
    out = searcher.query_from_file(topicsfn, tmp_path / "out")
    run = Searcher.load_trec_run(out / "searcher_impact")
    assert run.get("301")

    engine, docid_strings, scale = searcher._impact_index()
    d = engine.dindex.host
    # expansion: more indexed terms per doc than literal WordPiece tokens
    texts = [searcher.index.get_doc(doc) for doc in docid_strings]
    literal = {t for text in texts
               for t in searcher.tokenizer.convert_tokens_to_ids(
                   searcher.tokenizer.tokenize(text))}
    indexed = set(np.nonzero(np.diff(d.term_offsets))[0].tolist())
    assert indexed - literal, "splade must index terms beyond the literal tokens"

    # dot-product referee on the quantized impacts
    qw = dict(searcher.query_weights("distant galaxies collide"))
    dense = np.zeros((len(docid_strings), d.num_terms))
    for t in range(d.num_terms):
        docs_t, tfs_t = d.postings(t)
        dense[docs_t, t] = tfs_t
    expected = np.zeros(len(docid_strings))
    for t, w in qw.items():
        if t < d.num_terms:
            expected += (w / scale) * dense[:, t]
    for docid, score in run["301"].items():
        assert score == pytest.approx(expected[docid_strings.index(docid)], rel=1e-5)


def test_splade_train_serve_parity(tmpdir_as_cache, tmp_path):
    """Trained splade checkpoint served by the impact searcher reproduces the
    reranker's dot-product scores when truncation is off (topterms >= vocab)
    and quantization is 16-bit."""
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0},
           "302": {"D002": 2.0, "D001": 1.5, "D003": 1.0}}
    reranker = Reranker.create("splade", {
        "pretrained": "tiny", "allowrandominit": True, "regweight": 1e-2,
        "extractor": {"maxqlen": 8, "maxdoclen": 32,
                      "index": {"collection": {"name": "dummy"}}},
        "trainer": {"niters": 2, "itersize": 8, "batch": 2, "validatefreq": 2},
    })
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    out = tmp_path / "t"
    reranker.trainer.train(reranker, sampler, out, dev, out / "d", benchmark.qrels, metric="map")
    ckpt = out / "dev.best.params"
    assert ckpt.exists()

    # the FLOPS regularizer is live and differentiable: positive scalar
    import jax

    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    batch = collate([reranker.extractor.id2vec("301", "D001", label=[1, 0], training=False)],
                    ARRAY_KEYS)
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    params, _ = reranker.trainer.load_checkpoint(out / "dev.best", params, reranker=reranker)
    reg = float(reranker.regularizer(params, batch))
    assert reg > 0.0

    searcher = _make_searcher({"encoder": "splade", "checkpointfile": str(ckpt),
                               "quantbits": 16, "topterms": 40000})
    topics = benchmark.topics[benchmark.query_type]
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("".join(f"{qid}\t{topics[qid]}\n" for qid in ("301", "302")))
    served = Searcher.load_trec_run(
        searcher.query_from_file(topicsfn, tmp_path / "o") / "searcher_impact")
    for qid in ("301", "302"):
        samples = [reranker.extractor.id2vec(qid, d, label=[1, 0], training=False)
                   for d in ("D001", "D002", "D003")]
        model_scores = np.asarray(reranker.test(params, collate(samples, ARRAY_KEYS))).reshape(-1)
        for docid, ms in zip(("D001", "D002", "D003"), model_scores):
            ss = served.get(qid, {}).get(docid, 0.0)
            assert ss == pytest.approx(float(ms), rel=2e-2, abs=2e-2), (qid, docid)
