"""Training-time dropout (parity: the reference's torch/HF models regularize
with hidden + attention-prob dropout; ours activates only when the trainer
passes a dropout rng — inference stays deterministic)."""

import numpy as np

import capreolus_tpu

capreolus_tpu.load_all_modules()

import jax

from tests.test_bert_rerankers import make_reranker, prepared
from tests.test_int8 import _batches


def test_dropout_active_only_with_rngs(tmpdir_as_cache):
    reranker = make_reranker("BERTMaxP")
    prepared(reranker)
    train, dev = _batches(reranker)
    reranker.build_model()
    params = reranker.init_params(jax.random.PRNGKey(0), train)

    rngs_a = {"dropout": jax.random.PRNGKey(1)}
    rngs_b = {"dropout": jax.random.PRNGKey(2)}
    pos_a1, _ = reranker.score(params, train, rngs=rngs_a)
    pos_a2, _ = reranker.score(params, train, rngs=rngs_a)
    pos_b, _ = reranker.score(params, train, rngs=rngs_b)
    np.testing.assert_array_equal(np.asarray(pos_a1), np.asarray(pos_a2))  # same rng -> same noise
    assert not np.allclose(np.asarray(pos_a1), np.asarray(pos_b)), "different rng must change dropout noise"

    # without rngs the forward is deterministic eval mode (old behavior)
    pos_d1, _ = reranker.score(params, train)
    pos_d2, _ = reranker.score(params, train)
    np.testing.assert_array_equal(np.asarray(pos_d1), np.asarray(pos_d2))
    # and inference (test) is unaffected by dropout config
    s1 = np.asarray(reranker.test(params, dev))
    s2 = np.asarray(reranker.test(params, dev))
    np.testing.assert_array_equal(s1, s2)


def test_dropout_zero_rate_matches_eval(tmpdir_as_cache):
    """hidden_dropout_prob=0 makes the train forward equal the eval forward."""
    reranker = make_reranker("BERTMaxP", reranker_overrides={"hidden_dropout_prob": 0.0})
    prepared(reranker)
    train, _ = _batches(reranker)
    reranker.build_model()
    assert reranker.model.config.hidden_dropout_prob == 0.0
    params = reranker.init_params(jax.random.PRNGKey(0), train)
    assert reranker.model.config.attention_dropout_prob == 0.0  # one knob controls both
    pos_rng, _ = reranker.score(params, train, rngs={"dropout": jax.random.PRNGKey(1)})
    pos_det, _ = reranker.score(params, train)
    np.testing.assert_allclose(np.asarray(pos_rng), np.asarray(pos_det), rtol=1e-6)


def test_trainer_passes_dropout_rng(tmpdir_as_cache, tmp_path):
    """End-to-end: training a BERT reranker exercises the dropout path."""
    from capreolus_tpu.sampler import Sampler

    reranker = make_reranker("BERTMaxP")
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    assert np.isfinite(metrics["map"])


def test_interaction_model_dropout(tmpdir_as_cache):
    """DUET/CDSSM/DSSM apply their (reference-parity) dropout when given rngs."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.reranker import Reranker
    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    reranker = Reranker.create("DUET", {"dropoutrate": 0.5,
                                        "extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                                                      "index": {"collection": {"name": "dummy"}}}})
    assert reranker.accepts_rngs
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5}}
    reranker.extractor.preprocess(list(run), {"D001", "D002"}, benchmark.topics[benchmark.query_type])
    feat = [reranker.extractor.id2vec("301", "D001", "D002", label=[1, 0], training=True) for _ in range(2)]
    batch = collate(feat, ARRAY_KEYS)
    reranker.build_model()
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    pos_a, _ = reranker.score(params, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    pos_b, _ = reranker.score(params, batch, rngs={"dropout": jax.random.PRNGKey(2)})
    pos_det, _ = reranker.score(params, batch)
    assert not np.allclose(np.asarray(pos_a), np.asarray(pos_b))
    np.testing.assert_array_equal(np.asarray(reranker.test(params, batch)),
                                  np.asarray(reranker.test(params, batch)))


def test_pos_neg_dropout_streams_differ(tmpdir_as_cache):
    """pos and neg forwards must use distinct dropout masks (folded rngs)."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.reranker import Reranker
    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    reranker = Reranker.create("DUET", {"dropoutrate": 0.5,
                                        "extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                                                      "index": {"collection": {"name": "dummy"}}}})
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5}}
    reranker.extractor.preprocess(list(run), {"D001", "D002"}, benchmark.topics[benchmark.query_type])
    feat = reranker.extractor.id2vec("301", "D001", "D001", label=[1, 0], training=True)  # SAME doc pos+neg
    batch = collate([feat, feat], ARRAY_KEYS)
    reranker.build_model()
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    pos, neg = reranker.score(params, batch, rngs={"dropout": jax.random.PRNGKey(7)})
    # identical inputs: only the dropout stream distinguishes pos from neg
    assert not np.allclose(np.asarray(pos), np.asarray(neg))
