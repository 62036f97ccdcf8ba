"""In-batch-negative contrastive training (trainer.loss=infonce).

The DPR/GTR dense-retrieval recipe: a [B, B(+B)] similarity matrix over the
batch with the positive on the diagonal and every other column as a negative.
Under the trainer's GSPMD data sharding the matrix spans the GLOBAL batch, so
cross-device negative sharing falls out of the sharded matmul (XLA inserts the
all-gather over ICI) — no shard_map or manual collectives.

Beyond the reference, which has no dense-training machinery at all (it can only
consume a downloaded TCT-ColBERT run, searcher/special.py:170-212)."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.benchmark import Benchmark
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.sampler import Sampler

RUN = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0},
       "302": {"D002": 2.0, "D001": 1.5, "D003": 1.0}}


def test_infonce_loss_numpy_referee():
    """infonce_loss == mean categorical CE against the label column, computed
    with a from-scratch numpy softmax."""
    import jax.numpy as jnp

    from capreolus_tpu.reranker.common import infonce_loss

    rng = np.random.Generator(np.random.PCG64(3))
    logits = rng.normal(size=(5, 9)).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 4])
    got = float(infonce_loss(jnp.asarray(logits), jnp.asarray(labels)))

    ex = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = ex / ex.sum(axis=1, keepdims=True)
    want = -np.mean([np.log(probs[i, labels[i]]) for i in range(5)])
    assert got == pytest.approx(float(want), rel=1e-5)


def _make_biencoder(loss="infonce", batch=8, niters=3):
    return Reranker.create("biencoder", {
        "pretrained": "tiny", "allowrandominit": True,
        "extractor": {"maxqlen": 8, "maxdoclen": 32,
                      "index": {"collection": {"name": "dummy"}}},
        "trainer": {"loss": loss, "niters": niters, "itersize": 16,
                    "batch": batch, "validatefreq": niters},
    })


def _prepare(reranker):
    benchmark = Benchmark.create("dummy")
    reranker.extractor.preprocess(list(RUN), {d for docs in RUN.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    return benchmark


def test_biencoder_encode_consistent_with_score(tmpdir_as_cache, tmp_path):
    """encode() returns unit embeddings whose scaled diagonal similarity IS the
    pairwise score path — the InfoNCE matrix's diagonal equals score()[0]."""
    import jax

    reranker = _make_biencoder()
    benchmark = _prepare(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(RUN, benchmark.qrels, reranker.extractor)
    samples = [s for s, _ in zip(iter(sampler), range(4))]
    batch = {k: np.stack([s[k] for s in samples])
             for k in ("query", "posdoc", "negdoc", "query_idf")}

    reranker.build_model()
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    q, pos, neg, scale = reranker.encode(params, batch)
    q, pos, neg = np.asarray(q), np.asarray(pos), np.asarray(neg)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(pos, axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(neg, axis=1), 1.0, atol=1e-4)

    pos_scores, neg_scores = reranker.score(params, batch)
    np.testing.assert_allclose(scale * np.sum(q * pos, axis=1),
                               np.asarray(pos_scores), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(scale * np.sum(q * neg, axis=1),
                               np.asarray(neg_scores), rtol=1e-4, atol=1e-4)


def test_infonce_training_runs_on_data_mesh(tmpdir_as_cache, tmp_path):
    """End-to-end biencoder training with trainer.loss=infonce at batch=8:
    the 8-device data mesh engages (global-batch logit matrix = cross-device
    negatives), the loss decreases, and dev metrics come out."""
    reranker = _make_biencoder()
    benchmark = _prepare(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(RUN, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(RUN, benchmark.qrels, reranker.extractor)

    trainer = reranker.trainer
    metrics = trainer.train(reranker, sampler, tmp_path / "train", dev, tmp_path / "dev",
                            benchmark.qrels, metric="map")
    assert trainer._data_mesh is not None and trainer._data_mesh.devices.size == 8
    assert metrics["map"] > 0
    losses = [float(line.split()[1]) for line in
              open(tmp_path / "train" / "info" / "loss.txt").read().splitlines()]
    assert len(losses) == 3
    assert losses[-1] < losses[0]  # contrastive objective actually optimizes


def test_infonce_requires_encode(tmpdir_as_cache, tmp_path):
    """Rerankers without an embedding surface get an actionable ConfigError."""
    from capreolus_tpu.core import ConfigError

    reranker = Reranker.create("KNRM", {
        "extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                      "index": {"collection": {"name": "dummy"}}},
        "trainer": {"loss": "infonce", "niters": 1, "itersize": 8, "batch": 4},
    })
    benchmark = _prepare(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(RUN, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(RUN, benchmark.qrels, reranker.extractor)
    with pytest.raises(ConfigError, match="encode"):
        reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                               benchmark.qrels, metric="map")


def test_infonce_rejects_pair_sampler(tmpdir_as_cache, tmp_path):
    """The pair stream alternates pos/neg docs in the posdoc slot, so infonce's
    diagonal labels would pull negatives toward their queries — the trainer
    must refuse instead of silently training a corrupted objective."""
    from capreolus_tpu.core import ConfigError

    reranker = _make_biencoder()
    benchmark = _prepare(reranker)
    sampler = Sampler.create("pair")
    sampler.prepare(RUN, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(RUN, benchmark.qrels, reranker.extractor)
    with pytest.raises(ConfigError, match="triplet"):
        reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                               benchmark.qrels, metric="map")


def test_infonce_rejects_softmaxloss_override(tmpdir_as_cache, tmp_path):
    """trainer.softmaxloss replaces the pairwise hinge; combined with a
    structured loss (infonce) it must error instead of silently feeding the
    [B, C] logit matrix into the pair-softmax function."""
    from capreolus_tpu.core import ConfigError

    reranker = _make_biencoder()
    reranker.trainer.config = dict(reranker.trainer.config, softmaxloss=True)
    with pytest.raises(ConfigError, match="softmaxloss"):
        reranker.trainer._loss_fn()
