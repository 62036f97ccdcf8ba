"""Registry sweep + forward/train smoke tests for interaction models (mirrors
reference reranker/tests/test_rerankers.py:33-41)."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.reranker import Reranker

SMALL_EXT = {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16, "index": {"collection": {"name": "dummy"}}}


def build(name, overrides=None):
    extractor = dict(SMALL_EXT)
    if name == "DSSM":  # bagofwords extractor has a different config surface
        extractor = {"index": {"collection": {"name": "dummy"}}}
    cfg = {
        "extractor": extractor,
        "trainer": {"niters": 1, "itersize": 4, "batch": 2},
        **(overrides or {}),
    }
    return Reranker.create(name, cfg)


def prepare(reranker):
    from capreolus_tpu.benchmark import Benchmark

    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}, "302": {"D002": 2.0, "D001": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    return benchmark, run


@pytest.mark.parametrize("name", ["KNRM", "TFKNRM", "DRMM", "DRMMTKS", "ConvKNRM", "PACRR", "CDSSM", "DSSM"])
def test_interaction_model_forward_and_grad(tmpdir_as_cache, name):
    import jax

    reranker = build(name)
    benchmark, run = prepare(reranker)
    reranker.build_model()
    ext = reranker.extractor

    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    samples = [ext.id2vec(qid, "D001", "D002", label=[1, 0]) for qid in ("301", "302")]
    batch = collate(samples, ARRAY_KEYS)
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    pos, neg = reranker.score(params, batch)
    assert pos.shape == (2,) and np.isfinite(np.asarray(pos)).all()

    # gradient flows through trainable params
    from capreolus_tpu.reranker.common import pair_hinge_loss

    def loss_fn(p):
        pos, neg = reranker.score(p, batch)
        return pair_hinge_loss([pos, neg])

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in leaves), f"no gradient signal for {name}"

    scores = reranker.test(params, batch)
    assert scores.shape == (2,)


def test_drmm_histogram_values():
    import jax.numpy as jnp

    from capreolus_tpu.reranker.interaction import matching_histogram

    # 1 query term vs 3 doc positions with sims -0.5, 0.2, 1.0 (exact match)
    sim = jnp.array([[[-0.5, 0.2, 1.0]]])
    d_mask = jnp.ones((1, 3))
    hist = matching_histogram(sim, d_mask, nbins=4, hist_type="CH")
    # bins: [-1,-.5) [-0.5,0) [0,.5) [.5,1) + exact; counts 0,1,1,0(1.0 goes to <1? edges=[-.5,0,.5,1]: 1.0 is not < 1 -> falls outside), exact=1
    assert hist.shape == (1, 1, 5)
    np.testing.assert_allclose(np.asarray(hist[0, 0]), [0 + 1, 1 + 1, 1 + 1, 0 + 1, 1 + 1])

    # PAD positions excluded
    hist2 = matching_histogram(sim, jnp.array([[1.0, 1.0, 0.0]]), nbins=4, hist_type="CH")
    np.testing.assert_allclose(np.asarray(hist2[0, 0]), [0 + 1, 1 + 1, 1 + 1, 0 + 1, 0 + 1])


def test_dssm_trigram_extractor(tmpdir_as_cache):
    from capreolus_tpu.extractor import Extractor

    ext = Extractor.create("bagofwords", {"datamode": "trigram", "index": {"collection": {"name": "dummy"}}})
    from capreolus_tpu.benchmark import Benchmark

    benchmark = Benchmark.create("dummy")
    ext.preprocess(["301"], ["D001", "D002"], benchmark.topics["title"])
    feats = ext.id2vec("301", "D001", "D002", label=[1, 0])
    assert feats["query"].sum() > 0
    assert feats["query"].shape == feats["posdoc"].shape
