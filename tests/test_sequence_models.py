"""Forward/gradient smoke tests for sequence models + new searchers + registry sweep."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.core import module_registry
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.searcher import Searcher

SMALL_EXT = {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 32, "index": {"collection": {"name": "dummy"}}}


def prepare(reranker):
    from capreolus_tpu.benchmark import Benchmark

    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}, "302": {"D002": 2.0, "D001": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    return benchmark, run


@pytest.mark.parametrize("name", ["DUET", "POSITDRMM", "HINT", "TK", "DeepTileBar"])
def test_sequence_model_forward(tmpdir_as_cache, name):
    import jax

    extractor_cfg = dict(SMALL_EXT)
    if name == "DeepTileBar":
        extractor_cfg = {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 32, "slicelen": 8,
                         "passagelen": 4, "index": {"collection": {"name": "dummy"}}}
    reranker = Reranker.create(name, {"extractor": extractor_cfg,
                                      "trainer": {"niters": 1, "itersize": 4, "batch": 2}})
    prepare(reranker)
    reranker.build_model()
    ext = reranker.extractor

    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    samples = [ext.id2vec(qid, "D001", "D002", label=[1, 0]) for qid in ("301", "302")]
    batch = collate(samples, ARRAY_KEYS)
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    pos, neg = reranker.score(params, batch)
    assert pos.shape == (2,) and np.isfinite(np.asarray(pos)).all(), name

    from capreolus_tpu.reranker.common import pair_hinge_loss

    grads = jax.grad(lambda p: pair_hinge_loss(reranker.score(p, batch)))(params)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in jax.tree_util.tree_leaves(grads)), name


def test_spatial_gru_matches_numpy_referee():
    """The anti-diagonal wavefront scan computes EXACTLY the reference's 2D
    recurrence (HINT.py:15-81): referee is a naive numpy double loop over the
    grid using the same parameters."""
    import jax
    import jax.numpy as jnp

    from capreolus_tpu.reranker.sequence_models import SpatialGRU2D

    rng = np.random.RandomState(0)
    n, qlen, dlen, cdim, h = 3, 5, 7, 3, 2
    s = rng.randn(n, qlen, dlen, cdim).astype(np.float32)
    mod = SpatialGRU2D(hidden=h)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(s))
    out = np.asarray(mod.apply(params, jnp.asarray(s)))

    p = {k: np.asarray(v) for k, v in params["params"].items()}

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    def cell(x, hdiag, htop, hleft):
        q = np.concatenate([htop, hleft, hdiag, x])
        rz = q @ p["Wrz_kernel"] + p["Wrz_bias"]
        rl, rt, rd, zi, zl, zt, zd = np.split(rz, 7)
        rl, rt, rd = sigmoid(rl), sigmoid(rt), sigmoid(rd)
        zs = np.stack([zi, zl, zt, zd])
        zs = np.exp(zs - zs.max(axis=0)) / np.exp(zs - zs.max(axis=0)).sum(axis=0)
        zi, zl, zt, zd = zs
        t11 = np.concatenate([htop, hleft, hdiag])
        r = np.concatenate([rl, rt, rd])
        h1 = np.tanh(x @ p["W_kernel"] + p["W_bias"] + (r * t11) @ p["U_kernel"] + p["U_bias"])
        return zl * hleft + zt * htop + zd * hdiag + zi * h1

    for bi in range(n):
        H = np.zeros((qlen + 1, dlen + 1, h), np.float64)  # +1 zero borders at [0, :]/[:, 0]
        for i in range(qlen):
            for j in range(dlen):
                H[i + 1, j + 1] = cell(s[bi, i, j].astype(np.float64),
                                       H[i, j], H[i, j + 1], H[i + 1, j])
        np.testing.assert_allclose(out[bi], H[qlen, dlen], rtol=2e-4, atol=2e-5)


def test_hint_spatial_mode(tmpdir_as_cache):
    """mode=spatial (the default) builds the faithful 2D-GRU model; invalid
    modes raise; windowed stays available as the documented fast option."""
    import jax

    from capreolus_tpu.core import ConfigError
    from capreolus_tpu.reranker.sequence_models import HINTModel, HINTSpatialModel

    reranker = Reranker.create("HINT", {"extractor": SMALL_EXT,
                                        "trainer": {"niters": 1, "itersize": 4, "batch": 2}})
    assert reranker.config["mode"] == "spatial"
    prepare(reranker)
    assert isinstance(reranker.build_model(), HINTSpatialModel)

    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    ext = reranker.extractor
    batch = collate([ext.id2vec(qid, "D001", "D002", label=[1, 0]) for qid in ("301", "302")],
                    ARRAY_KEYS)
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    pos, neg = reranker.score(params, batch)
    assert pos.shape == (2,) and np.isfinite(np.asarray(pos)).all()
    from capreolus_tpu.reranker.common import pair_hinge_loss

    grads = jax.grad(lambda p: pair_hinge_loss(reranker.score(p, batch)))(params)
    gru_grads = grads["params"]["GRU2d1"]
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in jax.tree_util.tree_leaves(gru_grads))

    fast = Reranker.create("HINT", {"mode": "windowed", "extractor": SMALL_EXT})
    prepare(fast)
    assert isinstance(fast.build_model(), HINTModel)
    with pytest.raises(ConfigError):
        Reranker.create("HINT", {"mode": "diagonal?", "extractor": SMALL_EXT})


def test_all_rerankers_creatable(tmpdir_as_cache):
    """Registry sweep (parity: reference reranker/tests/test_rerankers.py:33-41)."""
    for name in module_registry.get_module_names("reranker"):
        reranker = Reranker.create(name, {"trainer": {"niters": 1}})
        assert reranker.module_name == name


def test_all_extractors_creatable(tmpdir_as_cache):
    from capreolus_tpu.extractor import Extractor

    for name in module_registry.get_module_names("extractor"):
        ext = Extractor.create(name, {"index": {"collection": {"name": "dummy"}}})
        assert ext.module_name == name


@pytest.mark.parametrize("name", ["BM25Postprocess", "DirichletQL", "BM25PRF", "axiomatic"])
def test_new_searchers_run(tmpdir_as_cache, tmp_path, name):
    config = {"index": {"collection": {"name": "dummy"}}}
    if name == "BM25PRF":
        config.update({"k1": [0.9], "b": [0.4], "fbTerms": [5], "fbDocs": [2], "newTermWeight": [0.2]})
    searcher = Searcher.create(name, config)
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("1\ttelescope galaxies\n2\twhales ocean\n")
    outdir = tmp_path / "out"
    searcher.query_from_file(topicsfn, outdir)
    runs = [f for f in outdir.iterdir() if f.name != "done"]
    assert runs
    from capreolus_tpu.utils.trec import load_trec_run

    run = load_trec_run(runs[0])
    assert run.get("1"), f"{name} returned no docs"


def test_sdm_with_positions(tmpdir_as_cache, tmp_path):
    searcher = Searcher.create("SDM", {"index": {"collection": {"name": "dummy"}}})
    assert searcher.index.config["storepositions"] is True
    topicsfn = tmp_path / "topics.tsv"
    topicsfn.write_text("1\tdistant galaxies\n")
    outdir = tmp_path / "out"
    searcher.query_from_file(topicsfn, outdir)
    from capreolus_tpu.utils.trec import load_trec_run

    runs = [f for f in outdir.iterdir() if f.name != "done"]
    run = load_trec_run(runs[0])
    # D001 contains the ordered phrase "distant galaxies" -> must rank first
    ranked = sorted(run["1"].items(), key=lambda kv: -kv[1])
    assert ranked[0][0] == "D001"


def test_index_positions(tmpdir_as_cache):
    from capreolus_tpu.index import Index

    index = Index.create("tpu", {"storepositions": True, "collection": {"name": "dummy"}})
    index.create_index()
    tokens = index.get_doc_term_ids(0)
    assert len(tokens) == index.data.doclens[0]
    # the sequence must decode back to the analyzed doc
    vocab_inv = {v: k for k, v in index.data.vocab.items()}
    decoded = [vocab_inv[int(t)] for t in tokens]
    assert decoded[:2] == ["januari", "orbit"]

def test_bigru_directions_position_aligned():
    """The backward RNN's outputs must be realigned to INPUT positions before
    concatenation (flax nn.RNN(reverse=True) returns them in reversed order
    unless keep_order=True): the bwd half at position t must equal a manual
    forward scan over the flipped sequence, flipped back."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from capreolus_tpu.reranker.sequence_models import _BiGRU

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 4), jnp.float32)
    mod = _BiGRU(features=3)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(params, x))
    assert out.shape == (2, 6, 6)

    bwd_params = {"params": {"cell": params["params"]["GRUCell_1"]}}
    manual_bwd = jnp.flip(nn.RNN(nn.GRUCell(3)).apply(bwd_params, jnp.flip(x, axis=1)), axis=1)
    np.testing.assert_allclose(out[..., 3:], np.asarray(manual_bwd), rtol=1e-5, atol=1e-6)
