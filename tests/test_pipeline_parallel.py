"""Pipeline parallelism: the GPipe-style microbatched BERT pipeline must equal
the plain single-device encoder (forward AND gradients) on the 8-device CPU mesh.

The reference has no pipeline parallelism (SURVEY §2.3); this referees the
TPU-native extension (capreolus_tpu/parallel/pipeline_parallel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.parallel import pipeline_parallel as pp
from capreolus_tpu.reranker.bert.encoder import BertConfig, BertEncoder

CFG = BertConfig(vocab_size=211, hidden_size=32, num_layers=4, num_heads=2,
                 intermediate_size=64, max_position=64, dtype="float32")


def _make_inputs(batch=16, seqlen=16, seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    inp = rng.integers(0, CFG.vocab_size, size=(batch, seqlen)).astype(np.int32)
    mask = np.ones((batch, seqlen), np.int32)
    mask[:, seqlen - 3:] = 0  # padding tail exercises the attention mask
    seg = (rng.random((batch, seqlen)) < 0.5).astype(np.int32)
    return jnp.asarray(inp), jnp.asarray(mask), jnp.asarray(seg)


@pytest.fixture(scope="module")
def encoder_params():
    inp, mask, seg = _make_inputs()
    model = BertEncoder(CFG)
    variables = model.init(jax.random.PRNGKey(0), inp, mask, seg)
    return variables["params"]


def test_stack_unstack_roundtrip(encoder_params):
    rest, stacked = pp.split_bert_params(encoder_params, CFG.num_layers)
    merged = pp.merge_bert_params(rest, stacked, CFG.num_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        encoder_params, merged)


# microbatches must divide the per-data-shard batch: batch 16 over dp=8/stages
@pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 4), (4, 8)])
def test_pipelined_encoder_matches_plain(encoder_params, stages, microbatches):
    if len(jax.devices()) % stages != 0:
        pytest.skip("device count not divisible")
    if CFG.num_layers % stages != 0:
        pytest.skip("layer count not divisible")
    inp, mask, seg = _make_inputs()
    model = BertEncoder(CFG)
    ref_seq, ref_pooled, _ = model.apply({"params": encoder_params}, inp, mask, seg)

    mesh = pp.make_pp_mesh(pp=stages)
    rest, stacked = pp.split_bert_params(encoder_params, CFG.num_layers)
    rest, stacked = pp.place_pp_view(rest, stacked, mesh)

    @jax.jit
    def run(rest, stacked, inp, mask, seg):
        return pp.pipelined_encoder(CFG, rest, stacked, inp, mask, seg, mesh, microbatches)

    seq, pooled = run(rest, stacked, inp, mask, seg)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(ref_seq), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pooled), rtol=1e-5, atol=1e-5)


def test_pipelined_gradients_match_plain(encoder_params):
    """jax.grad through the fill-drain schedule must produce the same layer
    gradients as the plain encoder — this catches wrong ppermute/psum transposes
    (e.g. a factor-of-stages error from the output-replication collective)."""
    stages, microbatches = 4, 4
    inp, mask, seg = _make_inputs()
    model = BertEncoder(CFG)

    def ref_loss(params):
        _, pooled, _ = model.apply({"params": params}, inp, mask, seg)
        return jnp.sum(pooled ** 2)

    ref_grads = jax.grad(ref_loss)(encoder_params)

    mesh = pp.make_pp_mesh(pp=stages)
    rest0, stacked0 = pp.split_bert_params(encoder_params, CFG.num_layers)
    rest0, stacked0 = pp.place_pp_view(rest0, stacked0, mesh)

    @jax.jit
    def pp_grads(rest, stacked):
        def loss(rest, stacked):
            _, pooled = pp.pipelined_encoder(CFG, rest, stacked, inp, mask, seg, mesh, microbatches)
            return jnp.sum(pooled ** 2)

        return jax.grad(loss, argnums=(0, 1))(rest, stacked)

    g_rest, g_stacked = pp_grads(rest0, stacked0)
    g_merged = pp.merge_bert_params(g_rest, g_stacked, CFG.num_layers)

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_pp = dict(jax.tree_util.tree_flatten_with_path(g_merged)[0])
    for path, ref_leaf in flat_ref:
        got = flat_pp[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref_leaf),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_pipelined_scorer_matches_bert_scorer():
    """End-to-end _BertScorer parity: [B, P, L] passage scoring through the
    pipeline equals the plain scorer (bert_rerankers.py:80-86)."""
    from capreolus_tpu.reranker.bert_rerankers import _BertScorer

    rng = np.random.Generator(np.random.PCG64(7))
    b, p, l = 4, 2, 12
    inp = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, p, l)).astype(np.int32))
    mask = jnp.asarray(np.ones((b, p, l), np.int32))
    seg = jnp.asarray((rng.random((b, p, l)) < 0.5).astype(np.int32))

    scorer = _BertScorer(CFG)
    variables = scorer.init(jax.random.PRNGKey(3), inp, mask, seg)
    ref_scores = scorer.apply(variables, inp, mask, seg)

    mesh = pp.make_pp_mesh(pp=2)
    rest, stacked = pp.split_scorer_params(variables, CFG)
    scores = jax.jit(
        lambda r, s: pp.pipelined_scorer_forward(CFG, r, s, inp, mask, seg, mesh, 2)
    )(rest, stacked)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), rtol=1e-5, atol=1e-5)

    roundtrip = pp.merge_scorer_params(rest, stacked, CFG)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_array_equal(np.asarray(a), np.asarray(b_)),
        variables["params"], roundtrip["params"])


def test_pipelined_train_mode_runs_with_dropout():
    """train=True engages per-(layer, microbatch) dropout streams; loss must be
    finite and differ from the eval-mode forward."""
    inp, mask, seg = _make_inputs(batch=8)
    model = BertEncoder(CFG)
    params = model.init(jax.random.PRNGKey(1), inp, mask, seg)["params"]
    mesh = pp.make_pp_mesh(pp=2)
    rest, stacked = pp.split_bert_params(params, CFG.num_layers)
    rest, stacked = pp.place_pp_view(rest, stacked, mesh)

    _, eval_pooled = jax.jit(
        lambda r, s: pp.pipelined_encoder(CFG, r, s, inp, mask, seg, mesh, 2)
    )(rest, stacked)
    _, train_pooled = jax.jit(
        lambda r, s: pp.pipelined_encoder(CFG, r, s, inp, mask, seg, mesh, 2,
                                          dropout_rng=jax.random.PRNGKey(9), train=True)
    )(rest, stacked)
    assert np.all(np.isfinite(np.asarray(train_pooled)))
    assert not np.allclose(np.asarray(train_pooled), np.asarray(eval_pooled))


# ------------------------------------------------------------------ trainer integration
def test_trainer_pp_end_to_end(tmpdir_as_cache, tmp_path):
    """BERTMaxP training with trainer.pp=2 on the (data=4, pipe=2) mesh: loss
    finite, stacked layers actually update, and the canonical-format dev.best
    checkpoint loads back into the plain (non-pipelined) scorer."""
    from tests.test_bert_rerankers import make_reranker, prepared
    from capreolus_tpu.sampler import Sampler

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"niters": 2, "itersize": 8, "batch": 8, "validatefreq": 1,
                    "pp": 2, "fastforward": True}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    trainer = reranker.trainer
    metrics = trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                            benchmark.qrels, metric="map")
    assert trainer._data_mesh is not None and "pipe" in trainer._data_mesh.axis_names
    assert (tmp_path / "t" / "dev.best.params").exists()
    assert np.isfinite(metrics["map"])
    # the final params are canonical-format and drive the plain (non-pipelined)
    # predict path end-to-end
    assert "layer_0" in trainer._params["params"]["bert"]
    scores = trainer.predict(reranker, dev, params=trainer._params)
    assert all(np.isfinite(s) for d in scores.values() for s in d.values())


def test_trainer_pp_incompatible_reranker_raises(tmpdir_as_cache, tmp_path):
    """parade is not a plain _BertScorer: trainer.pp must refuse, not silently
    train un-pipelined."""
    from tests.test_bert_rerankers import make_reranker, prepared
    from capreolus_tpu.core import ConfigError
    from capreolus_tpu.sampler import Sampler

    reranker = make_reranker("parade", reranker_overrides={
        "trainer": {"niters": 1, "itersize": 4, "batch": 8, "validatefreq": 1, "pp": 2}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    with pytest.raises(ConfigError):
        reranker.trainer.train(reranker, sampler, tmp_path / "t", None, tmp_path / "d",
                               benchmark.qrels, metric="map")


def test_trainer_pp_sp_combination_raises(tmpdir_as_cache):
    from tests.test_bert_rerankers import make_reranker
    from capreolus_tpu.core import ConfigError

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"batch": 8, "pp": 2, "tp": 2, "sp": True}})
    with pytest.raises(ConfigError):
        reranker.trainer._mesh(8)


# ------------------------------------------------------------------ pp x tp (3D)
def test_pp_tp_mesh_and_param_shardings():
    """pp=2 x tp=2 builds the 3D (data, pipe, model) mesh and stacked kernels
    carry BOTH the pipe (layer-axis) and Megatron model-dim shardings."""
    mesh = pp.make_pp_mesh(pp=2, tp=2)
    assert dict(mesh.shape) == {"data": 2, "pipe": 2, "model": 2}
    inp, mask, seg = _make_inputs()
    model = BertEncoder(CFG)
    params = model.init(jax.random.PRNGKey(0), inp, mask, seg)["params"]
    rest, stacked = pp.split_bert_params(params, CFG.num_layers)
    rest, stacked = pp.place_pp_view(rest, stacked, mesh)
    P = jax.sharding.PartitionSpec
    # column-parallel: output dim sharded (shifted past the [L] axis)
    assert stacked["attention"]["query"]["kernel"].sharding.spec == P("pipe", None, "model")
    # row-parallel: input dim sharded
    assert stacked["ffn_output"]["kernel"].sharding.spec == P("pipe", "model", None)
    # layernorms replicate over model, shard over pipe only
    assert stacked["attention_ln"]["scale"].sharding.spec == P("pipe")


def test_pipelined_encoder_pp_tp_matches_plain(encoder_params):
    """3D composition referee: the pipeline over 'pipe' with 'model' left to
    GSPMD (partial-manual shard_map) equals the plain single-device encoder."""
    inp, mask, seg = _make_inputs()
    model = BertEncoder(CFG)
    ref_seq, ref_pooled, _ = model.apply({"params": encoder_params}, inp, mask, seg)

    mesh = pp.make_pp_mesh(pp=2, tp=2)
    rest, stacked = pp.split_bert_params(encoder_params, CFG.num_layers)
    rest, stacked = pp.place_pp_view(rest, stacked, mesh)
    seq, pooled = jax.jit(
        lambda r, s: pp.pipelined_encoder(CFG, r, s, inp, mask, seg, mesh, 2)
    )(rest, stacked)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(ref_seq), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pooled), rtol=2e-5, atol=2e-5)


def test_pipelined_gradients_pp_tp_match_plain(encoder_params):
    """Gradients through the pp x tp composition equal the plain encoder's,
    and arrive still carrying the (pipe, model) shardings."""
    inp, mask, seg = _make_inputs(batch=8)
    model = BertEncoder(CFG)

    def ref_loss(p):
        _, pooled, _ = model.apply({"params": p}, inp, mask, seg)
        return jnp.sum(pooled ** 2)

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(encoder_params)

    mesh = pp.make_pp_mesh(pp=2, tp=2)
    rest0, stacked0 = pp.split_bert_params(encoder_params, CFG.num_layers)
    rest0, stacked0 = pp.place_pp_view(rest0, stacked0, mesh)

    def pp_loss(rest, stacked):
        _, pooled = pp.pipelined_encoder(CFG, rest, stacked, inp, mask, seg, mesh, 2)
        return jnp.sum(pooled ** 2)

    val, (g_rest, g_stacked) = jax.jit(jax.value_and_grad(pp_loss, argnums=(0, 1)))(rest0, stacked0)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    assert "model" in str(g_stacked["attention"]["query"]["kernel"].sharding.spec)
    g_merged = pp.merge_bert_params(g_rest, g_stacked, CFG.num_layers)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_pp = dict(jax.tree_util.tree_flatten_with_path(g_merged)[0])
    for path, ref_leaf in flat_ref:
        np.testing.assert_allclose(np.asarray(flat_pp[path]), np.asarray(ref_leaf),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_trainer_pp_tp_end_to_end(tmpdir_as_cache, tmp_path):
    """BERTMaxP training with trainer.pp=2 trainer.tp=2 on the 3D (data=2,
    pipe=2, model=2) mesh: finite loss/metrics, canonical checkpoint."""
    from tests.test_bert_rerankers import make_reranker, prepared
    from capreolus_tpu.sampler import Sampler

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"niters": 1, "itersize": 4, "batch": 4, "validatefreq": 1,
                    "pp": 2, "tp": 2}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    mesh_shape = dict(reranker.trainer._data_mesh.shape)
    assert mesh_shape.get("pipe") == 2 and mesh_shape.get("model") == 2, mesh_shape
    assert np.isfinite(metrics["map"])
    assert (tmp_path / "t" / "dev.best.params").exists()
