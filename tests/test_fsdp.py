"""Fully-sharded data parallelism (ZeRO-3 via GSPMD param shardings).

Runs on the virtual 8-device CPU mesh (conftest). Pins: the spec picker's
largest-divisible-dim rule, that params AND Adam moments actually land sharded
over 'data', numeric equality of the whole training loop vs replicated DP, and
a canonical (gathered) checkpoint that reloads.

The reference trains only with fully-replicated state (capreolus/trainer/
tensorflow.py:60-76 TPUStrategy scope); fsdp is the TPU-native extension that
removes the per-core HBM cap on model size (parallel/fsdp.py).
"""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

import jax

from capreolus_tpu.parallel.fsdp import fsdp_param_spec, shard_params_fsdp

from tests.test_bert_rerankers import make_reranker, prepared

P = jax.sharding.PartitionSpec


def test_fsdp_param_spec_rules():
    class A:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    # largest dim divisible by dp wins
    assert fsdp_param_spec(A((128, 64)), 8) == P("data")  # trailing Nones dropped
    # largest dim not divisible -> falls back to the next largest that is
    assert fsdp_param_spec(A((30522, 128)), 8) == P(None, "data")
    # nothing divisible (tiny layernorm), scalars: replicated
    assert fsdp_param_spec(A((6,)), 8) == P()
    assert fsdp_param_spec(A(()), 8) == P()
    # 1D bias divisible
    assert fsdp_param_spec(A((64,)), 8) == P("data")


def test_shard_params_fsdp_places_leaves():
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    tree = {"kernel": jax.numpy.zeros((32, 16)), "scale": jax.numpy.ones((4,))}
    placed = shard_params_fsdp(tree, mesh)
    assert placed["kernel"].sharding.spec == P("data")  # trailing Nones are dropped
    assert placed["kernel"].addressable_shards[0].data.shape == (4, 16)
    assert placed["scale"].sharding.spec == P()


def _train(tmp_path, tag, fsdp):
    from capreolus_tpu.sampler import Sampler

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"niters": 2, "itersize": 8, "batch": 8, "validatefreq": 1,
                    "fsdp": fsdp}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / f"t{tag}", dev,
                                     tmp_path / f"d{tag}", benchmark.qrels, metric="map")
    return reranker, metrics


def test_trainer_fsdp_end_to_end_matches_replicated(tmpdir_as_cache, tmp_path):
    """Same seeds, same data: ZeRO-3-sharded training must produce the same
    losses/metrics as replicated DP (the schedule is a layout change, not a
    numerics change), with params and Adam moments actually sharded."""
    r_rep, m_rep = _train(tmp_path, "rep", fsdp=False)
    r_fsdp, m_fsdp = _train(tmp_path, "fsdp", fsdp=True)

    assert dict(r_fsdp.trainer._data_mesh.shape) == {"data": 8}
    # params sharded over 'data' (the FFN kernel's largest dim divides 8)
    flat = jax.tree_util.tree_flatten_with_path(r_fsdp.trainer._params)[0]
    ffn = next(x for path, x in flat
               if jax.tree_util.keystr(path).endswith("intermediate']['kernel']"))
    assert ffn.sharding.spec == P(None, "data")
    assert ffn.addressable_shards[0].data.shape == (64, 128 // 8)
    # Adam moments inherited the sharding (ZeRO: optimizer state is sharded too)
    mu_leaves = [leaf for leaf in jax.tree_util.tree_leaves(r_fsdp.trainer._opt_state)
                 if hasattr(leaf, "sharding") and leaf.ndim >= 2]
    assert any("data" in str(leaf.sharding.spec) for leaf in mu_leaves)

    np.testing.assert_allclose(m_fsdp["map"], m_rep["map"], rtol=1e-5)
    losses_rep = r_rep.trainer.load_loss_file(tmp_path / "trep" / "info" / "loss.txt")
    losses_fsdp = r_fsdp.trainer.load_loss_file(tmp_path / "tfsdp" / "info" / "loss.txt")
    np.testing.assert_allclose(losses_fsdp, losses_rep, rtol=5e-4, atol=1e-5)


def test_trainer_fsdp_checkpoint_roundtrip(tmpdir_as_cache, tmp_path):
    """Checkpoints written under fsdp are canonical full-weight files (the
    sharding is a runtime layout, not a format) that reload and predict."""
    r_fsdp, _ = _train(tmp_path, "ck", fsdp=True)
    assert (tmp_path / "tck" / "dev.best.params").exists()

    loaded = r_fsdp.trainer.load_best_model(r_fsdp, tmp_path / "tck")
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(loaded))


def test_fsdp_rejects_tp_pp_ep(tmpdir_as_cache):
    from capreolus_tpu.core import ConfigError

    for combo in ({"tp": 2}, {"pp": 2}, {"ep": 2}):
        reranker = make_reranker("BERTMaxP", reranker_overrides={
            "trainer": {"batch": 8, "fsdp": True, **combo}})
        with pytest.raises(ConfigError):
            reranker.trainer._mesh(8)
