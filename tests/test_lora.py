"""LoRA parameter-efficient fine-tuning (beyond the reference, which only
full-fine-tunes — reference capreolus/trainer/*.py): rank-r adapters on the
attention query/value projections, frozen base encoder, adapter-only
checkpoints through the existing frozen-param machinery."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

import jax

from capreolus_tpu.reranker import Reranker
from tests.test_bert_rerankers import make_reranker, prepared


def _example_batch(reranker):
    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    feat = reranker.extractor.id2vec("301", "D001", "D002", label=[1, 0], training=True)
    return collate([feat, feat], ARRAY_KEYS)


def test_lora_starts_at_pretrained_and_adds_adapters(tmpdir_as_cache):
    """Zero-init up-projection: the LoRA model's initial scores equal the
    base model's exactly, and the adapter params exist at the standard sites."""
    base = make_reranker("BERTMaxP")
    prepared(base)
    batch = _example_batch(base)
    p_base = base.init_params(jax.random.PRNGKey(0), batch)

    lora = make_reranker("BERTMaxP", reranker_overrides={"lora": 4})
    prepared(lora)
    p_lora = lora.init_params(jax.random.PRNGKey(0), batch)

    l0 = p_lora["params"]["bert"]["layer_0"]["attention"]
    assert "query_lora" in l0 and "value_lora" in l0
    assert np.all(np.asarray(l0["query_lora"]["up"]["kernel"]) == 0)
    assert l0["query_lora"]["down"]["kernel"].shape[1] == 4

    s_base = np.asarray(base.test(p_base, batch))
    s_lora = np.asarray(lora.test(p_lora, batch))
    np.testing.assert_allclose(s_lora, s_base, atol=1e-6)


def test_lora_freezes_base_and_trains_adapters(tmpdir_as_cache, tmp_path):
    """trainable() freezes everything in bert except the adapters; a training
    run leaves base weights bit-identical, moves the adapters/head, and the
    checkpoint carries only the trainable leaves (frozen stripped)."""
    from capreolus_tpu.sampler import Sampler

    reranker = make_reranker("BERTMaxP", reranker_overrides={"lora": 2})
    benchmark, run = prepared(reranker)

    # freeze map: base bert frozen, adapters + classifier trainable
    assert not reranker.trainable(("params", "bert", "layer_0", "attention", "query", "kernel"), None)
    assert reranker.trainable(("params", "bert", "layer_0", "attention", "query_lora", "down", "kernel"), None)
    assert reranker.trainable(("params", "classifier", "kernel"), None)

    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                           benchmark.qrels, metric="map")

    params = reranker.trainer._params["params"]
    batch = _example_batch(reranker)
    # reproduce the trainer's init exactly (flax init depends on param paths +
    # rng, not batch values; the trainer seeds with its config seed)
    init = reranker.init_params(jax.random.PRNGKey(reranker.trainer.config["seed"]),
                                batch)["params"]
    np.testing.assert_array_equal(np.asarray(params["bert"]["layer_0"]["attention"]["query"]["kernel"]),
                                  np.asarray(init["bert"]["layer_0"]["attention"]["query"]["kernel"]))
    # the adapter down-projection feeds a zero up at step 0, so movement shows
    # up in the UP kernel (and the head) first
    assert np.any(np.asarray(params["bert"]["layer_0"]["attention"]["query_lora"]["up"]["kernel"])
                  != np.asarray(init["bert"]["layer_0"]["attention"]["query_lora"]["up"]["kernel"])) or \
        np.any(np.asarray(params["classifier"]["kernel"]) != np.asarray(init["classifier"]["kernel"]))

    # checkpoint strips frozen leaves: far smaller than a full checkpoint
    full = make_reranker("BERTMaxP")
    prepared(full)
    ckpt = (tmp_path / "t" / "dev.best.params").stat().st_size
    n_total = sum(x.size for x in jax.tree_util.tree_leaves(init))
    n_train = sum(x.size for p, x in
                  jax.tree_util.tree_leaves_with_path(init)
                  if reranker.trainable(tuple(str(getattr(k, "key", getattr(k, "name", k)))
                                              for k in p), x))
    assert n_train < 0.25 * n_total, (n_train, n_total)
    assert ckpt < 0.5 * 4 * n_total  # well below a full f32 dump


def test_lora_int8_inference_composes(tmpdir_as_cache):
    """quantize=int8 (FFN path) and LoRA (attention path) touch disjoint
    matmuls and compose at inference."""
    reranker = make_reranker("BERTMaxP", reranker_overrides={"lora": 2, "quantize": "int8"})
    prepared(reranker)
    batch = _example_batch(reranker)
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    reranker.prepare_inference(params, batch)
    scores = np.asarray(reranker.test(reranker.inference_variables(params), batch))
    assert np.all(np.isfinite(scores))
