"""ANCE-style hard-negative refresh (trainer.negrefresh): the sampler's live
negative pools are periodically replaced with the current model's
highest-scoring non-relevant candidates (Xiong et al. 2021, scoped to the
first-stage candidate pool the rerank task trains from — beyond the reference,
which trains on static run-file negatives)."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.benchmark import Benchmark
from capreolus_tpu.core import ConfigError
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.sampler import Sampler
from capreolus_tpu.trainer.jax_trainer import select_hard_negatives


def test_select_hard_negatives_referee():
    """Pure selection: score-descending, docid tie-break, depth cap — pinned
    against a hand-computed ordering."""
    preds = {
        "q1": {"a": 1.0, "b": 3.0, "c": 2.0, "d": 3.0},
        "q2": {"x": -1.0},
    }
    out = select_hard_negatives(preds, 3)
    assert out["q1"] == ["b", "d", "c"]  # 3.0 tie broken by docid, then 2.0
    assert out["q2"] == ["x"]
    assert select_hard_negatives(preds, 1)["q1"] == ["b"]


def _prepared_triplet_sampler():
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0},
           "302": {"D002": 2.0, "D001": 1.0, "D003": 0.5}}
    qrels = {"301": {"D001": 1}, "302": {"D002": 1}}

    class _StubExtractor:
        def get_cache_path(self):
            return "stub"

    sampler = Sampler.create("triplet")
    sampler.prepare(run, qrels, _StubExtractor())
    return sampler


def test_set_hard_negatives_pool_semantics():
    sampler = _prepared_triplet_sampler()
    orig_301 = list(sampler.qid_to_negdocs["301"])
    assert sorted(orig_301) == ["D002", "D003"]

    # hard list restricted to the original pool; unknown docs/qids ignored
    replaced = sampler.set_hard_negatives({"301": ["D003", "D999"], "999": ["D001"]})
    assert replaced == 1
    assert sampler.qid_to_negdocs["301"] == ["D003"]
    assert sorted(sampler.qid_to_negdocs["302"]) == ["D001", "D003"]  # untouched

    # positives can never enter the pool (they are not in the original negatives)
    sampler.set_hard_negatives({"301": ["D001"]})
    assert sampler.qid_to_negdocs["301"] == ["D003"]  # empty filtered list -> kept

    # a later refresh can RE-GROW the pool from the original snapshot
    sampler.set_hard_negatives({"301": ["D002", "D003"]})
    assert sorted(sampler.qid_to_negdocs["301"]) == ["D002", "D003"]

    assert sampler.supports_hard_negative_refresh


def test_distill_sampler_opts_out():
    from capreolus_tpu.sampler import DistillTripletSampler, TrainTripletSampler

    assert TrainTripletSampler.supports_hard_negative_refresh
    assert not DistillTripletSampler.supports_hard_negative_refresh


def _train_setup(extra_trainer_cfg):
    reranker = Reranker.create(
        "KNRM",
        {
            "extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16,
                          "index": {"collection": {"name": "dummy"}}},
            "trainer": dict({"niters": 2, "itersize": 8, "batch": 4, "validatefreq": 2},
                            **extra_trainer_cfg),
        },
    )
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0},
           "302": {"D002": 2.0, "D001": 1.0, "D003": 0.5}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    return reranker, benchmark, run, sampler


def test_negrefresh_end_to_end(tmpdir_as_cache, tmp_path):
    """Training with negrefresh=1, neghard=1 shrinks every query's live pool to
    the model's single hardest negative, drawn from the original candidates."""
    reranker, benchmark, run, sampler = _train_setup({"negrefresh": 1, "neghard": 1})
    originals = {qid: set(docs) for qid, docs in sampler.qid_to_negdocs.items()}

    reranker.trainer.train(reranker, sampler, tmp_path / "t", None, tmp_path / "d",
                           benchmark.qrels, metric="map")

    for qid, docs in sampler.qid_to_negdocs.items():
        assert len(docs) == 1
        assert set(docs) <= originals[qid]
    # the mining sampler's features were materialized once and cached
    assert getattr(sampler, "_mining_sampler", None) is not None


def test_negrefresh_rejects_pool_frozen_sampler(tmpdir_as_cache, tmp_path):
    reranker, benchmark, run, _ = _train_setup({"negrefresh": 1})

    class _Frozen:
        supports_hard_negative_refresh = False
        module_name = "frozen"

        def __iter__(self):
            raise AssertionError("trainer must reject before drawing samples")

    frozen = _Frozen()
    type(frozen).module_name = "frozen"
    with pytest.raises(ConfigError, match="negrefresh"):
        reranker.trainer.train(reranker, frozen, tmp_path / "t", None, tmp_path / "d",
                               benchmark.qrels, metric="map")
