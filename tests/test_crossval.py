"""Multi-fold cross-validation: per-fold training + fold-substituted result paths +
cross-fold aggregation and interpolation (SURVEY.md hard part #5)."""

import json

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.benchmark import Benchmark
from capreolus_tpu.core import ConfigOption, Dependency, constants
from capreolus_tpu.task import Task


@Benchmark.register
class TwoFoldDummy(Benchmark):
    """Dummy benchmark with two folds (each query is the other's test set)."""

    module_name = "dummy2fold"
    dependencies = [Dependency(key="collection", module="collection", name="dummy")]
    query_type = "title"
    qrel_file = constants["PACKAGE_PATH"] / "data" / "qrels.dummy.txt"

    @property
    def topics(self):
        # both queries must retrieve at least one relevant AND one non-relevant doc
        # so each fold has trainable triplets ('telescope' matches D001+D002)
        return {"title": {"301": "distant galaxies telescope", "302": "ocean whales telescope"}}

    @property
    def folds(self):
        return {
            "s1": {"train_qids": ["301"], "predict": {"dev": ["301"], "test": ["302"]}},
            "s2": {"train_qids": ["302"], "predict": {"dev": ["302"], "test": ["301"]}},
        }


RERANK_CONFIG = {
    "benchmark": {"name": "dummy2fold"},
    "reranker": {
        "extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16},
        "trainer": {"niters": 1, "itersize": 8, "batch": 4},
    },
    "threshold": 10,
    "testthreshold": 10,
}


def test_two_fold_crossval(tmpdir_as_cache):
    # train both folds (results paths differ only by fold-sN)
    for fold in ("s1", "s2"):
        task = Task.create("rerank", {**RERANK_CONFIG, "fold": fold})
        assert f"fold-{fold}" in str(task.get_results_path())
        task.train()

    # evaluating either fold now finds BOTH folds' predictions and reports CV metrics
    task = Task.create("rerank", {**RERANK_CONFIG, "fold": "s1"})
    results = task.evaluate()
    assert results["cv_metrics"] is not None, "cross-validated metrics missing"
    assert 0.0 <= results["cv_metrics"]["map"] <= 1.0
    assert set(results["interpolated_results"]["alphas"]) == {"s1", "s2"}
    # the pooled test runs cover both queries (each fold contributes its test qid)
    searcher_runs, reranker_runs = task.find_crossvalidated_results()
    assert set(reranker_runs) == {"s1", "s2"}
    assert "302" in reranker_runs["s1"]["test"]
    assert "301" in reranker_runs["s2"]["test"]
