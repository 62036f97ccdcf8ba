"""Device metrics must equal the trec_eval-compatible host implementation."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.evaluation import eval_runs
from capreolus_tpu.evaluation.device_metrics import eval_runs_device

METRICS = ["map", "recip_rank", "MRR@10", "ndcg_cut_5", "ndcg_cut_20", "P_5", "P_10", "recall_10", "recall_100"]


def random_experiment(seed, num_queries=12, num_docs=80, run_depth=30, graded=True):
    rng = np.random.Generator(np.random.PCG64(seed))
    qrels, runs = {}, {}
    for q in range(num_queries):
        qid = f"q{q}"
        judged = rng.choice(num_docs, size=rng.integers(3, 20), replace=False)
        qrels[qid] = {f"d{d}": int(rng.integers(0, 4 if graded else 2)) for d in judged}
        retrieved = rng.choice(num_docs, size=min(run_depth, num_docs), replace=False)
        runs[qid] = {f"d{d}": float(rng.random()) for d in retrieved}
    return qrels, runs


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("relevance_level", [1, 2])
def test_device_matches_host(seed, relevance_level):
    qrels, runs = random_experiment(seed)
    host = eval_runs(runs, qrels, list(METRICS), relevance_level)
    device = eval_runs_device(runs, qrels, METRICS, relevance_level)
    for metric in METRICS:
        assert device[metric] == pytest.approx(host[metric], abs=1e-5), metric


def test_device_empty_and_edge_cases():
    qrels = {"q1": {"d1": 1}}
    assert eval_runs_device({}, qrels, ["map"]) == {"map": 0.0}
    # query with empty run contributes zeros
    out = eval_runs_device({"q1": {}}, qrels, ["map", "ndcg_cut_10"])
    assert out["map"] == 0.0
    # perfect single-doc run
    out = eval_runs_device({"q1": {"d1": 1.0}}, qrels, ["map", "recip_rank", "ndcg_cut_10"])
    assert out == {"map": 1.0, "recip_rank": 1.0, "ndcg_cut_10": 1.0}
