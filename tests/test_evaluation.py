import math

import pytest

from capreolus_tpu.evaluation import (
    DEFAULT_METRICS,
    eval_runs,
    interpolate_runs,
    interpolated_eval,
    search_best_run,
)
from capreolus_tpu.evaluation.metrics import eval_run, msmarco_mrr_at_k, query_metrics, rank_run

QRELS = {"q1": {"d1": 2, "d2": 1, "d3": 0}, "q2": {"d4": 1, "d5": 0}}


def test_rank_run_tiebreak():
    # trec_eval breaks score ties by docid in REVERSE lexicographic order
    run = {"a": 1.0, "b": 1.0, "c": 2.0}
    assert rank_run(run) == ["c", "b", "a"]


def test_query_metrics_handcomputed():
    ranked = ["d3", "d1", "d2"]  # rel docs at ranks 2 and 3
    m = query_metrics(ranked, QRELS["q1"], ["map", "recip_rank", "P_1", "P_2", "recall_2", "ndcg_cut_3"])
    assert m["map"] == pytest.approx((1 / 2 + 2 / 3) / 2)
    assert m["recip_rank"] == pytest.approx(1 / 2)
    assert m["P_1"] == 0.0
    assert m["P_2"] == 0.5
    assert m["recall_2"] == pytest.approx(1 / 2)
    dcg = 0 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3) + 0
    assert m["ndcg_cut_3"] == pytest.approx(dcg / idcg)


def test_unjudged_are_nonrelevant():
    m = query_metrics(["dX", "d1"], QRELS["q1"], ["map", "P_1"])
    assert m["P_1"] == 0.0
    assert m["map"] == pytest.approx((1 / 2) / 2)


def test_eval_run_averages_and_skips():
    run = {"q1": {"d1": 2.0, "d2": 1.0}, "q2": {"d5": 1.0, "d4": 0.5}, "q3": {"dZ": 1.0}}
    # q3 has no qrels -> ignored entirely
    out = eval_run(run, QRELS, ["map", "recip_rank"])
    assert out["map"] == pytest.approx(((1 / 1 + 2 / 2) / 2 + (1 / 2) / 1) / 2)
    assert out["recip_rank"] == pytest.approx((1.0 + 0.5) / 2)
    # queries with no relevant docs are excluded from the average (trec_eval behavior)
    qrels2 = dict(QRELS, q9={"dW": 0})
    out2 = eval_run(dict(run, q9={"dW": 1.0}), qrels2, ["map"])
    assert out2["map"] == out["map"]


def test_relevance_level():
    run = {"q1": {"d2": 2.0, "d1": 1.0}}
    # at relevance_level=2 only d1 (grade 2) counts as relevant
    out = eval_run(run, QRELS, ["map", "P_1"], relevance_level=2)
    assert out["P_1"] == 0.0
    assert out["map"] == pytest.approx((1 / 2) / 1)


def test_mrr10():
    run = {"q1": {"d3": 3.0, "d1": 2.0}, "q2": {"d4": 1.0}}
    assert msmarco_mrr_at_k(run, QRELS, k=10) == pytest.approx((1 / 2 + 1 / 1) / 2)
    # docs beyond the cutoff contribute 0
    deep_run = {"q1": {f"x{i}": 100 - i for i in range(10)}}
    deep_run["q1"]["d1"] = 1.0
    assert msmarco_mrr_at_k({"q1": deep_run["q1"]}, {"q1": QRELS["q1"]}, k=10) == 0.0


def test_eval_runs_default_metrics():
    run = {"q1": {"d1": 2.0}, "q2": {"d4": 1.0}}
    out = eval_runs(run, QRELS, DEFAULT_METRICS)
    assert set(out) == set(DEFAULT_METRICS)
    assert out["P_1"] == 1.0


def test_interpolate_runs_minmax():
    run1 = {"q1": {"a": 10.0, "b": 0.0}}
    run2 = {"q1": {"a": 0.0, "b": 1.0}}
    out = interpolate_runs(run1, run2, ["q1"], alpha=0.5)
    assert out["q1"]["a"] == pytest.approx(0.5)
    assert out["q1"]["b"] == pytest.approx(0.5)
    out = interpolate_runs(run1, run2, ["q1"], alpha=1.0)
    assert out["q1"]["a"] == pytest.approx(1.0)


def test_search_best_run(tmp_path):
    import capreolus_tpu

    capreolus_tpu.load_all_modules()
    from capreolus_tpu.utils.trec import write_trec_run

    class FakeBenchmark:
        qrels = QRELS
        relevance_level = 1
        folds = {"s1": {"train_qids": ["q1"], "predict": {"dev": ["q1"], "test": ["q2"]}}}
        non_nn_dev = {"s1": ["q1"]}

    good = {"q1": {"d1": 2.0, "d2": 1.5, "d3": 1.0}, "q2": {"d4": 5.0, "d5": 1.0}}
    bad = {"q1": {"d3": 9.0, "d1": 1.0}, "q2": {"d5": 9.0, "d4": 1.0}}
    d = tmp_path / "runs"
    d.mkdir()
    write_trec_run(good, d / "good")
    write_trec_run(bad, d / "bad")
    (d / "done").write_text("done")

    result = search_best_run([str(d)], FakeBenchmark(), "map")
    assert result["path"]["s1"].endswith("good")
    # test evaluation only over test qids (q2)
    assert result["score"]["map"] == pytest.approx(1.0)


def test_interpolated_eval():
    class FakeBenchmark:
        qrels = QRELS
        relevance_level = 1
        folds = {"s1": {"train_qids": [], "predict": {"dev": ["q1"], "test": ["q2"]}}}

    run1 = {"s1": {"dev": {"q1": {"d1": 2.0, "d2": 1.0}}, "test": {"q2": {"d4": 2.0, "d5": 1.0}}}}
    run2 = {"s1": {"dev": {"q1": {"d3": 2.0, "d1": 1.0}}, "test": {"q2": {"d5": 2.0, "d4": 1.0}}}}
    result = interpolated_eval(run1, run2, FakeBenchmark(), "map")
    assert "alphas" in result and "s1" in result["alphas"]
    # run1 is perfect on dev, so alpha should favor it and test map should be 1.0
    assert result["score"]["map"] == pytest.approx(1.0)


def test_extended_metric_family_handcomputed():
    # qrels: d1 rel(2), d2 rel(1), d3 nonrel(0), dU unjudged
    qrels_q = {"d1": 2, "d2": 1, "d3": 0, "d4": 0}
    ranked = ["d3", "d1", "dU", "d2", "d4"]
    m = query_metrics(
        ranked, qrels_q,
        ["Rprec", "bpref", "ndcg", "map_cut_2", "map_cut_4", "success_1", "success_2",
         "set_P", "set_recall", "set_F"],
    )
    # R = 2 relevant; top-2 of ranking contains 1 relevant
    assert m["Rprec"] == pytest.approx(1 / 2)
    # bpref: N = 2 judged nonrelevant, denom = min(R, N) = 2.
    # d1 has 1 nonrel (d3) above -> 1 - 1/2; d2 still has only d3 above (dU unjudged) -> 1 - 1/2
    assert m["bpref"] == pytest.approx((0.5 + 0.5) / 2)
    # full-depth ndcg over the whole ranking
    dcg = 2 / math.log2(3) + 1 / math.log2(5)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    assert m["ndcg"] == pytest.approx(dcg / idcg)
    # map_cut_k: precision-sum truncated at k, still divided by full R
    assert m["map_cut_2"] == pytest.approx((1 / 2) / 2)
    assert m["map_cut_4"] == pytest.approx((1 / 2 + 2 / 4) / 2)
    assert m["success_1"] == 0.0
    assert m["success_2"] == 1.0
    # set metrics over the whole retrieved set (5 docs, 2 relevant retrieved)
    assert m["set_P"] == pytest.approx(2 / 5)
    assert m["set_recall"] == pytest.approx(1.0)
    p, r = 2 / 5, 1.0
    assert m["set_F"] == pytest.approx(2 * p * r / (p + r))


def test_bpref_no_judged_nonrelevant():
    # when N == 0 every relevant retrieved doc credits 1.0
    qrels_q = {"d1": 1, "d2": 1}
    m = query_metrics(["d1", "dU"], qrels_q, ["bpref"])
    assert m["bpref"] == pytest.approx(1 / 2)


def test_judged_averaged_over_all_run_queries():
    # q9 has qrels but no relevant docs: excluded from map, INCLUDED in judged_*
    # (parity with the reference's judged() helper, evaluator.py:32-47)
    qrels = {"q1": {"d1": 1, "d2": 0}, "q9": {"dW": 0}}
    run = {"q1": {"d1": 2.0, "d2": 1.0}, "q9": {"dW": 1.0, "dZ": 0.5}}
    out = eval_run(run, qrels, ["map", "judged_2"])
    assert out["map"] == pytest.approx(1.0)  # only q1
    assert out["judged_2"] == pytest.approx((2 / 2 + 1 / 2) / 2)  # q1 and q9


def test_antique_scale_eval():
    """Evaluator at corpus scale over the real shipped ANTIQUE qrels."""
    from capreolus_tpu.core import constants
    from capreolus_tpu.utils.trec import load_qrels

    qrels = load_qrels(constants["PACKAGE_PATH"] / "data" / "qrels.antique.txt")
    assert len(qrels) > 2400
    # qrels-derived perfect run: rank judged docs by label descending
    run = {
        qid: {d: float(g) for d, g in docs.items()}
        for qid, docs in list(qrels.items())[:500]
    }
    out = eval_run(run, qrels, ["map", "ndcg", "P_1", "recip_rank"], relevance_level=2)
    assert out["ndcg"] == pytest.approx(1.0)
    assert out["recip_rank"] == pytest.approx(1.0)
    assert out["map"] == pytest.approx(1.0)
    # label-inverted run must be strictly worse on every metric
    bad = {qid: {d: -s for d, s in docs.items()} for qid, docs in run.items()}
    worse = eval_run(bad, qrels, ["map", "ndcg", "P_1"], relevance_level=2)
    assert worse["map"] < out["map"] and worse["ndcg"] < out["ndcg"]
