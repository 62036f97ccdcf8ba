"""Paired significance tests (evaluation/significance.py): t-distribution CDF
against tabulated values, randomization-test behavior, and the end-to-end
two-run comparison. Beyond the reference (point averages only)."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.evaluation.significance import (compare_runs, paired_t_test,
                                                   randomization_test, t_sf_two_sided)


def test_t_distribution_tabulated():
    """Two-sided p-values against standard t-table values."""
    # (t, df, two-sided p) — textbook/scipy-stats reference values
    cases = [
        (2.0, 10, 0.073388),
        (2.228, 10, 0.050009),   # t_{0.025, 10} = 2.228
        (1.0, 30, 0.325340),
        (2.042, 30, 0.049977),   # t_{0.025, 30} = 2.042
        (0.0, 5, 1.0),
        (12.706, 1, 0.050007),   # t_{0.025, 1}
    ]
    for t, df, p in cases:
        assert t_sf_two_sided(t, df) == pytest.approx(p, abs=2e-4), (t, df)
        assert t_sf_two_sided(-t, df) == pytest.approx(p, abs=2e-4)


def test_paired_t_test_basics():
    rng = np.random.default_rng(0)
    base = rng.random(40)
    # identical systems: p = 1
    same = paired_t_test(base, base.copy())
    assert same["p"] == pytest.approx(1.0) and same["t"] == 0.0
    # a clear constant improvement with small noise: tiny p
    better = paired_t_test(base + 0.1 + rng.normal(0, 0.01, 40), base)
    assert better["p"] < 1e-6 and better["mean_diff"] > 0.09
    # pure noise: p is large most of the time (seeded, deterministic here)
    noisy = paired_t_test(base + rng.normal(0, 0.05, 40), base)
    assert noisy["p"] > 0.01


def test_randomization_test_matches_t_direction():
    rng = np.random.default_rng(1)
    base = rng.random(30)
    up = base + 0.08 + rng.normal(0, 0.02, 30)
    r = randomization_test(up, base, iters=20_000, seed=3)
    assert r["p"] < 0.001 and r["mean_diff"] > 0.05
    same = randomization_test(base, base.copy(), iters=5_000, seed=3)
    assert same["p"] == pytest.approx(1.0)
    # smoothing: p can never be exactly 0
    assert r["p"] > 0.0


def test_compare_runs_end_to_end():
    """Two runs over shared qrels: the better run earns a significant diff and
    the report covers only common queries."""
    qrels = {str(q): {"D1": 1, "D2": 0, "D3": 0} for q in range(25)}
    # run A ranks the relevant doc first everywhere; run B buries it (except q0)
    run_a = {str(q): {"D1": 3.0, "D2": 2.0, "D3": 1.0} for q in range(25)}
    run_b = {str(q): {"D2": 3.0, "D3": 2.0, "D1": 1.0} for q in range(25)}
    run_b["0"] = dict(run_a["0"])
    report = compare_runs(run_a, run_b, qrels, metrics=["map", "recip_rank"],
                          iters=20_000)
    for metric in ("map", "recip_rank"):
        row = report[metric]
        assert row["n"] == 25
        assert row["mean_a"] > row["mean_b"]
        assert row["t_p"] < 1e-6 and row["rand_p"] < 1e-3

    # disjoint extra queries in one run are excluded from the pairing
    run_a2 = dict(run_a)
    run_a2["999"] = {"D1": 1.0}
    report2 = compare_runs(run_a2, run_b, qrels, metrics=["map"], iters=1_000)
    assert report2["map"]["n"] == 25
